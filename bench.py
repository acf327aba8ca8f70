"""Benchmark harness: per-chip overlap-detection throughput vs the
single-threaded C++ baseline.

Prints exactly ONE JSON line to stdout:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Metric (BASELINE.md "Primary metrics"): reads/s of exact suffix-prefix
overlap detection (SURVEY.md §3.3 HOT LOOP #3 — the reference's dominant
cost and the >=10x-per-chip north star). The baseline is the honest
single-threaded C++ implementation in csrc/baseline_cpu.cpp (prefix-seed
hash index + memcmp extension) because the reference mount was empty
(SURVEY.md §0/§6). Correctness is cross-checked: the device kernel and
the baseline must report identical verified-overlap counts.

Two device numbers are measured (BENCH detail carries both):

  * single-dispatch — ONE 100k-read shard per jit call; includes the
    relay's fixed per-dispatch floor (~24 ms dispatch + readback),
    which on real v5e hardware is microseconds.
  * amortized — K independent shards inside ONE jit call
    (overlap.find_overlaps_stacked, lax.scan over the stack), the
    steady-state production shape; the dispatch floor is paid once per
    K shards, so this is the per-chip throughput the hardware actually
    sustains. The headline value is the amortized number; per-shard
    edges are asserted bit-identical to the single-shard kernel.

Env knobs: SAGE2_BENCH_READS (default 100000), SAGE2_BENCH_READLEN (100),
SAGE2_BENCH_MINOVL (40), SAGE2_BENCH_REPEATS (3), SAGE2_BENCH_STACK (16).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    n_reads = int(os.environ.get("SAGE2_BENCH_READS", 100_000))
    read_len = int(os.environ.get("SAGE2_BENCH_READLEN", 100))
    min_ovl = int(os.environ.get("SAGE2_BENCH_MINOVL", 40))
    repeats = int(os.environ.get("SAGE2_BENCH_REPEATS", 3))
    n_stack = int(os.environ.get("SAGE2_BENCH_STACK", 16))
    coverage = 45.0
    genome_len = int(n_reads * read_len / coverage)

    # persistent compilation cache: later rounds skip the slow compile
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)

    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log("compilation cache unavailable:", e)

    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()

    import jax.numpy as jnp

    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.io import native
    from sage2_tpu.overlap import find_overlaps_auto, find_overlaps_stacked

    dev = jax.devices()[0]
    log(f"device: {dev}")
    log(f"input: {n_stack} shards x {n_reads} reads x {read_len} bp, "
        f"min_overlap={min_ovl}, genome {genome_len} bp (~{coverage}x) "
        f"per shard")

    # K statistically-identical shards (independent genomes, same
    # coverage/error); shard 0 is the round-1/2 bench workload exactly
    shards = []
    for kk in range(n_stack):
        genome = simulate_genome(genome_len, seed=7 + 1000 * kk)
        rd, _ = simulate_reads(
            genome, read_len=read_len, coverage=coverage,
            error_rate=0.005, seed=8 + 1000 * kk,
        )
        shards.append(rd[:n_reads])
        assert shards[-1].shape[0] == n_reads
    reads = shards[0]

    # ---- single-threaded C++ baseline --------------------------------
    bb = native.baseline_binary()
    base_secs = None           # shard 0, best of repeats
    base_total = None          # all shards, best of repeats each
    base_verified = []         # per shard
    if bb:
        with tempfile.TemporaryDirectory() as d:
            per_shard = []
            for kk, rd in enumerate(shards):
                raw = os.path.join(d, f"reads{kk}.bin")
                rd.astype(np.int8).tofile(raw)
                best = None
                # best of `repeats` runs, symmetric with the device
                # timing (host load varies the C++ time 30-40%)
                for _ in range(repeats):
                    r = subprocess.run(
                        [bb, "overlap", raw, str(n_reads), str(read_len),
                         str(min_ovl)],
                        capture_output=True, text=True, timeout=3600,
                    )
                    if r.returncode != 0:
                        log("baseline failed:", r.stderr[:300])
                        break
                    v, s = r.stdout.split()
                    verified = int(v)
                    best = min(best or 1e30, float(s))
                if best is None:
                    break
                per_shard.append(best)
                base_verified.append(verified)
            if len(per_shard) == n_stack:
                base_secs = per_shard[0]
                base_total = sum(per_shard)
        if base_secs is not None:
            log(f"baseline (1 CPU thread): shard0 {base_secs:.3f}s best "
                f"of {repeats} ({n_reads/base_secs:.0f} reads/s, "
                f"{base_verified[0]} overlaps); {n_stack} shards "
                f"{base_total:.3f}s ({n_stack*n_reads/base_total:.0f} "
                f"reads/s)")
    else:
        log("baseline binary unavailable")

    # ---- device: single dispatch (includes per-dispatch floor) --------
    r_dev = jnp.asarray(reads.astype(np.int32))
    valid = jnp.ones(n_reads, bool)

    t0 = time.perf_counter()
    res = find_overlaps_auto(r_dev, valid, min_ovl, seed_len=32)
    res.src.block_until_ready()
    log(f"compile+first run: {time.perf_counter()-t0:.1f}s "
        f"(n_candidates={int(res.n_candidates)})")
    assert not bool(res.overflow)

    # warm the memoized-capacity kernel (tighter than the discovery
    # capacity, so it compiles separately)
    t0 = time.perf_counter()
    find_overlaps_auto(
        r_dev, valid, min_ovl, seed_len=32, validate=False
    ).src.block_until_ready()
    log(f"steady-state warmup: {time.perf_counter()-t0:.1f}s")

    # timed runs skip the host readback of n_candidates (validate=False):
    # it costs a ~22 ms relay round trip here vs microseconds on real
    # hardware; overflow is asserted on the same input outside the loop.
    # MEASUREMENT PROTOCOL (BASELINE.md round-4 finding #1): the relay
    # can lazily skip executions whose results are never fetched, so a
    # block_until_ready-only loop can read ~0 s. Every timed iteration
    # must device_get a real result — here the verified-overlap count.
    times = []
    fetched = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        res = find_overlaps_auto(
            r_dev, valid, min_ovl, seed_len=32, validate=False
        )
        fetched.append(int(jax.device_get(res.n_verified)))
        times.append(time.perf_counter() - t0)
    dev_secs = min(times)
    assert not bool(res.overflow)
    dev_verified = fetched[0]
    assert all(v == dev_verified for v in fetched), fetched
    log(f"device single-dispatch: {dev_secs:.3f}s best of {repeats}, "
        f"{n_reads/dev_secs:.0f} reads/s, {dev_verified} verified overlaps")

    if base_verified and base_verified[0] != dev_verified:
        log(f"MISMATCH: baseline {base_verified[0]} != device "
            f"{dev_verified}")

    # ---- device: K shards per dispatch (amortized floor) --------------
    # capacity: shard 0's exact candidate count (already measured above)
    # + headroom at 64k grain; per-shard overflow flags are checked after
    # the first stacked run, and on overflow the capacity doubles and the
    # run repeats — no per-shard discovery dispatches (they cost ~16
    # relay round trips per bench invocation for nothing).
    cap = -(-int(int(res.n_candidates) * 1.06) // (1 << 16)) * (1 << 16)
    reads3 = jnp.asarray(
        np.stack([rd.astype(np.int32) for rd in shards])
    )
    valid3 = jnp.ones((n_stack, n_reads), bool)
    while True:
        t0 = time.perf_counter()
        out = find_overlaps_stacked(
            reads3, valid3, min_ovl, seed_len=32, capacity=cap
        )
        overflow3 = np.asarray(jax.device_get(out[6]))
        log(f"stacked compile+first run: {time.perf_counter()-t0:.1f}s "
            f"(K={n_stack}, capacity={cap})")
        if not overflow3.any():
            break
        cap *= 2
        log(f"stacked capacity overflow -> retry at {cap}")
    st_times = []
    st_fetched = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = find_overlaps_stacked(
            reads3, valid3, min_ovl, seed_len=32, capacity=cap
        )
        # fetch per iteration (relay lazy-skip protocol, see above):
        # out[5] is the per-shard verified-count vector
        st_fetched.append(np.asarray(jax.device_get(out[5])).copy())
        st_times.append(time.perf_counter() - t0)
    stack_secs = min(st_times)
    n_ver3 = st_fetched[0]
    assert all(np.array_equal(v, n_ver3) for v in st_fetched[1:])
    assert not np.asarray(out[6]).any(), "stacked overflow"
    # deferred duplicate-compaction contract: real duplicates need
    # periodic reads — assert none so the lazily returned edge arrays
    # are final (otherwise compact_stacked_result would apply)
    assert not np.asarray(out[7]).any(), "stacked dup rows"
    # per-shard parity: stacked kernel == C++ baseline verified counts
    if base_verified:
        for kk in range(n_stack):
            assert int(n_ver3[kk]) == base_verified[kk], (
                f"shard {kk}: device {int(n_ver3[kk])} != "
                f"baseline {base_verified[kk]}"
            )
    amort = n_stack * n_reads / stack_secs
    marginal_ms = 1e3 * (stack_secs - dev_secs) / (n_stack - 1)
    floor_ms = 1e3 * dev_secs - marginal_ms
    log(f"device stacked: {stack_secs:.3f}s best of {repeats} for "
        f"{n_stack} shards -> amortized {amort:.0f} reads/s "
        f"({1e3*stack_secs/n_stack:.1f} ms/shard; inferred marginal "
        f"{marginal_ms:.1f} ms/shard, dispatch floor {floor_ms:.1f} ms)")

    # ---- hard sanity gates (VERDICT r4: BENCH_r04 shipped a physically
    # impossible number because the timed loop never fetched a result;
    # abort loudly rather than emit garbage) --------------------------
    assert stack_secs > 0.5 * dev_secs, (
        f"measurement bug: {n_stack} stacked shards ({stack_secs:.3f}s) "
        f"ran faster than half of ONE single dispatch ({dev_secs:.3f}s) "
        f"— the relay lazily skipped the timed executions"
    )
    assert marginal_ms > 0, (
        f"measurement bug: negative inferred marginal "
        f"({marginal_ms:.2f} ms/shard) is physically impossible"
    )

    value = amort
    base_rps = (n_stack * n_reads / base_total) if base_total else None
    vs = (value / base_rps) if base_rps else None
    if vs is not None:
        # BASELINE.md round-4 floor ledger: the per-op floor sum caps any
        # exact-join design at ~9x on this relay; real v5e projections
        # top out well under 50x. Anything past that is a bad reading.
        assert vs < 50, (
            f"measurement bug: vs_baseline {vs:.1f} exceeds the 50x "
            f"physical-plausibility bound (per-op floor model, "
            f"BASELINE.md round-4)"
        )
    single_rps = n_reads / dev_secs
    vs_single = (single_rps / (n_reads / base_secs)) if base_secs else None
    print(json.dumps({
        "metric": "overlap_detection_reads_per_s_per_chip",
        "value": round(value, 1),
        "unit": "reads/s",
        "vs_baseline": round(vs, 2) if vs is not None else None,
        "detail": {
            "amortized_reads_per_s": round(value, 1),
            "single_dispatch_reads_per_s": round(single_rps, 1),
            "vs_baseline_single_dispatch": (
                round(vs_single, 2) if vs_single is not None else None
            ),
            "n_shards_per_dispatch": n_stack,
            "marginal_ms_per_shard": round(marginal_ms, 2),
            "dispatch_floor_ms": round(floor_ms, 2),
            "verified_overlaps_shard0": dev_verified,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
