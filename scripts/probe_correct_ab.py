"""Controlled A/B: two-phase weak-window corrector vs dense kernel at
E. coli scale, same process, warm compiles (VERDICT r4 #4 — the
round-4 "two-phase speedup" claim was never separated from the relay's
1.5-3x stage variance; this does it the way the reduce backend got its
clean 621 -> 46 s A/B).

Protocol: one process; warmup_compile() absorbs the first-compile
penalty; each variant runs `reps` times on the SAME reads (first run of
each discarded as that variant's own compile); outputs asserted
bit-identical between variants.

Env: SAGE2_AB_READS (default 2_300_000), SAGE2_AB_CHUNK (500_000),
SAGE2_AB_REPS (2).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    n_reads = int(os.environ.get("SAGE2_AB_READS", 2_300_000))
    chunk = int(os.environ.get("SAGE2_AB_CHUNK", 500_000))
    reps = int(os.environ.get("SAGE2_AB_REPS", 2))
    read_len, cov, err, k, thr, rounds = 100, 50.0, 0.005, 25, 2, 2

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend, warmup_compile

    ensure_backend()
    warmup_compile()

    from sage2_tpu.utils import watchdog

    wd = float(os.environ.get("SAGE2_WATCHDOG_SECS", 2400))
    if wd > 0:
        watchdog.start(wd)

    import sage2_tpu.stream as stream
    from sage2_tpu.data import simulate_genome, simulate_reads

    log(f"device: {jax.devices()[0]}")
    genome_len = int(n_reads * read_len / cov)
    genome = simulate_genome(genome_len, seed=7)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=cov,
                              error_rate=err, seed=8)
    reads = reads[:n_reads]
    log(f"input: {reads.shape[0]} reads x {read_len} bp "
        f"({genome_len} bp, {cov}x, err {err}); k={k} thr={thr} "
        f"rounds={rounds} chunk={chunk}")

    outputs = {}
    times = {}
    for variant in ("twophase", "dense"):
        stream.FORCE_DENSE_CORRECT = variant == "dense"
        runs = []
        for r in range(reps + 1):   # +1: first run pays the compiles
            t0 = time.perf_counter()
            out = stream.correct_reads_chunked(
                reads, k, thr, rounds, chunk_reads=chunk
            )
            dt = time.perf_counter() - t0
            log(f"{variant} run {r}: {dt:.1f}s"
                + ("  [compile run, discarded]" if r == 0 else ""))
            if r > 0:
                runs.append(dt)
        outputs[variant] = out
        times[variant] = min(runs)
    stream.FORCE_DENSE_CORRECT = False

    assert np.array_equal(outputs["twophase"], outputs["dense"]), \
        "two-phase and dense outputs differ!"
    tp, de = times["twophase"], times["dense"]
    log(f"RESULT: two-phase {tp:.1f}s vs dense {de:.1f}s "
        f"-> speedup {de / tp:.2f}x (outputs bit-identical; "
        f"best of {reps} warm runs each, same process)")
    import json

    print(json.dumps({
        "metric": "correct_stage_twophase_speedup",
        "value": round(de / tp, 3),
        "unit": "x",
        "detail": {"twophase_s": round(tp, 1), "dense_s": round(de, 1),
                   "n_reads": n_reads, "rounds": rounds,
                   "reps": reps},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
