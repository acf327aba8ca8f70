"""Isolate the round-4 stacked (lax.scan) marginal regression.

Variants of the fused join body, all compiled IN ONE PROCESS (the
relay charges ~8 min for the first compile of a fresh process, ~60 s
for each subsequent program) and each run K shards/jit call with a
per-repeat result fetch:

  A  production core (3-key exact sort, trimmed payload, narrow
     entry-side view)
  B  like A but the entry gather reads the FULL pays row (no view)
  C  2-key hash sort (round-3 style) over the SAME trimmed payload —
     measures the sort-operand effect (perf only; trim+hash is not
     exact, results are discarded)

Usage: python scripts/probe_scan_variants.py   (env: K, REPEATS)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    K = int(os.environ.get("K", 8))
    repeats = int(os.environ.get("REPEATS", 4))
    n_reads, L, min_ovl = 100_000, 100, 40
    C = 1114112

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.overlap import detect
    from sage2_tpu.ops.sort import sort_by_keys

    genome_len = int(n_reads * L / 45.0)
    shards = []
    for kk in range(K):
        g = simulate_genome(genome_len, seed=7 + 1000 * kk)
        rd, _ = simulate_reads(g, read_len=L, coverage=45.0,
                               error_rate=0.005, seed=8 + 1000 * kk)
        shards.append(rd[:n_reads].astype(np.int32))
    reads3 = jnp.asarray(np.stack(shards))
    valid3 = jnp.ones((K, n_reads), bool)

    s = 32
    geo = detect.join_geometry(L, min_ovl, s)
    g_, n_pos, R, pa, Wp, trim = geo
    Wt = geo.Wt
    U32M = jnp.uint32(0xFFFFFFFF)

    def core(variant, r, v):
        k_hi, k_lo, packed, payload = detect.build_seed_rows(r, v, s, geo)
        N = r.shape[0] * R
        k_hi, k_lo = k_hi.reshape(-1), k_lo.reshape(-1)
        packed = packed.reshape(-1)
        payrows = payload.reshape(N, Wt + 2)
        if variant == "C":
            h = jnp.where(
                packed == U32M, U32M,
                jnp.minimum(detect._mix32(k_hi, k_lo),
                            jnp.uint32(0xFFFFFFFE)),
            )
            s_hash, s_packed = sort_by_keys([h, packed])
            is_head_key = None
            prev = jnp.concatenate([s_hash[:1], s_hash[:-1]])
            head_extra = s_hash != prev
        else:
            s_hi, s_lo, s_packed = sort_by_keys([k_hi, k_lo, packed])
            prev_hi = jnp.concatenate([s_hi[:1], s_hi[:-1]])
            prev_lo = jnp.concatenate([s_lo[:1], s_lo[:-1]])
            head_extra = (s_hi != prev_hi) | (s_lo != prev_lo)
        s_pos = (s_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        iota_n = jnp.arange(N, dtype=jnp.int32)
        is_head = (iota_n == 0) | head_extra
        live = s_packed != U32M
        is_entry = ((s_packed >> 31) == 0) & live
        is_query = ((s_packed >> 31) == 1) & live
        entrycum = jnp.cumsum(is_entry.astype(jnp.int32))
        fill = jax.lax.cummax(
            jnp.stack([jnp.where(is_head, iota_n, 0),
                       jnp.where(is_head, entrycum - is_entry, 0)],
                      axis=1), axis=0)
        run_start, entry_base = fill[:, 0], fill[:, 1]
        counts = jnp.where(is_query, entrycum - entry_base, 0)
        offsets = jnp.cumsum(counts)
        starts = offsets - counts
        pays = jnp.concatenate(
            [s_packed[:, None], payrows[s_pos],
             run_start[:, None].astype(jnp.uint32),
             starts[:, None].astype(jnp.uint32)], axis=1)
        sidx = jnp.where((counts > 0) & (starts < C), starts, C)
        grid = (jnp.full(C + 1, -1, jnp.int32)
                .at[sidx].set(iota_n, mode="drop")[:C])
        qpos = jax.lax.cummax(grid)
        iota_c = jnp.arange(C, dtype=jnp.int32)
        pay_a = pays[jnp.clip(qpos, 0, N - 1)]
        rank = iota_c - pay_a[:, Wt + 4].astype(jnp.int32)
        bslot = jnp.clip(
            pay_a[:, Wt + 3].astype(jnp.int32) + rank, 0, N - 1)
        if variant == "A":
            pay_b = pays[:, : Wt + 3][bslot]
        else:
            pay_b = pays[bslot]
        return (jnp.sum(pay_a, dtype=jnp.uint32)
                + jnp.sum(pay_b, dtype=jnp.uint32)
                + jnp.sum(qpos).astype(jnp.uint32))

    for variant in ("A", "B", "C"):
        @jax.jit
        def run(r3, v3, variant=variant):
            def body(c, rv):
                r, v = rv
                return c + core(variant, r, v), 0
            c, _ = jax.lax.scan(body, jnp.uint32(0), (r3, v3))
            return c

        t0 = time.perf_counter()
        keep = [jax.device_get(run(reads3, valid3))]
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            keep.append(jax.device_get(run(reads3, valid3)))
            times.append(time.perf_counter() - t0)
        ms = ", ".join(f"{1e3*t/K:.1f}" for t in times)
        print(f"variant {variant}: per-shard ms [{ms}] best "
              f"{1e3*min(times)/K:.1f}  [compile {compile_s:.0f}s]",
              file=sys.stderr, flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
