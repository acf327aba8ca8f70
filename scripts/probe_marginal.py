"""Decompose the fused overlap join's per-shard MARGINAL cost.

Round-3 amortized bench: 41.4 ms marginal per 100k-read shard on the
relay; 10x needs ~26 ms. This probe times PREFIXES of the kernel
(each stacked K times under lax.scan so the dispatch floor divides
out), yielding per-stage marginals: sort -> expansion -> gathers ->
verify -> reduce. Outputs ride a data-dependent sum so XLA cannot
dead-code-eliminate the stage under test.

Usage: python scripts/probe_marginal.py  (env: SAGE2_BENCH_READS, K)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    n_reads = int(os.environ.get("SAGE2_BENCH_READS", 100_000))
    K = int(os.environ.get("K", 8))
    min_ovl = 40
    repeats = 3

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

    L = 100
    genome_len = int(n_reads * L / 45.0)
    shards = []
    for kk in range(K):
        g = simulate_genome(genome_len, seed=7 + 1000 * kk)
        rd, _ = simulate_reads(g, read_len=L, coverage=45.0,
                               error_rate=0.005, seed=8 + 1000 * kk)
        shards.append(rd[:n_reads].astype(np.int32))
    reads3 = jnp.asarray(np.stack(shards))
    valid = jnp.ones((K, n_reads), bool)

    s = 32
    geo = detect.join_geometry(L, min_ovl, s)
    g_, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt
    C = 1 << 21  # generous candidate capacity (fixed across variants)

    def rows_of(r, v):
        k_hi, k_lo, packed, payload = detect.build_seed_rows(r, v, s, geo)
        N = r.shape[0] * R
        return (k_hi.reshape(-1), k_lo.reshape(-1), packed.reshape(-1),
                payload.reshape(N, Wt + 2))

    def stage(level):
        def one(r, v):
            k_hi, k_lo, packed, payrows = rows_of(r, v)
            N = k_hi.shape[0]
            acc = jnp.uint32(0)
            if level == 0:          # seed-row build only
                return acc + jnp.sum(k_hi) + jnp.sum(packed)
            s_hi, s_lo, s_packed = sort_by_keys([k_hi, k_lo, packed])
            s_pos = (s_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
            if level == 1:          # + combined sort
                return jnp.sum(s_hi) + jnp.sum(s_packed)
            iota_n = jnp.arange(N, dtype=jnp.int32)
            prev_hi = jnp.concatenate([s_hi[:1], s_hi[:-1]])
            prev_lo = jnp.concatenate([s_lo[:1], s_lo[:-1]])
            is_head = (iota_n == 0) | (s_hi != prev_hi) | (s_lo != prev_lo)
            live = s_packed != jnp.uint32(0xFFFFFFFF)
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
            if level == 2:          # + scans + payload pregather
                return jnp.sum(pays)
            sidx = jnp.where((counts > 0) & (starts < C), starts, C)
            grid = (jnp.full(C + 1, -1, jnp.int32)
                    .at[sidx].set(iota_n, mode="drop")[:C])
            qpos = jax.lax.cummax(grid)
            iota_c = jnp.arange(C, dtype=jnp.int32)
            slot_valid = (qpos >= 0) & (iota_c < offsets[-1])
            if level == 3:          # + expansion scatter + cummax
                return jnp.sum(qpos) + jnp.sum(slot_valid)
            pay_a = pays[jnp.clip(qpos, 0, N - 1)]
            rank = iota_c - pay_a[:, Wt + 4].astype(jnp.int32)
            bslot = jnp.clip(
                pay_a[:, Wt + 3].astype(jnp.int32) + rank, 0, N - 1)
            pay_b = pays[:, : Wt + 3][bslot]
            if level == 4:          # + the two candidate row gathers
                return jnp.sum(pay_a) + jnp.sum(pay_b)
            # full fused core + reduce (the production kernel)
            ok, okc, ca, cb, ovl, total = detect.fused_join_core(
                k_hi, k_lo, packed, payrows, geo, L, C, min_ovl,
                ids_are_positions=True)
            ks, kd, ko, ne, _nd = detect._reduce_fused(ok, ca, cb, ovl, L,
                                                  r.shape[0])
            return (jnp.sum(ks.astype(jnp.uint32))
                    + jnp.sum(ne.astype(jnp.uint32)))
        return one

    names = ["rows", "+sort", "+scan/pregather", "+expand",
             "+2 gathers", "full(+verify+reduce)"]
    prev_ms = 0.0
    print(f"K={K} shards x {n_reads} reads; C={C}", file=sys.stderr)
    for lvl in range(6):
        fn = stage(lvl)

        @jax.jit
        def run(r3, v3, fn=fn):
            def body(c, rv):
                return c + fn(*rv).astype(jnp.uint32), 0
            c, _ = jax.lax.scan(body, jnp.uint32(0), (r3, v3))
            return c

        t0 = time.perf_counter()
        # fetch (not just block): this relay can lazily skip executions
        # whose results are never fetched — a block_until_ready-only
        # timing loop can read ~0 s (measured, probe_gather_patterns)
        keep = [jax.device_get(run(reads3, valid))]
        compile_s = time.perf_counter() - t0
        best = 1e30
        for _ in range(repeats):
            t0 = time.perf_counter()
            keep.append(jax.device_get(run(reads3, valid)))
            best = min(best, time.perf_counter() - t0)
        assert all(v == keep[0] for v in keep[1:]), keep
        per_shard = 1e3 * best / K
        print(f"{names[lvl]:24s} {best:7.3f}s total  "
              f"{per_shard:7.2f} ms/shard  (+{per_shard - prev_ms:6.2f})"
              f"  [compile {compile_s:.0f}s]", file=sys.stderr)
        prev_ms = per_shard
    return 0


if __name__ == "__main__":
    sys.exit(main())
