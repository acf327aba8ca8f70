"""Localize the stacked-kernel tail cost: production find_overlaps_stacked
vs variants with the reduce/cond/outputs progressively removed.

  V1  production find_overlaps_stacked (per-shard outputs stacked)
  V2  full core + verify + containment + reduce, but the duplicate-
      compaction lax.cond replaced by the no-dups path, outputs summed
  V3  full core + verify only, outputs summed

One process (first remote compile costs ~8-25 min; later ones ~60 s).
Usage: python scripts/probe_stacked_full.py   (env: K, REPEATS)
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
    R = geo.R
    Wt = geo.Wt
    _I32_MAX = jnp.int32(2**31 - 1)

    def core_out(r, v):
        k_hi, k_lo, packed, payload = detect.build_seed_rows(r, v, s, geo)
        N = r.shape[0] * R
        return detect.fused_join_core(
            k_hi.reshape(-1), k_lo.reshape(-1), packed.reshape(-1),
            payload.reshape(N, Wt + 2), geo, L, C, min_ovl,
            ids_are_positions=True,
        )

    def v2(r, v):
        ok, okc, ca, cb, ovl, total = core_out(r, v)
        # reduce without the duplicate-compaction cond
        ov_bits = int(L).bit_length()
        pk = (cb << ov_bits) | ovl
        e_src = jnp.where(ok, ca, _I32_MAX)
        e_pk = jnp.where(ok, pk, _I32_MAX)
        e_src, e_pk = sort_by_keys([e_src, e_pk])
        cont = (
            jnp.zeros(r.shape[0] + 1, bool)
            .at[jnp.where(okc, cb, r.shape[0])]
            .set(True, mode="drop")[: r.shape[0]]
        )
        return (jnp.sum(e_src.astype(jnp.uint32))
                + jnp.sum(e_pk.astype(jnp.uint32))
                + jnp.sum(cont).astype(jnp.uint32) + total.astype(jnp.uint32))

    def v3(r, v):
        ok, okc, ca, cb, ovl, total = core_out(r, v)
        return (jnp.sum(ok.astype(jnp.uint32))
                + jnp.sum(jnp.where(ok, ovl, 0)).astype(jnp.uint32)
                + total.astype(jnp.uint32))

    def time_variant(name, fn):
        @jax.jit
        def run(r3, v3_):
            def body(c, rv):
                return c + fn(*rv), 0
            c, _ = jax.lax.scan(body, jnp.uint32(0), (r3, v3_))
            return c

        t0 = time.perf_counter()
        keep = [jax.device_get(run(reads3, valid3))]
        comp = time.perf_counter() - t0
        times = []
        for _ in range(repeats):
            t0 = time.perf_counter()
            keep.append(jax.device_get(run(reads3, valid3)))
            times.append(time.perf_counter() - t0)
        ms = ", ".join(f"{1e3*t/K:.1f}" for t in times)
        print(f"{name}: per-shard ms [{ms}] best {1e3*min(times)/K:.1f}"
              f"  [compile {comp:.0f}s]", file=sys.stderr, flush=True)

    # V1: production stacked with fetch
    t0 = time.perf_counter()
    out = detect.find_overlaps_stacked(reads3, valid3, min_ovl, capacity=C)
    ne = int(np.asarray(out[3])[0])
    comp = time.perf_counter() - t0
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = detect.find_overlaps_stacked(reads3, valid3, min_ovl,
                                           capacity=C)
        ne = int(np.asarray(out[3])[0])
        times.append(time.perf_counter() - t0)
    ms = ", ".join(f"{1e3*t/K:.1f}" for t in times)
    print(f"V1 production: per-shard ms [{ms}] best "
          f"{1e3*min(times)/K:.1f}  [compile {comp:.0f}s] n_edges={ne}",
          file=sys.stderr, flush=True)

    time_variant("V2 no-cond reduce", v2)
    time_variant("V3 verify-only  ", v3)
    return 0


if __name__ == "__main__":
    sys.exit(main())
