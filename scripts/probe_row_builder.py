"""A/B the seed-row builder (shifted packs vs words0 register shifts)
on the stacked production kernel — round-5 lever from the BASELINE.md
round-4 floor ledger (seed-row build measured 4.9 ms/shard, plausible
floor ~3 ms).

Protocol: the fixed round-4 measurement rules — device_get a real
result every timed iteration (the relay lazily skips unfetched
executions), K=16 stacked shards so the dispatch floor divides out.

Usage: python scripts/probe_row_builder.py [K] [repeats]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> int:
    K = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    n_reads, read_len, min_ovl = 100_000, 100, 40

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.overlap import detect

    print(f"device: {jax.devices()[0]}", file=sys.stderr)
    shards = []
    for kk in range(K):
        genome = simulate_genome(int(n_reads * read_len / 45.0),
                                 seed=7 + 1000 * kk)
        rd, _ = simulate_reads(genome, read_len=read_len, coverage=45.0,
                               error_rate=0.005, seed=8 + 1000 * kk)
        shards.append(rd[:n_reads])
    reads3 = jnp.asarray(np.stack([r.astype(np.int32) for r in shards]))
    valid3 = jnp.ones((K, n_reads), bool)
    cap = 1_114_112  # memoized steady-state capacity at this shape

    results = {}
    for builder in ("shifted", "w0"):
        detect.SEED_ROW_BUILDER = builder
        detect._jitted_find_stacked.cache_clear()
        t0 = time.perf_counter()
        out = detect.find_overlaps_stacked(
            reads3, valid3, min_ovl, seed_len=32, capacity=cap
        )
        nv = np.asarray(jax.device_get(out[5])).copy()
        print(f"{builder}: compile+first {time.perf_counter()-t0:.1f}s "
              f"(verified shard0: {nv[0]})", file=sys.stderr)
        assert not np.asarray(out[6]).any(), "overflow"
        best = 1e30
        for _ in range(repeats):
            t0 = time.perf_counter()
            out = detect.find_overlaps_stacked(
                reads3, valid3, min_ovl, seed_len=32, capacity=cap
            )
            nv2 = np.asarray(jax.device_get(out[5]))
            best = min(best, time.perf_counter() - t0)
            assert np.array_equal(nv2, nv), "builder changed results!"
        results[builder] = best
        print(f"{builder}: {best:.3f}s for {K} shards = "
              f"{1e3*best/K:.2f} ms/shard", file=sys.stderr)

    d = 1e3 * (results["shifted"] - results["w0"]) / K
    print(f"w0 saves {d:+.2f} ms/shard vs shifted", file=sys.stderr)
    detect.SEED_ROW_BUILDER = "shifted"
    return 0


if __name__ == "__main__":
    sys.exit(main())
