"""A/B the stacked fused-join kernel on the bench chip.

Times find_overlaps_stacked (K shards per jit call) with per-iteration
result fetches, printing per-shard ms. Used to chase the round-4
marginal regression under lax.scan (full-key sort + narrow entry view).

Usage: python scripts/probe_stacked_ab.py   (env: K, REPEATS)
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    K = int(os.environ.get("K", 8))
    repeats = int(os.environ.get("REPEATS", 5))
    n_reads, L, min_ovl = 100_000, 100, 40

    cache = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    import jax.numpy as jnp

    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.overlap import find_overlaps_stacked

    genome_len = int(n_reads * L / 45.0)
    shards = []
    for kk in range(K):
        g = simulate_genome(genome_len, seed=7 + 1000 * kk)
        rd, _ = simulate_reads(g, read_len=L, coverage=45.0,
                               error_rate=0.005, seed=8 + 1000 * kk)
        shards.append(rd[:n_reads].astype(np.int32))
    reads3 = jnp.asarray(np.stack(shards))
    valid3 = jnp.ones((K, n_reads), bool)
    cap = 1114112

    t0 = time.perf_counter()
    out = find_overlaps_stacked(reads3, valid3, min_ovl, capacity=cap)
    nv = np.asarray(out[5])
    print(f"compile+first: {time.perf_counter()-t0:.1f}s "
          f"verified={nv.tolist()[:2]}...", file=sys.stderr)
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = find_overlaps_stacked(reads3, valid3, min_ovl, capacity=cap)
        nv = int(np.asarray(out[3])[0])   # fetch forces execution
        times.append(time.perf_counter() - t0)
    ms = [f"{1e3*t/K:.1f}" for t in times]
    print(f"per-shard ms over {repeats} runs: {ms}  "
          f"best {1e3*min(times)/K:.1f}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
