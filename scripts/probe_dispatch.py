"""Separate fixed dispatch overhead from per-element costs: run each
primitive K times inside ONE jitted graph (serialized by data deps)."""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)

import jax
import jax.numpy as jnp

from sage2_tpu.utils.platform import ensure_backend

ensure_backend()


def timeit(f, *args, n=5):
    out = jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    return out, best


def main():
    key = jax.random.PRNGKey(0)

    # 1. dispatch floor: trivial op
    x = jnp.ones(8, jnp.int32)
    f = jax.jit(lambda x: x + 1)
    _, t = timeit(f, x)
    print(f"trivial dispatch: {t*1e3:.2f} ms")

    # 2. K serialized sorts in one graph
    for n in [1 << 20, 1 << 22]:
        x = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)

        def many_sorts(x, K=8):
            for i in range(K):
                x = jnp.sort(x ^ jnp.int32(i))
            return x
        f = jax.jit(many_sorts)
        _, t = timeit(f, x)
        print(f"8x sort n={n>>20}M in one graph: {t*1e3:.2f} ms "
              f"({t/8*1e3:.2f} ms/sort, {t/8/n*1e9:.2f} ns/elem)")

    # 3. K serialized row gathers in one graph
    for (rows, w, nq) in [(1 << 23, 2, 1 << 21), (200_000, 8, 1 << 21)]:
        tbl = jax.random.randint(key, (rows, w), 0, 1 << 30, dtype=jnp.int32)
        idx = jax.random.randint(key, (nq,), 0, rows, dtype=jnp.int32)

        def many_gathers(tbl, idx, K=8):
            acc = jnp.zeros((nq, w), jnp.int32)
            for i in range(K):
                g = tbl[(idx + i) % rows]
                acc = acc + g
            return acc
        f = jax.jit(many_gathers)
        _, t = timeit(f, tbl, idx)
        print(f"8x row-gather rows={rows} w={w} nq=2M: {t*1e3:.2f} ms "
              f"({nq*8/t/1e6:.0f}M rows/s)")

    # 4. K serialized scatters
    nq, m = 1 << 21, 1 << 21
    idx = jax.random.randint(key, (nq,), 0, m, dtype=jnp.int32)
    vals = jnp.arange(nq, dtype=jnp.int32)

    def many_scatters(idx, vals, K=8):
        acc = jnp.zeros(m, jnp.int32)
        for i in range(K):
            acc = acc.at[(idx + i) % m].max(vals)
        return acc
    f = jax.jit(many_scatters)
    _, t = timeit(f, idx, vals)
    print(f"8x scatter-max 2M->2M: {t*1e3:.2f} ms ({nq*8/t/1e6:.0f}M elem/s)")

    # 5. cumsum / cummax amortized
    n = 1 << 21
    x = jnp.ones(n, jnp.int32)

    def many_cumsum(x, K=8):
        for i in range(K):
            x = jnp.cumsum(x) % 7 + 1
        return x
    f = jax.jit(many_cumsum)
    _, t = timeit(f, x)
    print(f"8x cumsum 2M: {t*1e3:.2f} ms ({t/8/n*1e9:.2f} ns/elem)")

    # 6. streaming elementwise bandwidth probe
    n = 1 << 24  # 64MB in+out
    x = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)

    def many_ew(x, K=8):
        for i in range(K):
            x = x * jnp.int32(3) + jnp.int32(i)
        return x
    f = jax.jit(many_ew)
    _, t = timeit(f, x)
    print(f"8x elementwise 16M i32: {t*1e3:.2f} ms "
          f"({8*2*n*4/t/1e9:.0f} GB/s eff)")


if __name__ == "__main__":
    main()
