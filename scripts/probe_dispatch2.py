"""Re-probe with DIFFERENT inputs per call (defeat any relay-level
result caching) and per-call timing."""
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


def per_call(f, inputs):
    jax.block_until_ready(f(inputs[0]))  # compile
    times = []
    for x in inputs[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        times.append(time.perf_counter() - t0)
    return times


def main():
    key = jax.random.PRNGKey(0)
    keys = jax.random.split(key, 6)

    x0 = [jax.random.randint(k, (8,), 0, 100, jnp.int32) for k in keys]
    f = jax.jit(lambda x: x + 1)
    ts = per_call(f, x0)
    print("trivial dispatch ms:", [f"{t*1e3:.2f}" for t in ts])

    n = 1 << 22
    xs = [jax.random.randint(k, (n,), 0, 1 << 30, jnp.int32) for k in keys]

    def many_sorts(x, K=4):
        for i in range(K):
            x = jnp.sort(x ^ jnp.int32(i))
        return x
    f = jax.jit(many_sorts)
    ts = per_call(f, xs)
    print("4x sort 4M ms:", [f"{t*1e3:.1f}" for t in ts],
          f"-> {min(ts)/4*1e3:.2f} ms/sort, {min(ts)/4/n*1e9:.2f} ns/elem")

    rows, w, nq = 1 << 23, 2, 1 << 21
    tbl = jax.random.randint(keys[0], (rows, w), 0, 1 << 30, jnp.int32)
    idxs = [jax.random.randint(k, (nq,), 0, rows, jnp.int32) for k in keys]

    def many_gathers(idx, K=4):
        acc = jnp.zeros((nq, w), jnp.int32)
        for i in range(K):
            acc = acc + tbl[(idx + acc[:, 0] + i) % rows]
        return acc
    f = jax.jit(many_gathers)
    ts = per_call(f, idxs)
    print("4x row-gather 2M from 8Mx2 ms:", [f"{t*1e3:.1f}" for t in ts],
          f"-> {nq*4/min(ts)/1e6:.0f}M rows/s")

    m = 1 << 21
    vals = jnp.arange(nq, dtype=jnp.int32)

    def many_scatters(idx, K=4):
        acc = jnp.zeros(m, jnp.int32)
        for i in range(K):
            acc = acc.at[(idx + i + acc[0]) % m].max(vals)
        return acc
    f = jax.jit(many_scatters)
    ts = per_call(f, idxs)
    print("4x scatter-max 2M->2M ms:", [f"{t*1e3:.1f}" for t in ts],
          f"-> {nq*4/min(ts)/1e6:.0f}M elem/s")

    def many_cumsum(x, K=4):
        for i in range(K):
            x = jnp.cumsum(x % 7)
        return x
    f = jax.jit(many_cumsum)
    ts = per_call(f, xs)
    print("4x cumsum 4M ms:", [f"{t*1e3:.1f}" for t in ts],
          f"-> {min(ts)/4/n*1e9:.2f} ns/elem")

    n2 = 1 << 24
    ys = [jax.random.randint(k, (n2,), 0, 1 << 30, jnp.int32) for k in keys]

    def many_ew(x, K=4):
        for i in range(K):
            x = x * jnp.int32(3) + jnp.int32(i)
        return x
    f = jax.jit(many_ew)
    ts = per_call(f, ys)
    print("4x ew 16M i32 ms:", [f"{t*1e3:.1f}" for t in ts],
          f"-> {4*2*n2*4/min(ts)/1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
