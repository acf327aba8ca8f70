"""Device characterization: verify sort executes + measure matmul FLOPs,
bandwidth, and single-dispatch sort times with fresh inputs."""
from __future__ import annotations

import os
import sys
import time

import numpy as np

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


def main():
    key = jax.random.PRNGKey(42)
    keys = jax.random.split(key, 8)

    # --- single-dispatch sort, fresh input, verified ---
    for n in [1 << 20, 1 << 23]:
        f = jax.jit(jnp.sort)
        xs = [jax.random.randint(k, (n,), 0, 1 << 30, jnp.int32)
              for k in keys[:4]]
        jax.block_until_ready(f(xs[0]))
        ts = []
        for x in xs[1:]:
            t0 = time.perf_counter()
            out = jax.block_until_ready(f(x))
            ts.append(time.perf_counter() - t0)
        ref = np.sort(np.asarray(xs[-1]))
        ok = bool((np.asarray(out) == ref).all())
        print(f"sort n={n>>20}M single-dispatch: "
              f"{[f'{t*1e3:.1f}' for t in ts]} ms correct={ok}")

    # --- sort inside a graph, result REDUCED (forces full materialize) ---
    n = 1 << 22

    def sort_and_sum(x):
        s = jnp.sort(x)
        return s[::1024].sum() + s[1] + s[-2]
    f = jax.jit(sort_and_sum)
    xs = [jax.random.randint(k, (n,), 0, 1 << 30, jnp.int32)
          for k in keys[:4]]
    jax.block_until_ready(f(xs[0]))
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"sort4M+reduce single-dispatch: {[f'{t*1e3:.1f}' for t in ts]} ms")

    # --- matmul FLOPs ---
    for (m, k2, n2, dt) in [(4096, 4096, 4096, jnp.bfloat16),
                            (8192, 8192, 8192, jnp.bfloat16),
                            (4096, 4096, 4096, jnp.float32)]:
        a = jax.random.normal(keys[0], (m, k2), dt)
        b = jax.random.normal(keys[1], (k2, n2), dt)
        f = jax.jit(lambda a, b: a @ b)
        jax.block_until_ready(f(a, b))
        t0 = time.perf_counter()
        for _ in range(3):
            jax.block_until_ready(f(a, b))
        t = (time.perf_counter() - t0) / 3
        print(f"matmul {m}x{k2}x{n2} {dt.__name__}: {t*1e3:.1f} ms "
              f"-> {2*m*k2*n2/t/1e12:.1f} TFLOPs")

    # --- copy bandwidth (unfusable: reverse) ---
    n = 1 << 25  # 128MB
    xs = [jax.random.randint(k, (n,), 0, 1 << 30, jnp.int32)
          for k in keys[:4]]
    f = jax.jit(lambda x: x[::-1])
    jax.block_until_ready(f(xs[0]))
    ts = []
    for x in xs[1:]:
        t0 = time.perf_counter()
        jax.block_until_ready(f(x))
        ts.append(time.perf_counter() - t0)
    print(f"reverse 128MB: {[f'{t*1e3:.1f}' for t in ts]} ms -> "
          f"{2*n*4/min(ts)/1e9:.0f} GB/s")

    # host->device / device->host
    h = np.random.randint(0, 1 << 30, size=(1 << 24,), dtype=np.int32)
    t0 = time.perf_counter()
    d = jax.block_until_ready(jnp.asarray(h))
    t_up = time.perf_counter() - t0
    t0 = time.perf_counter()
    _ = np.asarray(d)
    t_dn = time.perf_counter() - t0
    print(f"h2d 64MB: {t_up*1e3:.1f} ms ({64e-3/t_up:.1f} GB/s), "
          f"d2h: {t_dn*1e3:.1f} ms ({64e-3/t_dn:.1f} GB/s)")


if __name__ == "__main__":
    main()
