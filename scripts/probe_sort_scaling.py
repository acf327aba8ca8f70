"""Is sort/scan cost on the axon relay dominated by per-pass overhead?

Measures: trivial-op dispatch, sort vs size, sort vs operand count,
cummax vs size, gather count scaling. Decides the round-2 overlap kernel
redesign (ride payloads through sorts vs separate gathers).
"""
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
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp

from sage2_tpu.utils.platform import ensure_backend

ensure_backend()


def bench(f, *args, n=5, name=""):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:9.2f} ms", flush=True)
    return out, best


def main():
    key = jax.random.PRNGKey(0)

    # dispatch floor
    x = jnp.ones((8,), jnp.float32)
    bench(jax.jit(lambda x: x + 1), x, name="trivial add (dispatch floor)")

    # sort size scaling, 2-op
    for n in (1 << 14, 1 << 16, 1 << 18, 1 << 20, 1 << 22):
        a = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        b = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        bench(f, a, b, name=f"sort 2-op n={n}")

    # sort operand-count scaling at 1M
    n = 1 << 20
    arrs = [jax.random.randint(jax.random.PRNGKey(i), (n,), 0, 1 << 30,
                               dtype=jnp.int32) for i in range(12)]
    for ops in (1, 2, 3, 4, 6, 8, 10, 12):
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
        bench(f, *arrs[:ops], name=f"sort {ops}-op n=1M")

    # cummax size scaling
    for n in (1 << 16, 1 << 18, 1 << 20, 1 << 22):
        a = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        bench(jax.jit(jax.lax.cummax), a, name=f"cummax n={n}")

    # two cummaxes in one jit (does fusion merge passes?)
    n = 1 << 20
    a = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    b = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
    bench(jax.jit(lambda a, b: (jax.lax.cummax(a), jax.lax.cummax(b))),
          a, b, name="2x cummax n=1M (one jit)")
    # cummax on 2D (n, 2) along axis 0
    ab = jnp.stack([a, b], axis=1)
    bench(jax.jit(lambda x: jax.lax.cummax(x, axis=0)), ab,
          name="cummax (1M,2) axis0")
    ab8 = jnp.tile(ab, (1, 4))
    bench(jax.jit(lambda x: jax.lax.cummax(x, axis=0)), ab8,
          name="cummax (1M,8) axis0")

    # gather size scaling (fixed overhead?)
    tbl = jnp.ones((1 << 20, 8), jnp.uint32)
    for n in (1 << 14, 1 << 18, 1 << 20, 1 << 22):
        idx = jax.random.randint(key, (n,), 0, 1 << 20, dtype=jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        _, t = bench(f, tbl, idx, name=f"row gather n={n} w=8")
        print(f"   -> {n/t/1e6:.0f}M rows/s")

    # scatter-min vs scatter-max vs scatter-add at 1M into 8M
    upd = jnp.ones((1 << 20,), jnp.int32)
    sidx = jax.random.randint(key, (1 << 20,), 0, 1 << 23, dtype=jnp.int32)
    Z = jnp.zeros(1 << 23, jnp.int32)
    bench(jax.jit(lambda i, u: Z.at[i].min(u)), sidx, upd,
          name="scatter-min 1M into 8M")
    # segment boundaries via sorted-diff instead of scatter?
    srt = jnp.sort(sidx)
    bench(jax.jit(lambda s: jnp.searchsorted(
        s, jnp.arange(1 << 23, dtype=jnp.int32)).astype(jnp.int32)),
        srt, name="searchsorted 8M queries into 1M")


if __name__ == "__main__":
    main()
