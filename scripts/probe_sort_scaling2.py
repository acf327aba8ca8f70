"""Sort/scan scaling, take 2: vary inputs per iteration and force a
host-side scalar readback so the relay cannot short-circuit repeats."""
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


def bench(f, make_args, n=4, name=""):
    args = make_args(0)
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for i in range(1, n + 1):
        args = make_args(i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        out = f(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        _ = float(leaf.reshape(-1)[0])  # force real execution
        best = min(best, time.perf_counter() - t0)
    print(f"{name:46s} {best*1e3:9.2f} ms", flush=True)
    return best


def main():
    def rnd(seed, n, hi=1 << 30):
        return jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, hi,
                                  dtype=jnp.int32)

    for n in (1 << 16, 1 << 20, 1 << 22):
        f = jax.jit(lambda a, b: jax.lax.sort((a, b), num_keys=1))
        bench(f, lambda i, n=n: (rnd(i, n), rnd(i + 100, n)),
              name=f"sort 2-op n={n}")

    n = 1 << 20
    for ops in (2, 4, 8, 12):
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=1))
        bench(f, lambda i, ops=ops: tuple(rnd(i * 13 + j, n)
                                          for j in range(ops)),
              name=f"sort {ops}-op n=1M")

    for n in (1 << 20, 1 << 22):
        f = jax.jit(jax.lax.cummax)
        bench(f, lambda i, n=n: (rnd(i, n),), name=f"cummax n={n}")

    # row gather with fresh indices
    for n, w in ((1 << 20, 2), (1 << 20, 8), (1 << 22, 2), (1 << 22, 8),
                 (1 << 22, 10)):
        tbl = rnd(999, (1 << 20) * w).reshape(1 << 20, w)
        f = jax.jit(lambda t, i: t[i])
        t = bench(f, lambda i, n=n: (tbl, rnd(i, n, hi=1 << 20)),
                  name=f"row gather n={n} w={w}")
        print(f"   -> {n/t/1e6:.0f}M rows/s")

    # scatter
    f = jax.jit(lambda i, u: jnp.zeros(1 << 22, jnp.int32).at[i].max(u))
    t = bench(f, lambda i: (rnd(i, 1 << 20, hi=1 << 22), rnd(i + 7, 1 << 20)),
              name="scatter-max 1M into 4M")
    print(f"   -> {(1<<20)/t/1e6:.0f}M scatters/s")


if __name__ == "__main__":
    main()
