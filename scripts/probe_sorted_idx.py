"""Do sorted/monotone indices make gather/scatter cheaper on this chip?
Also: cost of lax.cond branches and a 2-col cummax (pack-fill idiom)."""
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

N = 1 << 21


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
        _ = float(leaf.reshape(-1)[0])
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return best


def rnd(seed, n=N, hi=1 << 30):
    return jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, hi,
                              dtype=jnp.int32)


def chain_gather(k, sort_idx):
    @jax.jit
    def f(tbl, idx):
        if sort_idx:
            idx = jnp.sort(idx)
        acc = jnp.int32(0)
        out = None
        for j in range(k):
            row = tbl[(idx + acc) & (N - 1)]
            acc = acc + (row[0, 0] & 1)  # scalar dep, keeps idx sorted
            out = row
        return out

    return f


def chain_scatter(k, sort_idx):
    @jax.jit
    def f(idx, upd):
        if sort_idx:
            idx = jnp.sort(idx)
        acc = upd
        for _ in range(k):
            z = jnp.zeros(N, jnp.int32).at[idx].max(acc)
            acc = z + 1
        return acc

    return f


def main():
    tbl = rnd(999, N * 8).reshape(N, 8)
    for sort_idx, lbl in ((False, "random"), (True, "sorted")):
        ts = {}
        for k in (1, 3):
            ts[k] = bench(chain_gather(k, sort_idx),
                          lambda i: (tbl, rnd(i, hi=N)),
                          name=f"gather w8 {lbl} x{k}")
        print(f"   -> marginal gather ({lbl}): {(ts[3]-ts[1])/2*1e3:.1f} ms")
    for sort_idx, lbl in ((False, "random"), (True, "sorted")):
        ts = {}
        for k in (1, 3):
            ts[k] = bench(chain_scatter(k, sort_idx),
                          lambda i: (rnd(i, hi=N), rnd(i + 9)),
                          name=f"scatter {lbl} x{k}")
        print(f"   -> marginal scatter ({lbl}): {(ts[3]-ts[1])/2*1e3:.1f} ms")

    # 2-col cummax along axis 0
    a2 = rnd(1, N * 2).reshape(N, 2)
    bench(jax.jit(lambda x: jax.lax.cummax(x, axis=0)),
          lambda i: (rnd(i, N * 2).reshape(N, 2),), name="cummax (N,2) axis0")

    # lax.cond: cheap-skip branch
    @jax.jit
    def f_cond(a, b, flag):
        return jax.lax.cond(
            flag,
            lambda: jax.lax.sort((a, b), num_keys=1)[0],
            lambda: a,
        )

    bench(f_cond, lambda i: (rnd(i), rnd(i + 3), jnp.bool_(False)),
          name="cond(False): skip a sort")
    bench(f_cond, lambda i: (rnd(i), rnd(i + 3), jnp.bool_(True)),
          name="cond(True): take the sort")

    # wide sort surcharge at 1.6M (combined-join candidate)
    n = 1 << 20 | 1 << 19
    for ops in (2, 3):
        arrs = tuple(rnd(7 + j, n) for j in range(ops))
        f = jax.jit(lambda *a: jax.lax.sort(a, num_keys=2)[0])
        bench(f, lambda i, ops=ops: tuple(rnd(i * 17 + j, n)
                                          for j in range(ops)),
              name=f"sort {ops}-op n=1.5M (2 keys)")


if __name__ == "__main__":
    main()
