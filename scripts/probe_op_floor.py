"""Marginal cost of each heavy op INSIDE one jit on the axon relay.

Builds jitted programs with k dependent heavy ops (sort / row gather /
scatter / cummax / hand-rolled Hillis-Steele scan) and reports marginal
ms per op. Grounds the round-2 overlap-kernel op budget.
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

N = 1 << 21  # ~2M, near bench candidate scale


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
    print(f"{name:46s} {best*1e3:9.2f} ms", flush=True)
    return best


def rnd(seed, n=N, hi=1 << 30):
    return jax.random.randint(jax.random.PRNGKey(seed), (n,), 0, hi,
                              dtype=jnp.int32)


def chain_sorts(k):
    @jax.jit
    def f(a, b):
        for _ in range(k):
            a, b = jax.lax.sort((a, b), num_keys=1)
            a = a ^ b  # force dependency
        return a

    return f


def chain_gathers(k):
    @jax.jit
    def f(tbl, idx):
        acc = idx
        for _ in range(k):
            row = tbl[acc & (N - 1)]
            acc = acc + row[:, 0]
        return acc

    return f


def chain_cummax(k):
    @jax.jit
    def f(a):
        for _ in range(k):
            a = jax.lax.cummax(a) ^ 1
        return a

    return f


def chain_scatter(k):
    @jax.jit
    def f(idx, upd):
        acc = upd
        for _ in range(k):
            z = jnp.zeros(N, jnp.int32).at[idx].max(acc)
            acc = z + 1
        return acc

    return f


def hillis_steele_max(x):
    n = x.shape[0]
    d = 1
    while d < n:
        pad = jnp.full((d,), -(2 ** 31), x.dtype)
        x = jnp.maximum(x, jnp.concatenate([pad, x[:-d]]))
        d *= 2
    return x


def chain_hillis(k):
    @jax.jit
    def f(a):
        for _ in range(k):
            a = hillis_steele_max(a) ^ 1
        return a

    return f


def main():
    for maker, args, name in (
        (chain_sorts, lambda i: (rnd(i), rnd(i + 50)), "sort2op"),
        (chain_gathers,
         lambda i: (rnd(999, N * 8).reshape(N, 8), rnd(i, hi=N)), "gather w8"),
        (chain_scatter, lambda i: (rnd(i, hi=N), rnd(i + 9)), "scatter"),
        (chain_cummax, lambda i: (rnd(i),), "cummax"),
        (chain_hillis, lambda i: (rnd(i),), "hillis-steele max"),
    ):
        ts = {}
        for k in (1, 2, 4):
            ts[k] = bench(maker(k), args, name=f"{name} x{k} (one jit)")
        marg = (ts[4] - ts[1]) / 3
        print(f"   -> marginal {name}: {marg*1e3:.1f} ms/op")


if __name__ == "__main__":
    main()
