"""A/B microbench: table-build sort variants and reduce-compaction
variants on the real chip (informs detect.build_seed_table /
reduce_edge_candidates choices)."""
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
import numpy as np

from sage2_tpu.utils.platform import ensure_backend

ensure_backend()

from sage2_tpu.ops.sort import sort_by_keys

I32 = jnp.int32(2**31 - 1)


def bench(f, *args, n=5, name=""):
    out = jax.block_until_ready(f(*args))
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = jax.block_until_ready(f(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return out


def main():
    rng = np.random.default_rng(0)
    Mg = 1_600_000
    cap = 1_507_328  # bench memoized capacity (23 * 65536)

    hi = jnp.asarray(rng.integers(0, 2**32, Mg, dtype=np.uint32))
    lo = jnp.asarray(rng.integers(0, 2**32, Mg, dtype=np.uint32))
    val = jnp.asarray(rng.random(Mg) < 0.99)

    def table_sort_old(hi, lo, val):
        q_hi = jnp.where(val, hi, jnp.uint32(0xFFFFFFFF))
        q_lo = jnp.where(val, lo, jnp.uint32(0xFFFFFFFF))
        inval = (~val).astype(jnp.uint32)
        return sort_by_keys([q_hi, q_lo, inval],
                            [jnp.arange(Mg, dtype=jnp.int32)])

    def table_sort_new(hi, lo, val):
        q_hi = jnp.where(val, hi, jnp.uint32(0xFFFFFFFF))
        packed = jnp.where(val, jnp.uint32(0), jnp.uint32(0x80000000)) | \
            jnp.arange(Mg, dtype=jnp.uint32)
        return sort_by_keys([q_hi, packed])

    bench(jax.jit(table_sort_old), hi, lo, val, name="table sort 4-operand (old)")
    bench(jax.jit(table_sort_new), hi, lo, val, name="table sort 2-operand (new)")

    ok = jnp.asarray(rng.random(cap) < 0.45)
    ca = jnp.asarray(rng.integers(0, 200_000, cap, dtype=np.int32))
    cb = jnp.asarray(rng.integers(0, 200_000, cap, dtype=np.int32))
    co = jnp.asarray(rng.integers(40, 100, cap, dtype=np.int32))

    def reduce_two_sorts(ok, ca, cb, co):
        packed = (cb << 7) | co
        e_src = jnp.where(ok, ca, I32)
        e_pk = jnp.where(ok, packed, I32)
        e_src, e_pk = sort_by_keys([e_src, e_pk])
        e_dst = e_pk >> 7
        nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), I32)])
        nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), I32)])
        keep = ((e_src != nxt_src) | (e_dst != nxt_dst)) & (e_src != I32)
        k_src = jnp.where(keep, e_src, I32)
        k_pk = jnp.where(keep, e_pk, I32)
        return sort_by_keys([k_src, k_pk])

    def reduce_scatter_rows(ok, ca, cb, co):
        packed = (cb << 7) | co
        e_src = jnp.where(ok, ca, I32)
        e_pk = jnp.where(ok, packed, I32)
        e_src, e_pk = sort_by_keys([e_src, e_pk])
        e_dst = e_pk >> 7
        nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), I32)])
        nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), I32)])
        keep = ((e_src != nxt_src) | (e_dst != nxt_dst)) & (e_src != I32)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        pos = jnp.where(keep, pos, cap)
        rows = jnp.stack([e_src, e_pk], axis=1)
        return jnp.full((cap, 2), I32, jnp.int32).at[pos].set(
            rows, mode="drop")

    def reduce_scatter_cols(ok, ca, cb, co):
        packed = (cb << 7) | co
        e_src = jnp.where(ok, ca, I32)
        e_pk = jnp.where(ok, packed, I32)
        e_src, e_pk = sort_by_keys([e_src, e_pk])
        e_dst = e_pk >> 7
        nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), I32)])
        nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), I32)])
        keep = ((e_src != nxt_src) | (e_dst != nxt_dst)) & (e_src != I32)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        pos = jnp.where(keep, pos, cap)
        a = jnp.full((cap,), I32, jnp.int32).at[pos].set(e_src, mode="drop")
        b = jnp.full((cap,), I32, jnp.int32).at[pos].set(e_pk, mode="drop")
        return a, b

    bench(jax.jit(reduce_two_sorts), ok, ca, cb, co,
          name="reduce: 2nd sort (old)")
    bench(jax.jit(reduce_scatter_rows), ok, ca, cb, co,
          name="reduce: row-scatter compaction (new)")
    bench(jax.jit(reduce_scatter_cols), ok, ca, cb, co,
          name="reduce: 2x 1-col scatter compaction")


if __name__ == "__main__":
    main()
