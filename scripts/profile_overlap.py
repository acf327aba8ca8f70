"""Stage-level timing of the overlap kernel + primitive microbenchmarks.

Run on the real chip: python scripts/profile_overlap.py
"""
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
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1.0")

import jax
import jax.numpy as jnp

from sage2_tpu.utils.platform import ensure_backend

ensure_backend()

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.overlap import detect
from sage2_tpu.ops.sort import expand_by_counts, sort_by_keys


def bench(f, *args, n=5, name=""):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best*1e3:9.2f} ms")
    return out, best


def main():
    n_reads, read_len, min_ovl = 100_000, 100, 40
    genome = simulate_genome(int(n_reads * read_len / 45.0), seed=7)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=45.0,
                              error_rate=0.005, seed=8)
    reads = reads[:n_reads]
    from sage2_tpu.overlap import prepare_reads
    rs = prepare_reads(jnp.asarray(reads))
    reads2, valid2 = rs.reads2, rs.valid2
    M, L = reads2.shape
    print(f"M={M} L={L} min_ovl={min_ovl}")
    s = 32
    pa = L - min_ovl
    cap = 1 << 21

    # --- stage pieces ---
    pack = jax.jit(detect.shifted_word_packs)
    shifted, t_pack = bench(pack, reads2, name="shifted_word_packs")

    def keys(shifted):
        return detect.seed_keys_from_packs(shifted, s, 0, pa, L)
    jkeys = jax.jit(keys)
    (s_hi, s_lo), t_keys = bench(jkeys, shifted, name="seed_keys")

    def join(s_hi, s_lo, valid2):
        return detect._prefix_join_parts(
            s_hi[:, 0], s_lo[:, 0], valid2,
            s_hi[:, 1:], s_lo[:, 1:], valid2, seed_bits=2 * s)
    jjoin = jax.jit(join)
    (b_read, lo_idx, counts), t_join = bench(jjoin, s_hi, s_lo, valid2,
                                             name="prefix_join (sort+tbl+gather)")

    def expand(counts, lo_idx, b_read):
        entry, rank, cand_valid = expand_by_counts(counts.reshape(-1), cap)
        cand_a = entry // pa
        cand_p = entry % pa + 1
        b_slot = jnp.minimum(lo_idx.reshape(-1)[entry] + rank, M - 1)
        cand_b = b_read[b_slot]
        return cand_a, cand_p, cand_b, cand_valid & (cand_a != cand_b)
    jexpand = jax.jit(expand)
    (cand_a, cand_p, cand_b, cand_valid), t_exp = bench(
        jexpand, counts, lo_idx, b_read, name=f"expand_by_counts(cap={cap})")

    def verify(shifted, cand_a, cand_p, cand_b):
        return detect.verify_candidates(
            reads2, cand_a, cand_p, cand_b, shifted=shifted,
            words0=shifted[:, 0, :], max_p=pa)
    jverify = jax.jit(verify)
    ok, t_ver = bench(jverify, shifted, cand_a, cand_p, cand_b, name="verify")

    def reduce_stage(ok, cand_a, cand_b, cand_p, cand_valid):
        ok = ok & cand_valid
        ovl = L - cand_p
        I32 = jnp.int32(2**31 - 1)
        e_src = jnp.where(ok, cand_a, I32)
        e_dst = jnp.where(ok, cand_b, I32)
        e_ovl = jnp.where(ok, ovl, 0)
        e_src, e_dst, e_ovl = sort_by_keys([e_src, e_dst, e_ovl])
        nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), I32)])
        nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), I32)])
        is_last = (e_src != nxt_src) | (e_dst != nxt_dst)
        keep = is_last & (e_src != I32)
        k_src = jnp.where(keep, e_src, I32)
        k_dst = jnp.where(keep, e_dst, I32)
        k_ovl = jnp.where(keep, e_ovl, 0)
        return sort_by_keys([k_src, k_dst, k_ovl])
    jreduce = jax.jit(reduce_stage)
    _, t_red = bench(jreduce, ok, cand_a, cand_b, cand_p, cand_valid,
                     name="reduce (2x sort of cap)")

    total = t_pack + t_keys + t_join + t_exp + t_ver + t_red
    print(f"{'SUM':40s} {total*1e3:9.2f} ms")
    print(f"n_candidates = {int(jnp.sum(counts))}")

    # --- primitive microbenchmarks ---
    print("\n--- primitives ---")
    key = jax.random.PRNGKey(0)

    for n in [1 << 20, 12 * (1 << 20)]:
        x = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        f = jax.jit(lambda x: jnp.sort(x))
        _, t = bench(f, x, name=f"sort 1-key n={n>>20}M")
        y = jax.random.randint(key, (n,), 0, 1 << 30, dtype=jnp.int32)
        f2 = jax.jit(lambda x, y: jax.lax.sort((x, y, y, y), num_keys=2,
                                               is_stable=True))
        _, t = bench(f2, x, y, name=f"sort 2-key+2val n={n>>20}M")

    # row gathers: table rows of width w, n random indices
    for (rows, w, n) in [(1 << 23, 2, 12 << 20), (200_000, 8, 2 << 20),
                         (3_200_000, 7, 2 << 20)]:
        tbl = jax.random.randint(key, (rows, w), 0, 1 << 30, dtype=jnp.int32)
        idx = jax.random.randint(key, (n,), 0, rows, dtype=jnp.int32)
        f = jax.jit(lambda t, i: t[i])
        _, tg = bench(f, tbl, idx, name=f"row gather rows={rows} w={w} n={n>>20}M")
        print(f"   -> {n/tg/1e6:.0f}M rows/s, {n*w*4/tg/1e9:.1f} GB/s")

    # flat gather
    tbl1 = jax.random.randint(key, (1 << 23,), 0, 1 << 30, dtype=jnp.int32)
    idx = jax.random.randint(key, (12 << 20,), 0, 1 << 23, dtype=jnp.int32)
    f = jax.jit(lambda t, i: t[i])
    _, tg = bench(f, tbl1, idx, name="flat gather 8M tbl, 12M idx")
    print(f"   -> {(12<<20)/tg/1e6:.0f}M elems/s")

    # scatter-max: n indices into m-size table
    idx2 = jax.random.randint(key, (12 << 20,), 0, 1 << 21, dtype=jnp.int32)
    vals = jnp.arange(12 << 20, dtype=jnp.int32)
    f = jax.jit(lambda i, v: jnp.full(1 << 21, -1, jnp.int32).at[i].max(v))
    _, ts = bench(f, idx2, vals, name="scatter-max 12M -> 2M")
    print(f"   -> {(12<<20)/ts/1e6:.0f}M elems/s")

    # cumsum / cummax over 12M
    x = jnp.ones(12 << 20, jnp.int32)
    f = jax.jit(lambda x: jnp.cumsum(x))
    bench(f, x, name="cumsum 12M")
    f = jax.jit(lambda x: jax.lax.cummax(x))
    bench(f, x, name="cummax 12M")


if __name__ == "__main__":
    main()
