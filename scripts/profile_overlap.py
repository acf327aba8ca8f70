"""Stage-level timing of the strided overlap kernel on the real chip.

Run: python scripts/profile_overlap.py
(Per-dispatch times below ~10ms are unreliable on the axon relay.)
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
from sage2_tpu.overlap import detect, prepare_reads
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
    print(f"{name:44s} {best*1e3:9.2f} ms", flush=True)
    return out, best


def main():
    n_reads, read_len, min_ovl = 100_000, 100, 40
    genome = simulate_genome(int(n_reads * read_len / 45.0), seed=7)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=45.0,
                              error_rate=0.005, seed=8)
    reads = reads[:n_reads]
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    reads2, valid2 = rs.reads2, rs.valid2
    M, L = reads2.shape
    s = 32
    pa = L - min_ovl
    g = detect.auto_stride(min_ovl, s, pa)
    n_pos = -(-pa // g)
    cap = 1 << 21
    print(f"M={M} L={L} min_ovl={min_ovl} g={g} n_pos={n_pos} cap={cap}")

    pack = jax.jit(detect.shifted_word_packs)
    shifted, t_pack = bench(pack, reads2, name="shifted_word_packs")

    def keys(shifted):
        b = detect.seed_keys_at_positions(shifted, s, list(range(g)), L)
        a = detect.seed_keys_at_positions(
            shifted, s, [g * (j + 1) for j in range(n_pos)], L)
        return b, a
    ((b_hi, b_lo), (a_hi, a_lo)), t_keys = bench(
        jax.jit(keys), shifted, name="seed_keys")

    def join(b_hi, b_lo, a_hi, a_lo, valid2):
        b_valid = jnp.repeat(valid2, g) if g > 1 else valid2
        return detect._prefix_join_parts(
            b_hi.reshape(-1), b_lo.reshape(-1), b_valid,
            a_hi, a_lo, valid2, seed_bits=2 * s)
    (b_entry, lo_idx, counts), t_join = bench(
        jax.jit(join), b_hi, b_lo, a_hi, a_lo, valid2,
        name="bucket_join (sort+tbl+probe)")

    # join sub-pieces
    def join_sort(b_hi, b_lo, valid2):
        b_valid = jnp.repeat(valid2, g) if g > 1 else valid2
        q_hi = jnp.where(b_valid, b_hi.reshape(-1), jnp.uint32(0xFFFFFFFF))
        q_lo = jnp.where(b_valid, b_lo.reshape(-1), jnp.uint32(0xFFFFFFFF))
        inval = (~b_valid).astype(jnp.uint32)
        Mg = q_hi.shape[0]
        return sort_by_keys(
            [q_hi, q_lo, inval],
            [jnp.arange(Mg, dtype=jnp.int32), b_valid.astype(jnp.int32)])
    _, t_js = bench(jax.jit(join_sort), b_hi, b_lo, valid2,
                    name="  join: B-table sort")

    def expand(counts, lo_idx, b_entry):
        entry, rank, cand_valid = expand_by_counts(counts.reshape(-1), cap)
        cand_a = entry // n_pos
        cand_p = (entry % n_pos + 1) * g
        b_slot = jnp.minimum(lo_idx.reshape(-1)[entry] + rank, M * g - 1)
        e_b = b_entry[b_slot]
        cand_b = e_b // g
        cand_p0 = cand_p - (e_b - cand_b * g)
        cand_valid = cand_valid & (cand_a != cand_b) & (cand_p0 <= pa)
        return cand_a, jnp.clip(cand_p0, 1, pa), cand_b, cand_valid
    (cand_a, cand_p0, cand_b, cand_valid), t_exp = bench(
        jax.jit(expand), counts, lo_idx, b_entry,
        name=f"expand+decode")

    def verify(shifted, cand_a, cand_p0, cand_b):
        return detect.verify_candidates(
            reads2, cand_a, cand_p0, cand_b, shifted=shifted,
            words0=shifted[:, 0, :], max_p=pa)
    ok, t_ver = bench(jax.jit(verify), shifted, cand_a, cand_p0, cand_b,
                      name="verify")

    def reduce_stage(ok, cand_a, cand_b, cand_p0, cand_valid):
        ok = ok & cand_valid
        ovl = L - cand_p0
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
    _, t_red = bench(jax.jit(reduce_stage), ok, cand_a, cand_b, cand_p0,
                     cand_valid, name="reduce (2x sort of cap)")

    def reduce_sort1(ok, cand_a, cand_b, cand_p0, cand_valid):
        ok = ok & cand_valid
        ovl = L - cand_p0
        I32 = jnp.int32(2**31 - 1)
        return sort_by_keys([jnp.where(ok, cand_a, I32),
                             jnp.where(ok, cand_b, I32),
                             jnp.where(ok, ovl, 0)])
    _, t_r1 = bench(jax.jit(reduce_sort1), ok, cand_a, cand_b, cand_p0,
                    cand_valid, name="  reduce: one 3-op sort")

    total = t_pack + t_keys + t_join + t_exp + t_ver + t_red
    print(f"{'SUM':44s} {total*1e3:9.2f} ms")
    print(f"n_candidates = {int(jnp.sum(counts))}")


if __name__ == "__main__":
    main()
