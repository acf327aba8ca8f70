"""Stage timing of the round-2 fused find_overlaps at the bench shape."""
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
from sage2_tpu.ops.sort import sort_by_keys

U32M = jnp.uint32(0xFFFFFFFF)


def bench(f, *args, n=5, name=""):
    out = f(*args)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(n):
        t0 = time.perf_counter()
        out = f(*args)
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - t0)
    print(f"{name:52s} {best*1e3:9.2f} ms", flush=True)
    return out, best


def main():
    n_reads, read_len, min_ovl = 100_000, 100, 40
    genome = simulate_genome(int(n_reads * read_len / 45.0), seed=7)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=45.0,
                              error_rate=0.005, seed=8)
    reads2 = jnp.asarray(reads[:n_reads].astype(np.int32))
    valid2 = jnp.ones(n_reads, bool)
    M, L = reads2.shape
    s, pa = 32, L - min_ovl
    g = detect.auto_stride(min_ovl, s, pa)
    n_pos = -(-pa // g)
    W = -(-L // 16)
    R = g + n_pos
    N = M * R
    C = 1 << 20 | 1 << 16  # close to the auto capacity
    positions = list(range(g)) + [g * (j + 1) for j in range(n_pos)]
    print(f"M={M} N={N} C={C} g={g} n_pos={n_pos}")

    def prep(reads2, valid2):
        shifted = detect.shifted_word_packs(reads2)
        k_hi, k_lo = detect.seed_keys_at_positions(shifted, s, positions, L)
        payload = detect._row_payload(shifted, positions, g, L, W)
        h = detect._mix32(k_hi, k_lo)
        rv = jnp.broadcast_to(valid2[:, None], (M, R))
        h = jnp.where(rv, jnp.minimum(h, jnp.uint32(0xFFFFFFFE)), U32M)
        tag = jnp.zeros((M, R), jnp.uint32).at[:, g:].set(
            jnp.uint32(0x80000000))
        packed = tag | jnp.arange(N, dtype=jnp.uint32).reshape(M, R)
        return h.reshape(-1), packed.reshape(-1), payload.reshape(N, W + 1)
    (h, packed, payload), t_prep = bench(jax.jit(prep), reads2, valid2,
                                         name="prep (packs+keys+payload)")

    def dosort(h, packed):
        return sort_by_keys([h, packed])
    (s_hash, s_packed), t_sort = bench(jax.jit(dosort), h, packed,
                                       name="combined 2-op sort (N)")

    def pregather(s_packed, payload):
        sid = (s_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        return jnp.concatenate([s_packed[:, None], payload[sid]], axis=1)
    pays, t_pg = bench(jax.jit(pregather), s_packed, payload,
                       name="payload pregather (N, w9)")

    def scans(s_hash, s_packed):
        iota_n = jnp.arange(N, dtype=jnp.int32)
        prev = jnp.concatenate([s_hash[:1], s_hash[:-1]])
        is_head = (iota_n == 0) | (s_hash != prev)
        live = s_hash != U32M
        is_entry = ((s_packed >> 31) == 0) & live
        is_query = ((s_packed >> 31) == 1) & live
        entrycum = jnp.cumsum(is_entry.astype(jnp.int32))
        fill = jax.lax.cummax(
            jnp.stack([jnp.where(is_head, iota_n, 0),
                       jnp.where(is_head, entrycum - is_entry, 0)], axis=1),
            axis=0)
        run_start, entry_base = fill[:, 0], fill[:, 1]
        counts = jnp.where(is_query, entrycum - entry_base, 0)
        offsets = jnp.cumsum(counts)
        return counts, offsets, run_start
    (counts, offsets, run_start), t_scan = bench(
        jax.jit(scans), s_hash, s_packed, name="run-accounting scans")
    total = int(offsets[-1])
    print(f"n_candidates={total}")

    def expand(counts, offsets, run_start):
        iota_n = jnp.arange(N, dtype=jnp.int32)
        starts = offsets - counts
        sidx = jnp.where((counts > 0) & (starts < C), starts, C)
        grid = (
            jnp.full((C + 1, 3), -1, jnp.int32)
            .at[sidx]
            .max(jnp.stack([iota_n, starts, run_start], axis=1))[:C]
        )
        filled = jax.lax.cummax(grid, axis=0)
        return filled
    filled, t_exp = bench(jax.jit(expand), counts, offsets, run_start,
                          name="expansion scatter+cummax (C,3)")

    def cgather(filled, pays, offsets):
        qpos, startv, lo_v = filled[:, 0], filled[:, 1], filled[:, 2]
        iota_c = jnp.arange(C, dtype=jnp.int32)
        slot_valid = (qpos >= 0) & (iota_c < offsets[-1])
        rank = iota_c - startv
        bslot = jnp.clip(lo_v + rank, 0, N - 1)
        pay_a = pays[jnp.clip(qpos, 0, N - 1)]
        pay_b = pays[bslot]
        return pay_a, pay_b, slot_valid
    (pay_a, pay_b, slot_valid), t_cg = bench(
        jax.jit(cgather), filled, pays, offsets,
        name="2x candidate row gathers (C, w9)")

    def verify(pay_a, pay_b, slot_valid):
        qid = (pay_a[:, 0] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        eid = (pay_b[:, 0] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        cand_a = qid // R
        p = (qid % R - g + 1) * g
        cand_b = eid // R
        o = eid % R
        p0 = p - o
        ovl = L - p0
        cand_valid = slot_valid & (cand_a != cand_b) & (p0 <= pa)
        aq = pay_a[:, 1:1 + W]
        bo = pay_b[:, 1:1 + W]
        diff = aq ^ bo
        lc2 = (L - p) * 2
        t16 = jnp.arange(W, dtype=jnp.int32)[None, :] * 32
        vb = jnp.clip(lc2[:, None] - t16, 0, 32)
        shift = jnp.clip(32 - vb, 0, 31).astype(jnp.uint32)
        ok_word = jnp.where(vb == 0, True, (diff >> shift) == 0)
        apw = pay_a[:, 1 + W]
        b0w = pay_b[:, 1 + W]
        o2 = (2 * o).astype(jnp.uint32)
        lhs = apw & ((jnp.uint32(1) << o2) - 1)
        rhs = jnp.where(o == 0, jnp.uint32(0),
                        b0w >> jnp.clip(32 - 2 * o, 0, 31).astype(jnp.uint32))
        ok = jnp.all(ok_word, axis=1) & (lhs == rhs) & cand_valid
        return ok, cand_a, cand_b, ovl
    (ok, cand_a, cand_b, ovl), t_ver = bench(
        jax.jit(verify), pay_a, pay_b, slot_valid, name="elementwise verify")
    print(f"n_verified={int(jnp.sum(ok))}")

    def reduce(ok, cand_a, cand_b, ovl):
        return detect._reduce_fused(ok, cand_a, cand_b, ovl, L, M)
    _, t_red = bench(jax.jit(reduce), ok, cand_a, cand_b, ovl,
                     name="reduce (1 sort + cond)")

    total_t = t_prep + t_sort + t_pg + t_scan + t_exp + t_cg + t_ver + t_red
    print(f"{'SUM (staged)':52s} {total_t*1e3:9.2f} ms")


if __name__ == "__main__":
    main()
