"""All-pairs exact suffix-prefix overlap detection.

This is the reference's dominant-cost stage (SURVEY.md §3.3: HOT LOOP #3,
the >=10x-per-chip target). TPU design (SURVEY.md §7 step 4):

  1. SEED EXTRACTION — every overlap of length l means B's length-s
     prefix (s = effective seed length <= 32) occurs in A at offset
     p = L - l. Extract the seed key of every A-position p in
     [1, L - min_overlap] (p = 0, full identity, is removed by dedup).
  2. SORTED SEED JOIN — sort the A-side (seed, read, pos) table once;
     each read B binary-searches its prefix seed to an index range;
     ranges are flattened into a static candidate capacity
     (expand_by_counts; overflow is detected and reported).
  3. EXACT EXTENSION — verify the remaining l - s bases with one masked
     vectorized compare per candidate (batched gather + equality on the
     VPU; Pallas kernel variant in ops/pallas for the hot path).
  4. REDUCTION — keep the longest overlap per ordered (A, B) pair
     (string-graph convention), emitting a deduplicated edge list sorted
     by (src, dst).

Seeds are lossless: a seed is a *prefix* of the required match, so every
true overlap >= min_overlap produces exactly one candidate.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import (
    expand_by_counts,
    lex_searchsorted,
    sort_by_keys,
)

_U32_MAX = jnp.uint32(0xFFFFFFFF)
_I32_MAX = jnp.int32(2**31 - 1)


class OverlapResult(NamedTuple):
    """Edge list with static capacity, sorted by (src, dst).

    src, dst: int32 vertex ids (padding rows = INT32_MAX).
    ovl: int32 overlap length (padding 0).
    n_edges: scalar int32; n_candidates: scalar int32 (pre-reduction,
    for capacity diagnostics); overflow: scalar bool — candidates
    exceeded capacity, rerun with a larger one (SURVEY.md §7 escape
    hatch).
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    ovl: jnp.ndarray
    n_edges: jnp.ndarray
    n_candidates: jnp.ndarray
    n_verified: jnp.ndarray
    overflow: jnp.ndarray


def shifted_word_packs(reads2: jnp.ndarray) -> jnp.ndarray:
    """Word packings of every read at all 16 base shifts: (M, 16, W).

    shifted[m, r, t] packs bases [r + 16t, r + 16t + 16) of read m
    (zero-padded past the end), so any suffix reads2[m, p:] is the word
    run shifted[m, p % 16, p // 16 :]. One-time O(16 M L) cost that turns
    per-base extension compares into per-word compares.
    """
    M, L = reads2.shape
    W = -(-L // 16)
    pad = jnp.zeros((M, 15), reads2.dtype)
    rp = jnp.concatenate([reads2, pad], axis=1)
    packs = [bitpack.pack_read_words(rp[:, r : r + L]) for r in range(16)]
    return jnp.stack(packs, axis=1)


def verify_candidates(
    reads2: jnp.ndarray,
    cand_a: jnp.ndarray,
    cand_p: jnp.ndarray,
    cand_b: jnp.ndarray,
    chunk: int = 1 << 20,
    shifted: jnp.ndarray | None = None,
    words0: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact-extension check: reads2[a][p:] == reads2[b][:L-p].

    Word-packed: compares ceil(L/16) uint32 words per candidate instead
    of L bytes — 16x less gather traffic (the stage that dominated the
    per-base version on TPU). The final partial word is checked on its
    top 2*(ovl mod 16) bits only. Chunked with lax.map above ``chunk``
    candidates to bound peak memory.
    """
    M, L = reads2.shape
    W = -(-L // 16)
    if shifted is None:
        shifted = shifted_word_packs(reads2)
    if words0 is None:
        words0 = shifted[:, 0, :]
    C = cand_a.shape[0]

    t16 = jnp.arange(W, dtype=jnp.int32)[None, :]

    def body(xs):
        a, p, b = xs
        a_c = jnp.clip(a, 0, M - 1)
        b_c = jnp.clip(b, 0, M - 1)
        r = p & 15
        w0 = p >> 4
        aw = shifted[a_c, r]                      # (c, W)
        idx = jnp.minimum(w0[:, None] + t16, W - 1)
        a_shift = jnp.take_along_axis(aw, idx, axis=1)
        bw = words0[b_c]
        diff = a_shift ^ bw
        ovl = L - p
        vb = jnp.clip((ovl[:, None] - 16 * t16) * 2, 0, 32)
        shift = jnp.clip(32 - vb, 0, 31).astype(jnp.uint32)
        ok_word = jnp.where(
            vb == 0,
            True,
            jnp.where(vb == 32, diff == 0, (diff >> shift) == 0),
        )
        return jnp.all(ok_word, axis=1)

    if C <= chunk:
        return body((cand_a, cand_p, cand_b))

    n_chunks = -(-C // chunk)
    pad = n_chunks * chunk - C

    def pad_to(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]
        ) if pad else x

    ca = pad_to(cand_a, 0).reshape(n_chunks, chunk)
    cp = pad_to(cand_p, L - 1).reshape(n_chunks, chunk)
    cb = pad_to(cand_b, 0).reshape(n_chunks, chunk)
    ok = jax.lax.map(body, (ca, cp, cb)).reshape(-1)
    return ok[:C]


def find_overlaps(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
    capacity: int = 1 << 20,
) -> OverlapResult:
    """Detect all maximal proper exact suffix-prefix overlaps >= min_overlap.

    reads2: (M, L) RC-augmented codes; valid2: (M,) row mask.
    Matches sage2_tpu.refmodel.oracle.oracle_overlaps on the valid rows.
    """
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    if min_overlap >= L:
        raise ValueError(f"min_overlap ({min_overlap}) must be < read len ({L})")

    # --- 1. seed extraction --------------------------------------------
    hi, lo = bitpack.kmer_keys(reads2, s)          # (M, L - s + 1)
    pa = L - min_overlap                           # positions 1..pa inclusive
    a_hi = hi[:, 1 : pa + 1]
    a_lo = lo[:, 1 : pa + 1]
    a_read = jnp.broadcast_to(
        jnp.arange(M, dtype=jnp.int32)[:, None], (M, pa)
    )
    a_pos = jnp.broadcast_to(
        jnp.arange(1, pa + 1, dtype=jnp.int32)[None, :], (M, pa)
    )
    a_valid = jnp.broadcast_to(valid2[:, None], (M, pa))
    # invalid rows sort to the end; real all-T seeds are filtered by the
    # per-entry validity value carried through the sort
    a_hi = jnp.where(a_valid, a_hi, _U32_MAX)
    a_lo = jnp.where(a_valid, a_lo, _U32_MAX)

    flat = lambda x: x.reshape(-1)
    s_hi, s_lo, s_read, s_pos, s_val = sort_by_keys(
        [flat(a_hi), flat(a_lo), flat(a_read), flat(a_pos)],
        [flat(a_valid).astype(jnp.int32)],
    )

    # --- 2. sorted seed join -------------------------------------------
    q_hi, q_lo = hi[:, 0], lo[:, 0]                # each read's prefix seed
    lo_idx = lex_searchsorted(s_hi, s_lo, q_hi, q_lo, side="left")
    hi_idx = lex_searchsorted(s_hi, s_lo, q_hi, q_lo, side="right")
    counts = jnp.where(valid2, hi_idx - lo_idx, 0)
    n_candidates = jnp.sum(counts)
    overflow = n_candidates > capacity

    b_idx, rank, cand_valid = expand_by_counts(counts, capacity)
    a_entry = jnp.minimum(lo_idx[b_idx] + rank, s_hi.shape[0] - 1)
    cand_a = s_read[a_entry]
    cand_p = s_pos[a_entry]
    cand_b = b_idx.astype(jnp.int32)
    cand_valid = cand_valid & (s_val[a_entry] == 1) & (cand_a != cand_b)

    # --- 3. exact extension --------------------------------------------
    ovl = L - cand_p
    shifted = shifted_word_packs(reads2)
    ok = verify_candidates(
        reads2, cand_a, cand_p, cand_b,
        shifted=shifted, words0=shifted[:, 0, :],
    ) & cand_valid

    # --- 4. longest-overlap reduction per (src, dst) -------------------
    e_src = jnp.where(ok, cand_a, _I32_MAX)
    e_dst = jnp.where(ok, cand_b, _I32_MAX)
    e_ovl = jnp.where(ok, ovl, 0)
    e_src, e_dst, e_ovl = sort_by_keys([e_src, e_dst, e_ovl])
    nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), _I32_MAX)])
    nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), _I32_MAX)])
    is_last = (e_src != nxt_src) | (e_dst != nxt_dst)
    keep = is_last & (e_src != _I32_MAX)

    k_src = jnp.where(keep, e_src, _I32_MAX)
    k_dst = jnp.where(keep, e_dst, _I32_MAX)
    k_ovl = jnp.where(keep, e_ovl, 0)
    k_src, k_dst, k_ovl = sort_by_keys([k_src, k_dst, k_ovl])
    n_edges = jnp.sum(keep.astype(jnp.int32))
    n_verified = jnp.sum(ok.astype(jnp.int32))
    return OverlapResult(
        k_src, k_dst, k_ovl, n_edges, n_candidates, n_verified, overflow
    )


def count_candidates(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
) -> jnp.ndarray:
    """Exact candidate count of the seed join (the cheap first phase of
    the auto-capacity strategy; SURVEY.md §7 "fixed capacities")."""
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    hi, lo = bitpack.kmer_keys(reads2, s)
    pa = L - min_overlap
    a_valid = jnp.broadcast_to(valid2[:, None], (M, pa))
    a_hi = jnp.where(a_valid, hi[:, 1 : pa + 1], _U32_MAX).reshape(-1)
    a_lo = jnp.where(a_valid, lo[:, 1 : pa + 1], _U32_MAX).reshape(-1)
    s_hi, s_lo = sort_by_keys([a_hi, a_lo])
    q_hi, q_lo = hi[:, 0], lo[:, 0]
    lo_idx = lex_searchsorted(s_hi, s_lo, q_hi, q_lo, side="left")
    hi_idx = lex_searchsorted(s_hi, s_lo, q_hi, q_lo, side="right")
    return jnp.sum(jnp.where(valid2, hi_idx - lo_idx, 0))


@functools.lru_cache(maxsize=64)
def _jitted_count(min_overlap: int, seed_len: int):
    return jax.jit(
        lambda r, v: count_candidates(r, v, min_overlap, seed_len)
    )


@functools.lru_cache(maxsize=64)
def _jitted_find(min_overlap: int, seed_len: int, capacity: int):
    return jax.jit(
        lambda r, v: find_overlaps(r, v, min_overlap, seed_len, capacity)
    )


def find_overlaps_auto(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
    min_capacity: int = 1 << 14,
) -> OverlapResult:
    """Two-phase overlap detection with right-sized candidate capacity.

    Phase 1 counts candidates exactly (~free); phase 2 runs the full
    kernel at the next power-of-two capacity. Power-of-two bucketing
    keeps recompiles bounded, and a grossly oversized static capacity —
    which taxes every downstream sort/scan — never happens.
    """
    n = int(_jitted_count(min_overlap, seed_len)(reads2, valid2))
    cap = max(min_capacity, 1 << max(n, 1).bit_length())
    return _jitted_find(min_overlap, seed_len, cap)(reads2, valid2)
