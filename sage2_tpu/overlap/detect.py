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


def verify_candidates(
    reads2: jnp.ndarray,
    cand_a: jnp.ndarray,
    cand_p: jnp.ndarray,
    cand_b: jnp.ndarray,
    chunk: int = 1 << 16,
) -> jnp.ndarray:
    """Exact-extension check: reads2[a][p:] == reads2[b][:L-p] elementwise.

    Chunked with lax.map so peak memory is O(chunk * L) int8 instead of
    O(capacity * L) int32 — the unchunked form OOMs HBM at production
    capacities. (The Pallas word-packed variant in ops/pallas replaces
    this on the hot path.)
    """
    M, L = reads2.shape
    r8 = reads2.astype(jnp.int8)
    C = cand_a.shape[0]
    n_chunks = -(-C // chunk)
    pad = n_chunks * chunk - C

    def pad_to(x, fill):
        return jnp.concatenate(
            [x, jnp.full((pad,), fill, x.dtype)]
        ) if pad else x

    ca = pad_to(cand_a, 0).reshape(n_chunks, chunk)
    cp = pad_to(cand_p, L - 1).reshape(n_chunks, chunk)
    cb = pad_to(cand_b, 0).reshape(n_chunks, chunk)

    j = jnp.arange(L, dtype=jnp.int32)[None, :]

    def body(xs):
        a, p, b = xs
        a_rows = r8[jnp.clip(a, 0, M - 1)]
        b_rows = r8[jnp.clip(b, 0, M - 1)]
        a_shift = jnp.take_along_axis(
            a_rows, jnp.minimum(p[:, None] + j, L - 1), axis=1
        )
        eq = (a_shift == b_rows) | (j >= (L - p)[:, None])
        return jnp.all(eq, axis=1)

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
    ok = verify_candidates(reads2, cand_a, cand_p, cand_b) & cand_valid

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
