"""All-pairs exact suffix-prefix overlap detection.

This is the reference's dominant-cost stage (SURVEY.md §3.3: HOT LOOP #3,
the >=10x-per-chip target). TPU design (SURVEY.md §7 step 4):

  1. SEED EXTRACTION — every overlap of length l means B's length-s
     prefix (s = effective seed length <= 32) occurs in A at offset
     p = L - l. A-side candidates are the seed keys of every position
     p in [1, L - min_overlap] (p = 0, full identity, is removed by
     dedup) — ~L/2 per read.
  2. INVERTED SORTED JOIN — sort and run-length-dedup the SMALL side
     (one prefix seed per read, M entries) into a unique-prefix table;
     every A-side entry (M * ~L/2 of them) binary-searches it. This
     orientation avoids sorting the huge A-side — the join cost is a
     wide vectorized binary search against a table that fits on-chip,
     not an O(M L log^2) device sort. Matches are flattened into a
     static candidate capacity (expand_by_counts; exact overflow
     detection).
  3. EXACT EXTENSION — word-packed compare per candidate (16 bases per
     uint32; see verify_candidates).
  4. REDUCTION — keep the longest overlap per ordered (A, B) pair
     (string-graph convention), emitting a deduplicated edge list sorted
     by (src, dst).

Seeds are lossless: a seed is a *prefix* of the required match, so every
true overlap >= min_overlap produces exactly one candidate.
"""

from __future__ import annotations

import functools
import os
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import (
    sort_by_keys,
)

_U32_MAX = jnp.uint32(0xFFFFFFFF)
_I32_MAX = jnp.int32(2**31 - 1)

# last successful candidate capacity per (M, L, min_overlap, seed_len):
# value is [capacity, steady_validated] — steady_validated flips True
# after the first validate=False dispatch has confirmed (via one
# readback) that the memoized capacity holds for the caller's actual
# inputs; later validate=False dispatches then skip the readback.
# Bounded: callers cycle few problem shapes; evict oldest beyond that.
_CAP_MEMO: dict = {}
_CAP_MEMO_MAX = 256


def _memo_put(key, value) -> None:
    if key not in _CAP_MEMO and len(_CAP_MEMO) >= _CAP_MEMO_MAX:
        _CAP_MEMO.pop(next(iter(_CAP_MEMO)))
    _CAP_MEMO[key] = value


class OverlapResult(NamedTuple):
    """Edge list with static capacity, sorted by (src, dst).

    src, dst: int32 vertex ids (padding rows = INT32_MAX).
    ovl: int32 overlap length (padding 0).
    n_edges: scalar int32; n_candidates: scalar int32 (pre-reduction,
    for capacity diagnostics); overflow: scalar bool — candidates
    exceeded capacity, rerun with a larger one (SURVEY.md §7 escape
    hatch). contained: (M,) bool — vertex is fully contained in a
    longer read (ragged inputs; all-False for fixed-length);
    n_contained: scalar int32. n_dups: scalar int32 — only set by the
    defer_dup_compact path (find_overlaps_stacked): number of
    duplicate-(src,dst) rows still present in the edge arrays; the
    caller compacts iff > 0 (essentially never — needs periodic reads).
    """

    src: jnp.ndarray
    dst: jnp.ndarray
    ovl: jnp.ndarray
    n_edges: jnp.ndarray
    n_candidates: jnp.ndarray
    n_verified: jnp.ndarray
    overflow: jnp.ndarray
    contained: jnp.ndarray = None
    n_contained: jnp.ndarray = None
    n_dups: jnp.ndarray = None


# shared with the k-mer layer (ops.bitpack): word packings of every read
# at all 16 base shifts, (M, 16, W) — any suffix reads2[m, p:] is the
# word run shifted[m, p % 16, p // 16 :]
shifted_word_packs = bitpack.shifted_word_packs


def verify_candidates(
    reads2: jnp.ndarray,
    cand_a: jnp.ndarray,
    cand_p: jnp.ndarray,
    cand_b: jnp.ndarray,
    chunk: int = 1 << 20,
    shifted: jnp.ndarray | None = None,
    words0: jnp.ndarray | None = None,
    max_p: int | None = None,
    b_words: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Exact-extension check: reads2[a][p:] == reads2[b][:L-p].

    Word-packed: compares ceil(L/16) uint32 words per candidate instead
    of L bytes. Each candidate costs exactly TWO contiguous row gathers
    (flat index a*16 + p%16, and b) — the word-level offset p//16 is
    applied in registers via a static select over the few possible
    values, because generic multi-dimensional gathers were the dominant
    cost on TPU. The final partial word is checked on its top
    2*(ovl mod 16) bits only. Chunked with lax.map above ``chunk``
    candidates to bound peak memory. ``max_p``: static bound on cand_p
    (defaults to L-1), limits the select fan-out.
    """
    M, L = reads2.shape
    W = -(-L // 16)
    if shifted is None:
        shifted = shifted_word_packs(reads2)
    if words0 is None:
        words0 = shifted[:, 0, :]
    C = cand_a.shape[0]
    max_w0 = (max_p if max_p is not None else L - 1) >> 4
    shifted_flat = shifted.reshape(M * 16, W)

    t16 = jnp.arange(W, dtype=jnp.int32)[None, :]

    Mb = words0.shape[0]  # may exceed M when words0 is a global replica
                          # under chunked/sharded verification

    def body(xs):
        a, p, b, bw = xs
        a_c = jnp.clip(a, 0, M - 1)
        b_c = jnp.clip(b, 0, Mb - 1)
        r = p & 15
        w0 = p >> 4
        aw = shifted_flat[a_c * 16 + r]           # (c, W) row gather
        if bw is None:                            # caller pre-gathered?
            bw = words0[b_c]                      # (c, W) row gather
        # register word-shift: a_shift[:, t] = aw[:, t + w0]
        a_shift = aw
        for k in range(1, max_w0 + 1):
            rolled = jnp.concatenate(
                [aw[:, k:], jnp.zeros((aw.shape[0], k), aw.dtype)], axis=1
            )
            a_shift = jnp.where(w0[:, None] == k, rolled, a_shift)
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
        return body((cand_a, cand_p, cand_b, b_words))

    n_chunks = -(-C // chunk)
    pad = n_chunks * chunk - C

    def pad_to(x, fill):
        if not pad:
            return x
        fill_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, fill_block])

    ca = pad_to(cand_a, 0).reshape(n_chunks, chunk)
    cp = pad_to(cand_p, L - 1).reshape(n_chunks, chunk)
    cb = pad_to(cand_b, 0).reshape(n_chunks, chunk)
    if b_words is None:
        ok = jax.lax.map(
            lambda xs: body(xs + (None,)), (ca, cp, cb)
        ).reshape(-1)
    else:
        bw = pad_to(b_words, 0).reshape(n_chunks, chunk, W)
        ok = jax.lax.map(body, (ca, cp, cb, bw)).reshape(-1)
    return ok[:C]


def seed_keys_at_positions(
    shifted: jnp.ndarray, s: int, positions: Sequence[int], L: int
):
    """Left-aligned seed keys at an arbitrary static position list.

    The seed at position p is bases [p, p+s); its left-aligned key is
    (word covering [p, p+16), word covering [p+16, p+32)) masked to the
    top 2s bits — any injective mapping works for joining, and both the
    B table and the strided A-side probe schedule use this one. Static
    slices into the shifted packs, no arithmetic. Returns (hi, lo) of
    shape (M, len(positions)).
    """
    W = shifted.shape[2]
    his, los = [], []
    for p in positions:
        if p + s > L:
            raise ValueError(
                f"seed position {p} + seed length {s} exceeds read "
                f"length {L}"
            )
        r, w = p % 16, p // 16
        his.append(shifted[:, r, w])
        if s > 16:
            # p + s <= L with s > 16 implies p + 16 < L <= 16 W, so
            # w + 1 < W always; the min() is inert, kept as belt.
            los.append(shifted[:, r, min(w + 1, W - 1)])
    hi = jnp.stack(his, axis=1)
    if s < 16:
        hi = hi & jnp.uint32((0xFFFFFFFF << (32 - 2 * s)) & 0xFFFFFFFF)
    if s > 16:
        lo = jnp.stack(los, axis=1)
        if s < 32:
            lo = lo & jnp.uint32(
                (0xFFFFFFFF << (32 - 2 * (s - 16))) & 0xFFFFFFFF
            )
    else:
        lo = jnp.zeros_like(hi)
    return hi, lo


def word_at_positions(
    words0: jnp.ndarray, positions: Sequence[int], L: int
) -> list:
    """The uint32 word covering bases [p, p+16) for each static p, from
    the UNSHIFTED packing (words0 = pack_read_words(reads), (..., W)).

    (w0[p//16] << 2r) | (w0[p//16+1] >> (32-2r)) with r = p % 16 — two
    elementwise ops per word instead of materializing all 16 shifted
    packs (16x the read bytes; the larger-than-HBM streamed path OOMed
    on that at 2M-read chunks). Words past the read end are zero-padded,
    matching shifted_word_packs.
    """
    W = words0.shape[-1]
    out = []
    for p in positions:
        r, w = p % 16, p // 16
        if w >= W:
            out.append(jnp.zeros(words0.shape[:-1], words0.dtype))
            continue
        cur = words0[..., w]
        if r == 0:
            out.append(cur)
            continue
        nxt = (
            words0[..., w + 1] if w + 1 < W
            else jnp.zeros_like(cur)
        )
        sh = jnp.uint32(2 * r)
        out.append((cur << sh) | (nxt >> jnp.uint32(32 - 2 * r)))
    return out


def seed_keys_from_words0(
    words0: jnp.ndarray, s: int, positions: Sequence[int], L: int
):
    """seed_keys_at_positions computed from the unshifted word packing
    (same keys, no 16-shift precompute). Returns (hi, lo) of shape
    (..., len(positions))."""
    for p in positions:
        if p + s > L:
            raise ValueError(
                f"seed position {p} + seed length {s} exceeds read "
                f"length {L}"
            )
    hi = jnp.stack(word_at_positions(words0, positions, L), axis=-1)
    if s < 16:
        hi = hi & jnp.uint32((0xFFFFFFFF << (32 - 2 * s)) & 0xFFFFFFFF)
    if s > 16:
        lo = jnp.stack(
            word_at_positions(words0, [p + 16 for p in positions], L),
            axis=-1,
        )
        if s < 32:
            lo = lo & jnp.uint32(
                (0xFFFFFFFF << (32 - 2 * (s - 16))) & 0xFFFFFFFF
            )
    else:
        lo = jnp.zeros_like(hi)
    return hi, lo


def verify_candidates_words0(
    words0_a: jnp.ndarray,
    cand_a: jnp.ndarray,
    cand_p: jnp.ndarray,
    b_words: jnp.ndarray,
    L: int,
    max_p: int | None = None,
    chunk: int = 1 << 20,
) -> jnp.ndarray:
    """Exact-extension check from the UNSHIFTED A-side packing.

    Semantics identical to verify_candidates with pre-gathered b_words:
    reads_a[a][p:] == reads_b[:L-p] — one row gather per candidate
    (words0_a[a]), then the word-level offset p//16 is applied via a
    static select loop and the sub-word offset p%16 via per-candidate
    variable bit-shifts, all in registers. Memory: W words per A row
    instead of 16W (shifted packs) — this is what lets the streamed path
    run 1M+-read chunks within HBM.
    """
    M, W = words0_a.shape
    max_w0 = (max_p if max_p is not None else L - 1) >> 4
    t16 = jnp.arange(W, dtype=jnp.int32)[None, :]

    def body(xs):
        a, p, bw = xs
        aw = words0_a[jnp.clip(a, 0, M - 1)]          # (c, W) row gather
        w0 = p >> 4
        a_shift = aw
        for k in range(1, max_w0 + 1):
            rolled = jnp.concatenate(
                [aw[:, k:], jnp.zeros((aw.shape[0], k), aw.dtype)], axis=1
            )
            a_shift = jnp.where(w0[:, None] == k, rolled, a_shift)
        # sub-word shift by 2*(p%16): bring base p to the word top
        r2 = (2 * (p & 15)).astype(jnp.uint32)[:, None]
        nxt = jnp.concatenate(
            [a_shift[:, 1:], jnp.zeros((a_shift.shape[0], 1),
                                       a_shift.dtype)], axis=1
        )
        a_al = jnp.where(
            r2 == 0, a_shift,
            (a_shift << r2) | (nxt >> (jnp.uint32(32) - r2)),
        )
        diff = a_al ^ bw
        ovl = L - p
        vb = jnp.clip(ovl[:, None] * 2 - 32 * t16, 0, 32)
        shift = jnp.clip(32 - vb, 0, 31).astype(jnp.uint32)
        ok_word = jnp.where(
            vb == 0,
            True,
            jnp.where(vb == 32, diff == 0, (diff >> shift) == 0),
        )
        return jnp.all(ok_word, axis=1)

    C = cand_a.shape[0]
    if C <= chunk:
        return body((cand_a, cand_p, b_words))
    n_chunks = -(-C // chunk)
    pad = n_chunks * chunk - C

    def pad_to(x, fill):
        if not pad:
            return x
        fill_block = jnp.full((pad,) + x.shape[1:], fill, x.dtype)
        return jnp.concatenate([x, fill_block])

    ca = pad_to(cand_a, 0).reshape(n_chunks, chunk)
    cp = pad_to(cand_p, L - 1).reshape(n_chunks, chunk)
    bw = pad_to(b_words, 0).reshape(n_chunks, chunk, W)
    return jax.lax.map(body, (ca, cp, bw)).reshape(-1)[:C]


def _prefix_join_parts(
    p_hi: jnp.ndarray, p_lo: jnp.ndarray, p_valid: jnp.ndarray,
    a_hi: jnp.ndarray, a_lo: jnp.ndarray, a_row_valid: jnp.ndarray,
    seed_bits: int = 64, bucket_bits: int | None = None,
):
    """Inverted seed join via a direct-mapped bucket table.

    p_*: (Mg,) one prefix seed per (global) read + validity. a_*: any
    (..., pa) A-side seed keys with per-row validity (...,).

    Prefixes are sorted once (valid-first within ties); a 2^B-entry
    start table over the top B key bits then answers every A-side query
    with ONE gather instead of a log(Mg)-step binary search — the join
    was gather-bound on TPU. Bucket collisions produce false candidates,
    which is SAFE: the exact-extension verify re-checks the entire
    overlap including the seed region, so the final edge set is
    unchanged; only n_candidates (capacity sizing) includes the ~Mg/2^B
    collision overhead.

    Returns (b_read, lo_idx, counts): b_read (Mg,) read ids sorted by
    prefix key; lo_idx/counts shaped like a_hi — bucket start slot and
    number of candidate B reads per A-side entry.
    """
    B = _pick_bucket_bits(
        p_hi.shape[0], max(int(a_hi.size), 1), seed_bits, bucket_bits
    )
    st = build_seed_table(p_hi, p_lo, p_valid, B)
    lo_idx, counts = probe_seed_table(st, a_hi, a_row_valid)
    return st.entry, lo_idx, counts


def _pick_bucket_bits(
    n_table: int, n_queries: int, seed_bits: int, bucket_bits: int | None
) -> int:
    if bucket_bits is None:
        # balance the start-table scan (2^B elements, ~2ns each) against
        # bucket-collision candidates (queries * n_table / 2^B, ~40ns
        # each through expand+verify): optimum at 2^B ~ sqrt(20 * Q * T)
        bucket_bits = max(
            (20 * n_queries * max(n_table, 1)).bit_length() // 2, 18
        )
    return min(bucket_bits, seed_bits, 31, 26)  # int32 ids; <=512MB table


class SeedTable(NamedTuple):
    """Direct-mapped bucket index over sorted seed keys.

    entry: (T,) original entry ids in key-sorted order (invalid last);
    packed: (2^B, 2) int32 — per bucket [start slot, entry count];
    bucket_bits: static B.
    """

    entry: jnp.ndarray
    packed: jnp.ndarray
    bucket_bits: int


def build_seed_table(
    p_hi: jnp.ndarray, p_lo: jnp.ndarray, p_valid: jnp.ndarray,
    bucket_bits: int,
) -> SeedTable:
    """Bucket-group seed keys and build the bucket start table.

    Probes return ENTIRE buckets (exact extension re-verifies every
    candidate), so only grouping by the top ``bucket_bits`` of ``hi``
    matters — not full (hi, lo) key order. The sort therefore runs with
    just TWO operands: ``hi`` and a packed (invalid-bit | entry-id) word
    whose top bit doubles as the tie-break that sends invalid entries
    (hi forced to all-ones) strictly after any real all-T seeds. Sort
    cost scales with operand count; the previous 4-operand full-key sort
    was the single most expensive op of the join.
    """
    q_hi = jnp.where(p_valid, p_hi, _U32_MAX)
    Mg = p_hi.shape[0]
    if Mg >= 1 << 31:
        # entry ids pack as (invalid-bit | id) in one uint32 word
        raise ValueError(f"seed table too large: {Mg} entries >= 2^31")
    packed = jnp.where(
        p_valid, jnp.uint32(0), jnp.uint32(0x80000000)
    ) | jnp.arange(Mg, dtype=jnp.uint32)
    b_hi, b_packed = sort_by_keys([q_hi, packed])
    b_read = (b_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    n_valid = jnp.sum(p_valid.astype(jnp.int32))
    b_val = (jnp.arange(Mg, dtype=jnp.int32) < n_valid).astype(jnp.int32)
    return table_from_sorted(b_hi, b_read, b_val, bucket_bits)


def table_from_sorted(
    b_hi: jnp.ndarray, b_entry: jnp.ndarray, b_val: jnp.ndarray,
    bucket_bits: int,
) -> SeedTable:
    """Bucket start table over an ALREADY key-sorted entry list (valid
    entries first). Split out so chunk-merged (streamed) tables reuse it
    (stream.find_overlaps_chunked)."""
    B = bucket_bits
    Mg = b_hi.shape[0]
    shift = jnp.uint32(32 - B)
    nb = 1 << B
    n_valid = jnp.sum(b_val)

    bucket = (b_hi >> shift).astype(jnp.int32)
    idx = jnp.arange(Mg, dtype=jnp.int32)
    tbl = (
        jnp.full(nb + 1, Mg, jnp.int32)
        .at[jnp.where(b_val == 1, bucket, nb)]
        .min(idx)
    )
    tbl = tbl.at[nb].min(n_valid)
    # forward-fill empty buckets from the right: start[b] = first sorted
    # index whose bucket >= b
    start = jax.lax.cummin(tbl[::-1])[::-1]
    # pack (start, count) as one 2-column table: each query is a single
    # row gather instead of two separate 6M-element table gathers
    packed = jnp.stack([start[:-1], start[1:] - start[:-1]], axis=1)
    return SeedTable(b_entry, packed, B)


def probe_seed_table(
    st: SeedTable, a_hi: jnp.ndarray, a_row_valid: jnp.ndarray
):
    """One row gather per query: (bucket start slot, candidate count)."""
    shift = jnp.uint32(32 - st.bucket_bits)
    qb = (a_hi >> shift).astype(jnp.int32)
    row = st.packed[qb]
    lo_idx = row[..., 0]
    counts = jnp.where(a_row_valid[..., None], row[..., 1], 0)
    return lo_idx, counts


def reduce_edge_candidates(
    ok: jnp.ndarray,
    cand_a: jnp.ndarray,
    cand_b: jnp.ndarray,
    cand_ovl: jnp.ndarray,
    read_len: int,
    max_vertex: int,
):
    """Longest-overlap-per-(src,dst) reduction + compaction.

    Returns (src, dst, ovl, n_edges) with padding rows INT32_MAX, sorted
    by (src, dst). When dst and ovl fit one int31 word together
    (max_vertex * 2^ceil(log2(read_len+1)) < 2^31, true for anything
    below ~16M vertices at 100 bp), both sorts run with 2 operands
    instead of 3 — sort cost scales with operand count.
    """
    ov_bits = int(read_len).bit_length()  # ovl <= read_len fits
    packable = max_vertex < (1 << (31 - ov_bits))
    if packable:
        packed = (cand_b << ov_bits) | cand_ovl
        e_src = jnp.where(ok, cand_a, _I32_MAX)
        e_pk = jnp.where(ok, packed, _I32_MAX)
        e_src, e_pk = sort_by_keys([e_src, e_pk])
        e_dst = e_pk >> ov_bits
        nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), _I32_MAX)])
        nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), _I32_MAX)])
        is_last = (e_src != nxt_src) | (e_dst != nxt_dst)
        keep = is_last & (e_src != _I32_MAX)
        # compaction via a second sort: measured 5x faster than cumsum +
        # scatter compaction on TPU (scripts/probe_reduce_ab.py) — the
        # sort engine beats data-dependent scatters at this size
        k_src = jnp.where(keep, e_src, _I32_MAX)
        k_pk = jnp.where(keep, e_pk, _I32_MAX)
        k_src, k_pk = sort_by_keys([k_src, k_pk])
        pad = k_src == _I32_MAX
        k_dst = jnp.where(pad, _I32_MAX, k_pk >> ov_bits)
        k_ovl = jnp.where(pad, 0, k_pk & ((1 << ov_bits) - 1))
        return k_src, k_dst, k_ovl, jnp.sum(keep.astype(jnp.int32))

    e_src = jnp.where(ok, cand_a, _I32_MAX)
    e_dst = jnp.where(ok, cand_b, _I32_MAX)
    e_ovl = jnp.where(ok, cand_ovl, 0)
    e_src, e_dst, e_ovl = sort_by_keys([e_src, e_dst, e_ovl])
    nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), _I32_MAX)])
    nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), _I32_MAX)])
    is_last = (e_src != nxt_src) | (e_dst != nxt_dst)
    keep = is_last & (e_src != _I32_MAX)
    k_src = jnp.where(keep, e_src, _I32_MAX)
    k_dst = jnp.where(keep, e_dst, _I32_MAX)
    k_ovl = jnp.where(keep, e_ovl, 0)
    k_src, k_dst, k_ovl = sort_by_keys([k_src, k_dst, k_ovl])
    return k_src, k_dst, k_ovl, jnp.sum(keep.astype(jnp.int32))


def auto_stride(min_overlap: int, seed_len: int, pa: int) -> int:
    """Largest lossless probe stride g: the B side indexes seeds at
    prefix offsets o in [0, g), so an A-side probe every g positions
    still discovers every overlap; requires o + s <= min_overlap so the
    offset seed stays inside the guaranteed match region."""
    s = min(seed_len, min_overlap, 32)
    return max(1, min(8, min_overlap - s + 1, pa))


def _mix32(hi: jnp.ndarray, lo: jnp.ndarray) -> jnp.ndarray:
    """32-bit avalanche mix of a (hi, lo) seed key: the fused join keys
    runs on this hash, so collision rate is ~Q*T/2^32 (negligible; the
    exact-extension verify re-checks every candidate anyway) instead of
    the top-bucket-bits collisions of the round-1 table."""
    h = hi * jnp.uint32(0x9E3779B1) + lo * jnp.uint32(0x85EBCA77)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    return h ^ (h >> 15)


def _row_payload(
    shifted: jnp.ndarray, positions, n_entries: int, L: int, W_pay: int,
    lengths: jnp.ndarray, trim: int = 0,
) -> jnp.ndarray:
    """Per-(read, seed-position) payload rows for the fused join.

    Row = [aw0..aw(Wt-1), xw, len] where aw_t is the uint32 word
    covering bases [pos + 16*(trim+t), pos + 16*(trim+t) + 16)
    (zero-padded past the read end) and ``len`` is the read's length
    (constant L for fixed-length inputs — carrying it uniformly keeps
    ONE kernel for ragged and fixed reads). ``W_pay`` is the word count
    ceil((L - g) / 16) covering the verify span; ``trim`` drops the
    first words (Wt = W_pay - trim): the join sorts on the EXACT seed
    key, so the seed-covered words are equal within a run by
    construction and never need shipping or comparing (round-4 cut —
    gather cost scales with row width on the bench chip). The shared
    column xw is role-dependent: the first ``n_entries`` positions are
    ENTRY rows, whose xw is the read's FIRST word (bases [0, 16) — the
    B side of the prefix check); the rest are QUERY rows, whose xw is
    the prev-window word (bases [pos-16, pos), base pos-1 in the bottom
    2 bits — the A side). Static slices only.
    Returns (M, len(positions), W_pay - trim + 2) uint32.
    """
    M = shifted.shape[0]
    W = shifted.shape[2]
    Wt = W_pay - trim
    lcol = lengths.astype(jnp.uint32)[:, None]
    rows = []
    for i, pos in enumerate(positions):
        r, w = pos % 16, pos // 16 + trim
        aw = shifted[:, r, w : w + Wt]
        pad = Wt - (W - w)
        if pad > 0:
            aw = jnp.concatenate(
                [aw, jnp.zeros((M, pad), shifted.dtype)], axis=1
            )
        if i < n_entries:
            xw = shifted[:, 0, 0]                   # B side: bases [0,16)
        elif pos < 16:
            xw = shifted[:, 0, 0] >> jnp.uint32(2 * (16 - pos))
        else:
            xw = shifted[:, pos % 16, pos // 16 - 1]
        rows.append(jnp.concatenate([aw, xw[:, None], lcol], axis=1))
    return jnp.stack(rows, axis=1)


class JoinGeometry(NamedTuple):
    """Static shape parameters of the strided fused join."""

    g: int          # probe stride == B-side offset count
    n_pos: int      # A-side probe positions (at g, 2g, ...)
    R: int          # seed rows per read == g + n_pos
    pa: int         # last possible overlap start == L - min_overlap
    Wp: int         # full verify-span words == ceil((L - g) / 16)
    trim: int = 0   # leading words guaranteed equal by the seed key
                    # (1 when s >= 16, 2 when s == 32 — the key is
                    # unmasked over those words)

    @property
    def Wt(self) -> int:
        """Shipped payload words per row (after the seed trim)."""
        return self.Wp - self.trim


def join_geometry(
    L: int, min_overlap: int, s: int, stride: int | None = None
) -> JoinGeometry:
    if min_overlap >= L:
        raise ValueError(f"min_overlap ({min_overlap}) must be < read len ({L})")
    pa = L - min_overlap
    g = auto_stride(min_overlap, s, pa) if stride is None else stride
    if not 1 <= g <= min(16, min_overlap - s + 1):
        raise ValueError(f"stride {g} invalid for min_overlap={min_overlap}, "
                         f"seed={s}")
    n_pos = -(-pa // g)
    Wp = -(-(L - g) // 16)
    trim = min((1 if s >= 16 else 0) + (1 if s == 32 else 0), Wp)
    return JoinGeometry(g, n_pos, g + n_pos, pa, Wp, trim)


def build_seed_rows(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    s: int,
    geo: JoinGeometry,
    id_base: int | jnp.ndarray = 0,
    lengths: jnp.ndarray | None = None,
):
    """Seed rows of the fused join for a (local) read block.

    Returns (k_hi, k_lo, packed, payload): (M, R) exact seed keys /
    tagged ids and (M, R, Wt+2) word payload. The join sorts on the
    EXACT (k_hi, k_lo) key (not a hash): collision-free grouping, and
    the words the unmasked key covers are trimmed from the payload
    (geo.trim; see _row_payload). Invalid rows carry the all-ones key
    AND the all-ones packed sentinel — a REAL all-T seed keeps its key
    and stays distinguishable by its packed id, so poly-T reads join
    exactly. ``id_base``: global index of row 0 of ``reads2`` — the
    sharded path numbers rows globally so candidate decode (id // R)
    yields global read ids after routing. ``lengths``: per-read lengths
    for ragged inputs (None => every read is L); a row is valid only
    when its whole seed lies inside the read.
    """
    M, L = reads2.shape
    g, n_pos, R, pa, Wp, trim = geo
    positions = list(range(g)) + [g * (j + 1) for j in range(n_pos)]
    if lengths is None:
        lengths = jnp.full((M,), L, jnp.int32)
    shifted = shifted_word_packs(reads2)
    payload = _row_payload(
        shifted, positions, g, L, Wp, lengths, trim
    )                                              # (M, R, Wt+2)
    k_hi, k_lo = seed_keys_at_positions(shifted, s, positions, L)
    pos_arr = jnp.asarray(positions, jnp.int32)
    rv = valid2[:, None] & (
        pos_arr[None, :] + s <= lengths[:, None]
    )
    k_hi = jnp.where(rv, k_hi, _U32_MAX)
    k_lo = jnp.where(rv, k_lo, _U32_MAX)
    tag = jnp.concatenate(
        [jnp.zeros((M, g), jnp.uint32),
         jnp.full((M, n_pos), 0x80000000, jnp.uint32)], axis=1,
    )
    row0 = jnp.uint32(id_base) * jnp.uint32(R)
    packed = tag | (
        row0 + jnp.arange(M * R, dtype=jnp.uint32).reshape(M, R)
    )
    packed = jnp.where(rv, packed, _U32_MAX)
    return k_hi, k_lo, packed, payload


# Which payload/key builder find_overlaps uses: "shifted" (the original
# (M,16,W) shifted-packs build) or "w0" (register-shift build from the
# unshifted packing — bit-identical, tested). Module-level so the bench
# probe can A/B both; jitted-wrapper caches must be cleared on change
# (scripts/probe_row_builder.py does).
SEED_ROW_BUILDER = "shifted"


def build_seed_rows_w0(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    s: int,
    geo: JoinGeometry,
    id_base: int | jnp.ndarray = 0,
    lengths: jnp.ndarray | None = None,
):
    """build_seed_rows computed from the UNSHIFTED word packing.

    Bit-identical outputs (equality-tested); the difference is cost
    shape: ``shifted_word_packs`` materializes an (M, 16, W) tensor in
    HBM (16x the read bytes written + re-read by the slices) while this
    builds every needed word with two register shifts from the (M, W)
    words0 packing — the same trick the streamed path uses
    (word_at_positions). Round-5 lever from the BASELINE.md round-4
    floor ledger: seed-row build measured 4.9 ms/shard with a ~3 ms
    plausible floor.
    """
    from sage2_tpu.ops.bitpack import pack_read_words

    M, L = reads2.shape
    g, n_pos, R, pa, Wp, trim = geo
    Wt = geo.Wt
    positions = list(range(g)) + [g * (j + 1) for j in range(n_pos)]
    if lengths is None:
        lengths = jnp.full((M,), L, jnp.int32)
    words0 = pack_read_words(reads2)               # (M, W)

    # payload rows: [aw0..aw(Wt-1), xw, len] per position (see
    # _row_payload for the column contract)
    lcol = lengths.astype(jnp.uint32)[:, None]
    w00 = words0[:, 0]
    rows = []
    for i, pos in enumerate(positions):
        aw = jnp.stack(
            word_at_positions(
                words0, [pos + 16 * (trim + t) for t in range(Wt)], L
            ),
            axis=1,
        )
        if i < g:
            xw = w00                               # B side: bases [0,16)
        elif pos < 16:
            xw = w00 >> jnp.uint32(2 * (16 - pos))
        else:
            (xw,) = word_at_positions(words0, [pos - 16], L)
        rows.append(jnp.concatenate([aw, xw[:, None], lcol], axis=1))
    payload = jnp.stack(rows, axis=1)              # (M, R, Wt+2)

    k_hi, k_lo = seed_keys_from_words0(words0, s, positions, L)
    pos_arr = jnp.asarray(positions, jnp.int32)
    rv = valid2[:, None] & (
        pos_arr[None, :] + s <= lengths[:, None]
    )
    k_hi = jnp.where(rv, k_hi, _U32_MAX)
    k_lo = jnp.where(rv, k_lo, _U32_MAX)
    tag = jnp.concatenate(
        [jnp.zeros((M, g), jnp.uint32),
         jnp.full((M, n_pos), 0x80000000, jnp.uint32)], axis=1,
    )
    row0 = jnp.uint32(id_base) * jnp.uint32(R)
    packed = tag | (
        row0 + jnp.arange(M * R, dtype=jnp.uint32).reshape(M, R)
    )
    packed = jnp.where(rv, packed, _U32_MAX)
    return k_hi, k_lo, packed, payload


def find_overlaps(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
    capacity: int = 1 << 20,
    stride: int | None = None,
    lengths: jnp.ndarray | None = None,
    defer_dup_compact: bool = False,
) -> OverlapResult:
    """Detect all maximal proper exact suffix-prefix overlaps >= min_overlap.

    reads2: (M, L) RC-augmented codes; valid2: (M,) row mask.
    Matches sage2_tpu.refmodel.oracle.oracle_overlaps on the valid rows.

    Fused sort-join design (round 2; the benchmark chip charges a large
    fixed floor per sort/gather/scatter dispatch while prefix scans are
    nearly free — scripts/probe_op_floor.py — so the kernel is built
    from ONE combined sort, scan-based run accounting, one monotone
    3-column scatter+cummax expansion, and exactly three row gathers):

      * Every read contributes g + n_pos seed rows: ENTRY rows at prefix
        offsets o in [0, g) and QUERY rows at probe positions
        p in {g, 2g, ...} (the round-1 strided schedule, unchanged and
        lossless: a hit (a, p) x (b, o) implies overlap start p0 = p - o,
        and every true p0 has exactly one such (p, o) with o < g).
      * One 2-operand sort groups all rows by a 32-bit seed-key hash
        (entries before queries within a run via the id's tag bit).
      * Prefix scans give each query its run's entry range; candidate
        expansion scatters (query pos, start, entry base) — all three
        monotone — at candidate starts and forward-fills with one
        3-column cummax, so no per-candidate decode gather is needed.
      * One payload pregather puts each row's suffix words (anchored at
        its OWN seed position) next to its id; two candidate row gathers
        (query side, entry side) then feed a purely elementwise verify:
        both sides' words are pre-aligned to the same genome coordinate,
        eliminating the round-1 register word-shift select, and the o
        bases of B preceding the anchor are checked against the query's
        pw word.
      * One 2-operand sort orders/dedups the edge list; the rare
        duplicate-(src,dst) compaction re-sort runs under lax.cond only
        when a duplicate actually exists.
    """
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    if min_overlap >= L:
        raise ValueError(f"min_overlap ({min_overlap}) must be < read len ({L})")

    geo = join_geometry(L, min_overlap, s, stride)
    N = M * geo.R
    C = capacity
    if N >= (1 << 31) - 1:
        raise ValueError(f"seed rows {N} overflow 31-bit row ids")

    builder = (build_seed_rows_w0 if SEED_ROW_BUILDER == "w0"
               else build_seed_rows)
    k_hi, k_lo, packed, payload = builder(
        reads2, valid2, s, geo, lengths=lengths
    )
    ok, ok_cont, cand_a, cand_b, ovl, total = fused_join_core(
        k_hi.reshape(-1), k_lo.reshape(-1), packed.reshape(-1),
        payload.reshape(N, geo.Wt + 2), geo, L, C, min_overlap,
        ids_are_positions=True,
    )
    overflow = total > C

    if lengths is not None:
        # containment marks (ragged inputs only)
        contained = (
            jnp.zeros(M + 1, bool)
            .at[jnp.where(ok_cont, cand_b, M)]
            .set(True, mode="drop")[:M]
        )
        n_contained = jnp.sum(contained.astype(jnp.int32))
    else:
        # fixed-length: ok_contained is identically False (len_b == L
        # and ovl = L - p0 < L for p0 >= 1), so skip the C-sized
        # scatter — it measured ~5-7 ms/shard on the bench chip
        contained = jnp.zeros(M, bool)
        n_contained = jnp.zeros((), jnp.int32)

    # --- one-sort reduction (cond re-sort only on real duplicates) ------
    k_src, k_dst, k_ovl, n_edges, n_dups = _reduce_fused(
        ok, cand_a, cand_b, ovl, L, M,
        defer_dup_compact=defer_dup_compact,
    )
    n_verified = jnp.sum(ok.astype(jnp.int32))
    return OverlapResult(
        k_src, k_dst, k_ovl, n_edges, total, n_verified, overflow,
        contained, n_contained, n_dups,
    )


def fused_join_core(
    k_hi: jnp.ndarray,
    k_lo: jnp.ndarray,
    packed: jnp.ndarray,
    payrows: jnp.ndarray,
    geo: JoinGeometry,
    L: int,
    C: int,
    min_overlap: int | None = None,
    ids_are_positions: bool = False,
):
    """The fused sort-join + expansion + verify, on pre-built seed rows.

    k_hi, k_lo: (N,) EXACT seed keys (invalid rows forced to all-ones);
    packed: (N,) tag-bit | row id, all-ones sentinel on invalid rows
    (id = read*R + t, reads may be globally numbered — the sharded path
    feeds rows received from other devices); payrows: (N, Wt+2)
    suffix/prev word payload + read length, indexed by POSITION (not
    id). The sort groups by the full key (3 operands): collision-free
    runs, and the key-covered leading words (geo.trim) are already
    absent from the payload — equal within a run by construction, so
    neither gather ships them nor the verify compares them (round-4:
    gather cost scales with row width). ``ids_are_positions``: the
    local path (id_base=0, one contiguous block) sets this so the
    payload position is recovered from the id itself instead of
    carrying an iota value operand through the sort. Returns
    (ok_edge, ok_contained, cand_a, cand_b, ovl, total): one entry per
    candidate slot in [0, C). ok_edge marks verified proper dovetails
    (v = lenA - p0 in [min_overlap, lenB)); ok_contained marks verified
    full containments of B inside A (lenB <= lenA - p0). For
    fixed-length inputs ok_contained is identically False.
    """
    g, n_pos, R, pa, Wp, trim = geo
    Wt = geo.Wt
    if min_overlap is None:
        min_overlap = L - pa
    N = k_hi.shape[0]

    # --- one combined sort (full key: exact, collision-free runs) -------
    if ids_are_positions:
        # local path: flat row index == (packed & 0x7FFFFFFF) for live
        # rows, so the payload stays position-addressable without an
        # iota value operand (sort cost scales with operand count)
        s_hi, s_lo, s_packed = sort_by_keys([k_hi, k_lo, packed])
        s_pos = (s_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    else:
        # sharded path: ids are global, an iota value operand carries the
        # local payload position through the sort
        s_hi, s_lo, s_packed, s_pos = sort_by_keys(
            [k_hi, k_lo, packed], [jnp.arange(N, dtype=jnp.int32)]
        )

    # --- scan-based run accounting --------------------------------------
    # Entries sort strictly BEFORE queries within a run (the packed tag
    # bit is the last sort operand), so a query's candidate count is
    # simply (first-query index of its run) - (run start): ONE 2-column
    # cummax recovers both, replacing the previous
    # cumsum(is_entry) + 2-column cummax formulation (round-5 scan-block
    # cut; the BASELINE.md round-4 ledger put the scan block at
    # 9.4 ms/shard with a ~3-4 ms floor).
    iota_n = jnp.arange(N, dtype=jnp.int32)
    prev_hi = jnp.concatenate([s_hi[:1], s_hi[:-1]])
    prev_lo = jnp.concatenate([s_lo[:1], s_lo[:-1]])
    is_head = (iota_n == 0) | (s_hi != prev_hi) | (s_lo != prev_lo)
    # the packed sentinel (not the key) marks dead rows: a REAL all-T
    # seed shares the all-ones key but keeps a live id < 0x7FFFFFFF
    live = s_packed != _U32_MAX
    is_query = ((s_packed >> 31) == 1) & live
    prev_q = jnp.concatenate([jnp.zeros(1, bool), is_query[:-1]])
    first_q = is_query & (is_head | ~prev_q)
    fill = jax.lax.cummax(
        jnp.stack(
            [jnp.where(is_head, iota_n, 0),
             jnp.where(first_q, iota_n, 0)], axis=1
        ), axis=0,
    )
    run_start, q_start = fill[:, 0], fill[:, 1]
    counts = jnp.where(is_query, q_start - run_start, 0)
    offsets = jnp.cumsum(counts)
    total = offsets[-1]
    starts = offsets - counts

    # payload pregather: each sorted row's id, suffix/prev words, and its
    # run_start + start — the latter two ride as TRAILING columns so the
    # entry-side gather below reads a narrower prefix view (wide scatters
    # are disproportionately expensive on this device; gather cost grows
    # with row width)
    pays = jnp.concatenate(
        [s_packed[:, None], payrows[s_pos],
         run_start[:, None].astype(jnp.uint32),
         starts[:, None].astype(jnp.uint32)], axis=1
    )                                              # (N, Wt+5)

    # --- expansion: one 1-col monotone scatter + cummax -----------------
    # candidate starts are unique, so a plain dropped set suffices (and
    # is measurably cheaper than scatter-max on this device)
    sidx = jnp.where((counts > 0) & (starts < C), starts, C)
    grid = (
        jnp.full(C + 1, -1, jnp.int32)
        .at[sidx].set(iota_n, mode="drop")[:C]
    )
    qpos = jax.lax.cummax(grid)
    iota_c = jnp.arange(C, dtype=jnp.int32)
    slot_valid = (qpos >= 0) & (iota_c < total)

    # --- two candidate row gathers + elementwise verify -----------------
    pay_a = pays[jnp.clip(qpos, 0, N - 1)]
    rank = iota_c - pay_a[:, Wt + 4].astype(jnp.int32)
    bslot = jnp.clip(
        pay_a[:, Wt + 3].astype(jnp.int32) + rank, 0, N - 1
    )
    # entry side: narrow view without the run_start/starts admin columns
    pay_b = pays[:, : Wt + 3][bslot]
    qid = (pay_a[:, 0] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    eid = (pay_b[:, 0] & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    cand_a = qid // R
    p = (qid % R - g + 1) * g
    cand_b = eid // R
    o = eid % R
    p0 = p - o
    len_a = pay_a[:, Wt + 2].astype(jnp.int32)
    len_b = pay_b[:, Wt + 2].astype(jnp.int32)
    ovl = len_a - p0                               # dovetail length v
    cand_valid = slot_valid & (cand_a != cand_b)

    aq = pay_a[:, 1 : 1 + Wt]
    bo = pay_b[:, 1 : 1 + Wt]
    diff = aq ^ bo
    # compare from anchor p: min(lenA - p, lenB - o) bases — everything
    # beyond either read's end is masked, so pad bases never compare;
    # the first `trim` words (the seed) are equal by key-sort
    # construction and absent here
    lc2 = jnp.minimum(len_a - p, len_b - o) * 2
    t16 = (jnp.arange(Wt, dtype=jnp.int32)[None, :] + trim) * 32
    vb = jnp.clip(lc2[:, None] - t16, 0, 32)
    shift = jnp.clip(32 - vb, 0, 31).astype(jnp.uint32)
    ok_word = jnp.where(vb == 0, True, (diff >> shift) == 0)
    # prefix: A[p0:p] (low 2o bits of the query's pw) == B[0:o]
    apw = pay_a[:, 1 + Wt]
    b0w = pay_b[:, 1 + Wt]
    o2 = (2 * o).astype(jnp.uint32)
    lhs = apw & ((jnp.uint32(1) << o2) - 1)
    rhs = jnp.where(
        o == 0, jnp.uint32(0),
        b0w >> jnp.clip(32 - 2 * o, 0, 31).astype(jnp.uint32),
    )
    match = jnp.all(ok_word, axis=1) & (lhs == rhs) & cand_valid
    ok_edge = match & (ovl < len_b) & (ovl >= min_overlap)
    ok_contained = match & (len_b <= ovl)
    return ok_edge, ok_contained, cand_a, cand_b, ovl, total


def _reduce_fused(
    ok: jnp.ndarray,
    cand_a: jnp.ndarray,
    cand_b: jnp.ndarray,
    cand_ovl: jnp.ndarray,
    read_len: int,
    max_vertex: int,
    defer_dup_compact: bool = False,
):
    """Longest-overlap-per-(src,dst) reduction with a cond-gated second
    sort: the compaction re-sort is needed only when some (src, dst)
    pair verified at MULTIPLE overlap lengths (possible only for
    periodic reads — essentially never on real data), so it runs under
    lax.cond and the common path costs a single 2-operand sort.

    ``defer_dup_compact``: skip the cond entirely and hand ``n_dups``
    to the caller, who compacts on the rare nonzero flag
    (compact_reduced_edges). Inside lax.scan XLA lowers lax.cond to a
    select — BOTH branches execute every iteration — so the stacked
    path pays the second sort unconditionally unless deferred
    (measured ~10 ms/shard, scripts/probe_stacked_full.py).

    Returns (src, dst, ovl, n_edges, n_dups); output contract otherwise
    identical to reduce_edge_candidates. When n_dups > 0 under
    deferral, dup rows are still present (sorted; each group's LAST row
    is the keeper) and n_edges already counts keepers only.
    """
    ov_bits = int(read_len).bit_length()
    if max_vertex >= (1 << (31 - ov_bits)):
        k_src, k_dst, k_ovl, n_edges = reduce_edge_candidates(
            ok, cand_a, cand_b, cand_ovl, read_len, max_vertex
        )
        return k_src, k_dst, k_ovl, n_edges, jnp.zeros((), jnp.int32)
    packed = (cand_b << ov_bits) | cand_ovl
    e_src = jnp.where(ok, cand_a, _I32_MAX)
    e_pk = jnp.where(ok, packed, _I32_MAX)
    e_src, e_pk = sort_by_keys([e_src, e_pk])
    e_dst = e_pk >> ov_bits
    nxt_src = jnp.concatenate([e_src[1:], jnp.full((1,), _I32_MAX)])
    nxt_dst = jnp.concatenate([e_dst[1:], jnp.full((1,), _I32_MAX)])
    is_last = (e_src != nxt_src) | (e_dst != nxt_dst)
    valid = e_src != _I32_MAX
    keep = is_last & valid
    n_edges = jnp.sum(keep.astype(jnp.int32))
    n_dups = jnp.sum(valid.astype(jnp.int32)) - n_edges

    if defer_dup_compact:
        pad = e_src == _I32_MAX
        k_dst = jnp.where(pad, _I32_MAX, e_dst)
        k_ovl = jnp.where(pad, 0, e_pk & ((1 << ov_bits) - 1))
        return e_src, k_dst, k_ovl, n_edges, n_dups

    def with_dups():
        k_src = jnp.where(keep, e_src, _I32_MAX)
        k_pk = jnp.where(keep, e_pk, _I32_MAX)
        return tuple(sort_by_keys([k_src, k_pk]))

    def no_dups():
        return e_src, e_pk

    k_src, k_pk = jax.lax.cond(n_dups > 0, with_dups, no_dups)
    pad = k_src == _I32_MAX
    k_dst = jnp.where(pad, _I32_MAX, k_pk >> ov_bits)
    k_ovl = jnp.where(pad, 0, k_pk & ((1 << ov_bits) - 1))
    return k_src, k_dst, k_ovl, n_edges, n_dups


def compact_reduced_edges(src, dst, ovl, read_len: int):
    """Compaction fix-up for a defer_dup_compact edge list with
    n_dups > 0: drop every non-last row of each (src, dst) group (the
    last holds the longest overlap). One host-side numpy pass — this
    runs only for periodic-read inputs."""
    import numpy as np

    src = np.asarray(src)
    dst = np.asarray(dst)
    ovl = np.asarray(ovl)
    nxt_same = np.zeros(src.shape[0], bool)
    nxt_same[:-1] = (src[:-1] == src[1:]) & (dst[:-1] == dst[1:])
    keep = ~nxt_same
    pad_to = src.shape[0]
    k_src = np.full(pad_to, 2**31 - 1, np.int32)
    k_dst = np.full(pad_to, 2**31 - 1, np.int32)
    k_ovl = np.zeros(pad_to, np.int32)
    kept = int(((src != 2**31 - 1) & keep).sum())
    sel = keep & (src != 2**31 - 1)
    k_src[:kept] = src[sel]
    k_dst[:kept] = dst[sel]
    k_ovl[:kept] = ovl[sel]
    return k_src, k_dst, k_ovl


@functools.lru_cache(maxsize=16)
def _jitted_find_stacked(min_overlap: int, seed_len: int, capacity: int,
                         stride: int | None):
    def body(carry, rv):
        r, v = rv
        res = find_overlaps(r, v, min_overlap, seed_len, capacity,
                            stride, defer_dup_compact=True)
        return carry, (res.src, res.dst, res.ovl, res.n_edges,
                       res.n_candidates, res.n_verified, res.overflow,
                       res.n_dups)

    def run(reads3, valid3):
        _, out = jax.lax.scan(body, 0, (reads3, valid3))
        return out

    return jax.jit(run)


def find_overlaps_stacked(
    reads3: jnp.ndarray,
    valid3: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
    capacity: int = 1 << 20,
    stride: int | None = None,
):
    """K independent read shards through the fused join in ONE jit call.

    ``reads3``: (K, M, L) stacked shards; ``valid3``: (K, M). Runs the
    exact find_overlaps program K times under a lax.scan, so the
    per-dispatch fixed floor (jit call + relay round trip on the bench
    chip; SURVEY.md §3.3 north star) is paid ONCE for the whole stack —
    steady-state production shape: amortized per-shard cost is the
    kernel's marginal work only.

    The duplicate-(src,dst) compaction is DEFERRED out of the scan:
    under lax.scan XLA lowers lax.cond to a select that executes both
    branches, so the in-kernel cond would pay its second sort on every
    shard (~10 ms, probe_stacked_full). The scan emits per-shard
    ``n_dups`` instead and this wrapper lazily returns edge arrays; the
    caller must either check n_dups == 0 (bench does, outside its timed
    loop — duplicates need periodic reads) or call
    ``compact_stacked_result`` which fixes up any flagged shard on
    host. Returns stacked per-shard (src, dst, ovl, n_edges,
    n_candidates, n_verified, overflow, n_dups); with n_dups == 0 each
    shard's outputs are bit-identical to find_overlaps on that shard
    (asserted in tests and bench.py).
    """
    fn = _jitted_find_stacked(min_overlap, seed_len, capacity, stride)
    return fn(reads3, valid3)


def compact_stacked_result(out, read_len: int):
    """Host fix-up for find_overlaps_stacked: compact any shard whose
    n_dups > 0. Returns (src, dst, ovl) host arrays."""
    import numpy as np

    src = np.array(out[0])
    dst = np.array(out[1])
    ovl = np.array(out[2])
    dups = np.asarray(out[7])
    for k in np.flatnonzero(dups):
        src[k], dst[k], ovl[k] = compact_reduced_edges(
            src[k], dst[k], ovl[k], read_len
        )
    return src, dst, ovl


@functools.lru_cache(maxsize=64)
def _jitted_find(min_overlap: int, seed_len: int, capacity: int,
                 stride: int | None, ragged: bool):
    if ragged:
        return jax.jit(
            lambda r, v, ln: find_overlaps(
                r, v, min_overlap, seed_len, capacity, stride, lengths=ln
            )
        )
    return jax.jit(
        lambda r, v: find_overlaps(r, v, min_overlap, seed_len, capacity,
                                   stride)
    )


def find_overlaps_auto(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
    min_capacity: int = 1 << 14,
    stride: int | None = None,
    lengths: jnp.ndarray | None = None,
    validate: bool = True,
) -> OverlapResult:
    """Single-pass overlap detection with self-sizing candidate capacity.

    Starts from a coverage-scale heuristic (16 candidates/read, 64k
    granularity — a power-of-two bucket can double every
    capacity-proportional stage for a 1% overshoot); on overflow,
    retries once at the kernel's own exact n_candidates. Steady state is
    ONE kernel invocation — a separate exact-count phase would duplicate
    the join, which is half the stage's cost.

    ``validate=False``: when a memoized capacity already exists for this
    problem shape, dispatch the kernel and skip the host readback of
    ``n_candidates`` (a device->host scalar fetch costs a full relay
    round trip, ~22 ms on the bench chip, vs microseconds on real
    hardware). The memo is keyed by problem SHAPE only, so a same-shape
    but denser input could overflow the memoized capacity — to remove
    that footgun at zero steady-state cost, the FIRST validate=False
    dispatch per memoized capacity still pays one readback and, on
    overflow, transparently re-enters the sizing loop; only subsequent
    dispatches skip the check. Callers that swap inputs more often than
    shapes should still check ``res.overflow`` or set
    SAGE2_VALIDATE_OVERFLOW=1 (asserts on every call; debug).
    """
    M = reads2.shape[0]
    grain = 1 << 16

    def round_up(n):
        return max(min_capacity, -(-int(n) // grain) * grain)

    # remember the resolved capacity per problem shape so repeated calls
    # (benchmarks, multi-batch pipelines) skip the overflow discovery run
    memo_key = (M, reads2.shape[1], min_overlap, seed_len, stride,
                lengths is not None)
    memo = _CAP_MEMO.get(memo_key)
    if not validate and memo is not None:
        memo_cap, steady_validated = memo
        fn = _jitted_find(min_overlap, seed_len, memo_cap, stride,
                          lengths is not None)
        res = fn(reads2, valid2, lengths) if lengths is not None else (
            fn(reads2, valid2)
        )
        if not steady_validated:
            # first steady-state dispatch after memoization: one
            # readback confirms the capacity for the caller's actual
            # inputs; on overflow fall through to the sizing loop
            if not bool(jax.device_get(res.overflow)):
                memo[1] = True
                return res
        else:
            if os.environ.get("SAGE2_VALIDATE_OVERFLOW"):
                assert not bool(res.overflow), (
                    "find_overlaps_auto(validate=False): memoized "
                    f"capacity {memo_cap} overflowed on a denser "
                    "same-shape input"
                )
            return res
    cap = (memo[0] if memo else None) or round_up(16 * M)
    while True:
        fn = _jitted_find(min_overlap, seed_len, cap, stride,
                          lengths is not None)
        res = fn(reads2, valid2, lengths) if lengths is not None else (
            fn(reads2, valid2)
        )
        # ONE batched readback: every separate device->host scalar fetch
        # costs a full relay round trip (~22 ms measured), so overflow is
        # derived host-side from the single n_candidates value
        n_cand = int(jax.device_get(res.n_candidates))
        if n_cand <= cap:
            # memoize a TIGHT capacity: every candidate-proportional op
            # (expansion grid, cummax, both row gathers, verify, reduce
            # sort) scales with the static capacity, so steady-state
            # callers should run at ~n_candidates, not the discovery size
            new_cap = round_up(n_cand * 1.05)
            if memo is not None and memo[0] == new_cap:
                memo[1] = True      # this run just validated it
            else:
                _memo_put(memo_key, [new_cap, False])
            return res
        cap = max(round_up(n_cand * 1.05), cap + grain)
