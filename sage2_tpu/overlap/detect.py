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
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp

from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import (
    expand_by_counts,
    expand_with_payload,
    lex_searchsorted,
    sort_by_keys,
)

_U32_MAX = jnp.uint32(0xFFFFFFFF)
_I32_MAX = jnp.int32(2**31 - 1)

# last successful candidate capacity per (M, L, min_overlap, seed_len)
_CAP_MEMO: dict = {}


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


def find_overlaps(
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int = 32,
    capacity: int = 1 << 20,
    stride: int | None = None,
) -> OverlapResult:
    """Detect all maximal proper exact suffix-prefix overlaps >= min_overlap.

    reads2: (M, L) RC-augmented codes; valid2: (M,) row mask.
    Matches sage2_tpu.refmodel.oracle.oracle_overlaps on the valid rows.

    Strided probe schedule (the device is random-access-bound at
    ~1e8 ops/s, so probe count dominates stage cost): instead of one
    B-prefix seed per read probed at every A position p in [1, pa]
    (M*pa probes), the B table holds g seeds per read (prefix offsets
    o in [0, g)) and A probes only p in {g, 2g, ...} (M*ceil(pa/g)
    probes). A hit (a, p) x (b, o) implies overlap start p0 = p - o.
    Lossless: every true p0 has exactly one (p, o) = (g*ceil(p0/g),
    p - p0) with o < g <= min_overlap - s + 1, so the offset seed is a
    within-overlap exact substring.
    """
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    if min_overlap >= L:
        raise ValueError(f"min_overlap ({min_overlap}) must be < read len ({L})")

    pa = L - min_overlap                           # overlap starts 1..pa
    g = auto_stride(min_overlap, s, pa) if stride is None else stride
    if not 1 <= g <= min(16, min_overlap - s + 1):
        raise ValueError(f"stride {g} invalid for min_overlap={min_overlap}, "
                         f"seed={s}")
    n_pos = -(-pa // g)                            # A probes at g*(j+1)

    # --- 1+2. B offset-seed table + inverted bucket join ---------------
    shifted = shifted_word_packs(reads2)
    b_hi, b_lo = seed_keys_at_positions(shifted, s, list(range(g)), L)
    a_hi, a_lo = seed_keys_at_positions(
        shifted, s, [g * (j + 1) for j in range(n_pos)], L
    )
    # B entry id e = b*g + o (row-major flatten of the (M, g) seed grid)
    b_valid = jnp.repeat(valid2, g) if g > 1 else valid2
    b_entry, lo_idx, counts = _prefix_join_parts(
        b_hi.reshape(-1), b_lo.reshape(-1), b_valid,
        a_hi, a_lo, valid2, seed_bits=2 * s,
    )
    n_candidates = jnp.sum(counts)
    overflow = n_candidates > capacity

    # slot slab: [entry id | owner read's prefix words] per sorted slot,
    # so each candidate's entry decode AND B-side verification words cost
    # ONE row gather (vs separate entry + words0 gathers; random-access
    # op count dominates, SURVEY.md §9). Build cost: Mg row gathers,
    # amortized over ~candidates >> Mg.
    words0 = shifted[:, 0, :]
    slab = jnp.concatenate(
        [b_entry[:, None].astype(jnp.uint32),
         words0[jnp.minimum(b_entry // g, M - 1)]],
        axis=1,
    )

    entry, rank, lo_of_entry, cand_valid = expand_with_payload(
        counts.reshape(-1), lo_idx.reshape(-1), capacity
    )
    cand_a = entry // n_pos
    cand_p = (entry % n_pos + 1) * g               # probe position
    b_slot = jnp.minimum(lo_of_entry + rank, M * g - 1)
    row = slab[b_slot]
    e_b = row[:, 0].astype(jnp.int32)
    b_words = row[:, 1:]
    cand_b = e_b // g
    cand_p0 = cand_p - (e_b - cand_b * g)          # overlap start p - o
    cand_valid = cand_valid & (cand_a != cand_b) & (cand_p0 <= pa)
    cand_p0 = jnp.clip(cand_p0, 1, pa)

    # --- 3. exact extension --------------------------------------------
    ovl = L - cand_p0
    ok = verify_candidates(
        reads2, cand_a, cand_p0, cand_b,
        shifted=shifted, words0=words0, max_p=pa, b_words=b_words,
    ) & cand_valid

    # --- 4. longest-overlap reduction per (src, dst) -------------------
    k_src, k_dst, k_ovl, n_edges = reduce_edge_candidates(
        ok, cand_a, cand_b, ovl, L, M
    )
    n_verified = jnp.sum(ok.astype(jnp.int32))
    return OverlapResult(
        k_src, k_dst, k_ovl, n_edges, n_candidates, n_verified, overflow
    )


@functools.lru_cache(maxsize=64)
def _jitted_find(min_overlap: int, seed_len: int, capacity: int,
                 stride: int | None):
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
) -> OverlapResult:
    """Single-pass overlap detection with self-sizing candidate capacity.

    Starts from a coverage-scale heuristic (16 candidates/read, 64k
    granularity — a power-of-two bucket can double every
    capacity-proportional stage for a 1% overshoot); on overflow,
    retries once at the kernel's own exact n_candidates. Steady state is
    ONE kernel invocation — a separate exact-count phase would duplicate
    the join, which is half the stage's cost.
    """
    M = reads2.shape[0]
    grain = 1 << 16

    def round_up(n):
        return max(min_capacity, -(-int(n) // grain) * grain)

    # remember the resolved capacity per problem shape so repeated calls
    # (benchmarks, multi-batch pipelines) skip the overflow discovery run
    memo_key = (M, reads2.shape[1], min_overlap, seed_len, stride)
    cap = _CAP_MEMO.get(memo_key) or round_up(16 * M)
    while True:
        res = _jitted_find(min_overlap, seed_len, cap, stride)(reads2, valid2)
        if not bool(res.overflow):
            _CAP_MEMO[memo_key] = cap
            return res
        cap = max(round_up(int(res.n_candidates) * 1.05), cap + grain)
