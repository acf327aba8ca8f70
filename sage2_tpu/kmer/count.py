"""Exact canonical k-mer counting.

TPU design (SURVEY.md §7 step 2): extract canonical (hi, lo) keys for every
k-mer of every read, sort the key pairs, and segment-count runs of equal
keys. This replaces the reference's hash-table counter (SURVEY.md §2
"k-mer counter": sparsehash / Jellyfish-2 in C++) with a deterministic,
vector-unit-friendly sort-reduce; counts are exact, not approximate.

The resulting table is kept sorted so that all downstream probes (the
spectrum corrector's per-base queries, coverage estimation) are
lexicographic binary searches instead of hash probes.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import lex_searchsorted, sort_by_keys, unique_sorted_pairs

# Sentinel key for padding slots: strictly greater than any real k-mer key
# for k <= 31 (hi < 2**30), so padded tables stay sorted.
SENTINEL = jnp.uint32(0xFFFFFFFF)


class KmerTable(NamedTuple):
    """Sorted canonical k-mer count table (device arrays, static capacity).

    hi, lo: uint32 keys, lexicographically sorted; slots >= n_unique hold
    (SENTINEL, SENTINEL). count: int32 per-slot counts (0 in padding).
    """

    hi: jnp.ndarray
    lo: jnp.ndarray
    count: jnp.ndarray
    n_unique: jnp.ndarray  # scalar int32
    k: int


def _count_impl(reads: jnp.ndarray, k: int, lengths=None):
    hi, lo = bitpack.canonical_kmer_keys(reads, k)
    valid = None
    if lengths is not None:
        P = reads.shape[-1] - k + 1
        valid = (
            jnp.arange(P)[None, :] < (lengths[:, None] - (k - 1))
        ).reshape(-1)
    t = count_from_keys(hi.reshape(-1), lo.reshape(-1), k, valid=valid)
    return t.hi, t.lo, t.count, t.n_unique


_count_jit = jax.jit(_count_impl, static_argnums=1)


def count_kmers(
    reads: jnp.ndarray, k: int, lengths: jnp.ndarray | None = None
) -> KmerTable:
    """Count canonical k-mers of reads (N, L).

    ``lengths``: per-read lengths for ragged (0-padded) inputs — windows
    past a read's end are masked out. Table capacity is the total k-mer
    occurrence count N*(L-k+1) — the worst case where every k-mer is
    unique. Jitted per (shape, k); the static ``k`` field stays outside
    the jit boundary.
    """
    return KmerTable(*_count_jit(reads, k, lengths), k)


def count_from_keys(hi: jnp.ndarray, lo: jnp.ndarray, k: int,
                    valid: jnp.ndarray | None = None) -> KmerTable:
    """Build a sorted count table from raw (possibly masked) canonical keys."""
    if valid is not None:
        hi = jnp.where(valid, hi, SENTINEL)
        lo = jnp.where(valid, lo, SENTINEL)
    n = hi.shape[0]
    s_hi, s_lo = sort_by_keys([hi, lo])
    is_valid = ~((s_hi == SENTINEL) & (s_lo == SENTINEL))
    is_head, group_id = unique_sorted_pairs(s_hi, s_lo, is_valid)
    n_unique = jnp.sum(is_head.astype(jnp.int32))
    # Scatter group heads to the front of the table; non-heads target the
    # out-of-bounds slot n and are dropped.
    slot = jnp.where(is_head, jnp.cumsum(is_head.astype(jnp.int32)) - 1, n)
    out_hi = jnp.full((n,), SENTINEL).at[slot].set(s_hi, mode="drop")
    out_lo = jnp.full((n,), SENTINEL).at[slot].set(s_lo, mode="drop")
    counts = jax.ops.segment_sum(
        is_valid.astype(jnp.int32),
        jnp.minimum(jnp.where(is_valid, group_id, n - 1), n - 1),
        num_segments=n,
    )
    counts = jnp.where(jnp.arange(n) < n_unique, counts, 0)
    return KmerTable(out_hi, out_lo, counts.astype(jnp.int32), n_unique, k)


def lookup_counts(table: KmerTable, q_hi: jnp.ndarray, q_lo: jnp.ndarray):
    """Counts of canonical query keys (0 where absent). Any query shape.

    Implemented as ONE sort-join of table entries and queries instead of
    a per-query lexicographic binary search: the search cost log2(T)
    table gathers PER QUERY (the corrector probes 4 variants per window,
    SURVEY.md §3.2 HOT LOOP) versus one combined sort plus one gather
    and one scatter per element here — ~7x faster at E. coli scale on
    the bench device, and the same trick the round-2 overlap join uses.
    """
    shape = q_hi.shape
    qh = q_hi.reshape(-1)
    ql = q_lo.reshape(-1)
    Q = qh.shape[0]
    T = table.hi.shape[0]
    n = T + Q
    if n >= 1 << 31:
        raise ValueError(f"lookup too large: {n} rows")
    # tag bit: entries (0) sort before queries (1) within a key run
    packed = jnp.concatenate([
        jnp.arange(T, dtype=jnp.uint32),
        jnp.uint32(0x80000000) | jnp.arange(Q, dtype=jnp.uint32),
    ])
    cnts = jnp.concatenate([
        table.count.astype(jnp.uint32), jnp.zeros(Q, jnp.uint32)
    ])
    s_hi, s_lo, s_packed, s_cnt = sort_by_keys(
        [jnp.concatenate([table.hi, qh]),
         jnp.concatenate([table.lo, ql]), packed], [cnts],
    )
    iota = jnp.arange(n, dtype=jnp.int32)
    prev_hi = jnp.concatenate([s_hi[:1], s_hi[:-1]])
    prev_lo = jnp.concatenate([s_lo[:1], s_lo[:-1]])
    is_head = (iota == 0) | (s_hi != prev_hi) | (s_lo != prev_lo)
    run_start = jax.lax.cummax(jnp.where(is_head, iota, 0))
    head = jnp.stack([s_packed, s_cnt], axis=1)[run_start]
    found = (head[:, 0] >> 31) == 0       # run begins with a table entry
    ans = jnp.where(found, head[:, 1], 0).astype(jnp.int32)
    is_query = (s_packed >> 31) == 1
    qidx = jnp.where(
        is_query, (s_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32), Q
    )
    out = jnp.zeros(Q + 1, jnp.int32).at[qidx].set(ans, mode="drop")[:Q]
    return out.reshape(shape)
