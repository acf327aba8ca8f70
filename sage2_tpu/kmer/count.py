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


def count_kmers(reads: jnp.ndarray, k: int) -> KmerTable:
    """Count canonical k-mers of fixed-length reads (N, L).

    Table capacity is the total k-mer occurrence count N*(L-k+1) — the
    worst case where every k-mer is unique.
    """
    hi, lo = bitpack.canonical_kmer_keys(reads, k)
    return count_from_keys(hi.reshape(-1), lo.reshape(-1), k)


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
    """Counts of canonical query keys (0 where absent). Any query shape."""
    pos = lex_searchsorted(table.hi, table.lo, q_hi, q_lo, side="left")
    pos_c = jnp.minimum(pos, table.hi.shape[0] - 1)
    found = (table.hi[pos_c] == q_hi) & (table.lo[pos_c] == q_lo)
    return jnp.where(found, table.count[pos_c], 0)
