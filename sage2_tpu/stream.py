"""Chunked (streaming) stage variants for inputs larger than HBM.

SURVEY.md §7 "Datasets larger than HBM": read shards stream host->device
per stage; per-chunk partial results merge through the same sort-reduce
machinery as the in-core paths, so results are bit-identical to the
unchunked functions (tested). The stage-artifact checkpoints double as
the spill mechanism between stages.
"""

from __future__ import annotations

import math
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sage2_tpu.kmer.count import SENTINEL, KmerTable, count_from_keys
from sage2_tpu.kmer.correct import correct_reads
from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import sort_by_keys, unique_sorted_pairs


def _merge_tables(tables: List[KmerTable], k: int) -> KmerTable:
    """Merge sorted per-chunk count tables: concat -> sort -> segment-add."""
    hi = jnp.concatenate([t.hi for t in tables])
    lo = jnp.concatenate([t.lo for t in tables])
    ct = jnp.concatenate([t.count for t in tables])
    n = hi.shape[0]
    s_hi, s_lo, s_ct = sort_by_keys([hi, lo], [ct])
    valid = ~((s_hi == SENTINEL) & (s_lo == SENTINEL))
    is_head, group_id = unique_sorted_pairs(s_hi, s_lo, valid)
    n_unique = jnp.sum(is_head.astype(jnp.int32))
    slot = jnp.where(is_head, jnp.cumsum(is_head.astype(jnp.int32)) - 1, n)
    out_hi = jnp.full((n,), SENTINEL).at[slot].set(s_hi, mode="drop")
    out_lo = jnp.full((n,), SENTINEL).at[slot].set(s_lo, mode="drop")
    counts = jax.ops.segment_sum(
        jnp.where(valid, s_ct, 0),
        jnp.minimum(jnp.where(valid, group_id, n - 1), n - 1),
        num_segments=n,
    )
    counts = jnp.where(jnp.arange(n) < n_unique, counts, 0)
    return KmerTable(out_hi, out_lo, counts.astype(jnp.int32), n_unique, k)


def count_kmers_chunked(
    reads: np.ndarray, k: int, chunk_reads: int
) -> KmerTable:
    """Exact canonical k-mer counting over host-resident reads, streamed
    to the device in chunks of ``chunk_reads``. Device memory is bounded
    by one chunk plus the (unique-key) merged table."""
    N = reads.shape[0]
    table: Optional[KmerTable] = None
    for i in range(0, N, chunk_reads):
        chunk = jnp.asarray(reads[i : i + chunk_reads].astype(np.int32))
        hi, lo = bitpack.canonical_kmer_keys(chunk, k)
        part = count_from_keys(hi.reshape(-1), lo.reshape(-1), k)
        part = _compact(part)
        table = part if table is None else _compact(
            _merge_tables([table, part], k)
        )
    assert table is not None, "no reads"
    return table


def _compact(table: KmerTable) -> KmerTable:
    """Trim a table's padding to the next power of two above n_unique
    (host sync; keeps the running merged table small)."""
    n = int(table.n_unique)
    cap = 1 << max(n, 1).bit_length()
    cap = min(cap, table.hi.shape[0])
    return KmerTable(
        table.hi[:cap], table.lo[:cap], table.count[:cap],
        table.n_unique, table.k,
    )


def correct_reads_chunked(
    reads: np.ndarray,
    k: int,
    threshold: int,
    rounds: int,
    chunk_reads: int,
) -> np.ndarray:
    """Spectrum correction streamed in chunks.

    Matches kmer.correct_reads exactly: each round recounts over ALL
    reads (chunked), then applies both sub-passes per chunk against that
    round's global table. (The in-core path recounts between the forward
    and backward sub-pass only at round boundaries too, and sub-pass
    verdicts depend only on the global table and the chunk's own rows,
    so chunking is exact.)
    """
    out = np.array(reads, dtype=np.int8, copy=True)
    N = out.shape[0]
    for _ in range(rounds):
        table = count_kmers_chunked(out, k, chunk_reads)
        for i in range(0, N, chunk_reads):
            chunk = jnp.asarray(out[i : i + chunk_reads].astype(np.int32))
            corrected = correct_reads(
                chunk, k, threshold, rounds=1, table=table
            )
            out[i : i + chunk_reads] = np.asarray(corrected, dtype=np.int8)
    return out
