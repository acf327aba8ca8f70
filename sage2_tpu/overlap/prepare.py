"""Read deduplication and both-strand augmentation.

SAGE-style string graphs consider both strands: the vertex set is
{each unique read, its reverse complement}. Duplicate reads (including a
read equal to another's reverse complement) are collapsed first, keeping
a multiplicity count that feeds coverage/copy-count estimation
(SURVEY.md §2 "Graph builder" containment removal; with fixed-length
reads, containment degenerates to exact/RC duplicates).

Vertex numbering: for capacity N, vertex i in [0, N) is unique read i
forward; vertex i + N is its reverse complement. rc(v) = (v + N) mod 2N.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import sort_by_keys, words_less


class ReadSet(NamedTuple):
    """Deduplicated, RC-augmented read set (static capacity 2N).

    reads2: (2N, L) codes — row i: unique read i, row i+N: its RC.
    Rows >= n_unique (mod N) are padding.
    valid2: (2N,) bool mask.
    multiplicity: (2N,) int32 — input copies collapsed into each vertex
    (counts orientation-collapsed duplicates; mirrored for RC rows).
    n_unique: scalar int32 (unique canonical reads).
    """

    reads2: jnp.ndarray
    valid2: jnp.ndarray
    multiplicity: jnp.ndarray
    n_unique: jnp.ndarray
    # vertex representing each INPUT read in its own orientation (input
    # read i's sequence == reads2[vertex_of_read[i]]): carries per-read
    # identity (e.g. mate pairing) through dedup
    vertex_of_read: jnp.ndarray = None
    # per-vertex read lengths for ragged inputs (None => fixed length)
    lengths2: jnp.ndarray = None

    @property
    def capacity(self) -> int:
        return self.reads2.shape[0] // 2

    def rc_vertex(self, v):
        n = self.capacity
        return (v + n) % (2 * n)


def revcomp_ragged(reads: jnp.ndarray, lengths: jnp.ndarray) -> jnp.ndarray:
    """Reverse complement of each read's REAL bases, re-padded with 0 at
    the end (padding must already be 0; ragged reads idiom, SURVEY.md §7
    'bucket-by-size + pad-to-tile, with masks')."""
    N, L = reads.shape
    j = jnp.arange(L)[None, :]
    real = j < lengths[:, None]
    idx = jnp.where(real, lengths[:, None] - 1 - j, j)
    vals = jnp.take_along_axis(reads, idx.astype(jnp.int32), axis=1)
    return jnp.where(real, 3 - vals, 0)


def prepare_reads(
    reads: jnp.ndarray, lengths: jnp.ndarray | None = None
) -> ReadSet:
    """Collapse exact/RC duplicate reads and add RC rows.

    The canonical form of a read is lexicographic min(read, revcomp(read))
    on packed words; sorting canonical word keys groups duplicates. The
    group representative keeps the canonical orientation. For ragged
    inputs (``lengths`` given, padding = 0) the length is part of the
    dedup key, so a read is a duplicate only of an equal-LENGTH read;
    true containments are handled by the overlap kernel's containment
    detection instead.
    """
    N, L = reads.shape
    if lengths is not None:
        # enforce zero padding so packed-word keys are well defined
        reads = jnp.where(
            jnp.arange(L)[None, :] < lengths[:, None], reads, 0
        )
        rc = revcomp_ragged(reads, lengths)
    else:
        rc = bitpack.revcomp_codes(reads)
    fwd = reads
    fwd_w = bitpack.pack_read_words(fwd)
    rc_w = bitpack.pack_read_words(rc)
    take_rc = words_less(rc_w, fwd_w)
    canon_w = jnp.where(take_rc[:, None], rc_w, fwd_w)
    canon = jnp.where(take_rc[:, None], rc, fwd)
    W = canon_w.shape[1]

    keys = [canon_w[:, j] for j in range(W)]
    if lengths is not None:
        keys = [lengths.astype(jnp.uint32)] + keys
    order = jnp.arange(N, dtype=jnp.int32)
    sorted_ops = sort_by_keys(keys, [order])
    s_keys, s_order = sorted_ops[:-1], sorted_ops[-1]
    W = len(s_keys)

    neq = jnp.zeros(N, bool).at[0].set(True)
    for j in range(W):
        prev = jnp.concatenate([s_keys[j][:1], s_keys[j][:-1]])
        neq = neq | (s_keys[j] != prev)
    neq = neq.at[0].set(True)
    group_id = jnp.cumsum(neq.astype(jnp.int32)) - 1
    n_unique = group_id[-1] + 1

    # representative row (head of each group) and multiplicities
    head_src = jnp.where(neq, s_order, 0)
    slot = jnp.where(neq, group_id, N)  # non-heads dropped
    rep = jnp.zeros(N, jnp.int32).at[slot].set(head_src, mode="drop")
    mult = (
        jnp.zeros(N, jnp.int32)
        .at[jnp.minimum(group_id, N - 1)]
        .add(1, mode="drop")
    )
    valid = jnp.arange(N) < n_unique
    uniq = jnp.where(valid[:, None], canon[rep], 0)
    mult = jnp.where(valid, mult, 0)

    # input read i -> its vertex: group g_i holds the canonical
    # orientation; read i as read is the canonical row when it was NOT
    # flipped, otherwise the RC row (offset by capacity N)
    gid = jnp.zeros(N, jnp.int32).at[s_order].set(group_id)
    vertex_of_read = gid + jnp.where(take_rc, N, 0).astype(jnp.int32)

    if lengths is not None:
        lens_u = jnp.where(valid, lengths[rep], 0).astype(jnp.int32)
        rc_u = revcomp_ragged(uniq, lens_u)
        lengths2 = jnp.concatenate([lens_u, lens_u])
    else:
        rc_u = bitpack.revcomp_codes(uniq)
        lengths2 = None
    reads2 = jnp.concatenate([uniq, rc_u], axis=0)
    valid2 = jnp.concatenate([valid, valid])
    mult2 = jnp.concatenate([mult, mult])
    return ReadSet(reads2, valid2, mult2, n_unique.astype(jnp.int32),
                   vertex_of_read, lengths2)
