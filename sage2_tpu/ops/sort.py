"""Multi-key sort, lexicographic binary search, and segment utilities.

These are the core primitives of the sort-based TPU design (SURVEY.md §7
"Design stance": no device hash tables — radix/comparison sort plus
segment ops are deterministic and vector-friendly). The reference's
sparsehash/Jellyfish hash tables (SURVEY.md §2 "k-mer counter") map onto
``sort_by_keys`` + ``unique_sorted_pairs`` here; its hash probes map onto
``lex_searchsorted``.
"""

from __future__ import annotations

import math
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp


def sort_by_keys(keys: Sequence[jnp.ndarray], vals: Sequence[jnp.ndarray] = ()):
    """Stable lexicographic sort of 1-D operands by ``keys`` (major first).

    Returns the reordered ``list(keys) + list(vals)``.
    """
    ops = tuple(keys) + tuple(vals)
    return list(jax.lax.sort(ops, num_keys=len(keys), is_stable=True))


def lex_less(
    ah: jnp.ndarray, al: jnp.ndarray, bh: jnp.ndarray, bl: jnp.ndarray
) -> jnp.ndarray:
    """(ah, al) < (bh, bl) lexicographically."""
    return (ah < bh) | ((ah == bh) & (al < bl))


def lex_searchsorted(
    table_hi: jnp.ndarray,
    table_lo: jnp.ndarray,
    q_hi: jnp.ndarray,
    q_lo: jnp.ndarray,
    side: str = "left",
) -> jnp.ndarray:
    """Vectorized binary search over a (hi, lo)-pair sorted table.

    ``table_*`` are 1-D and lexicographically sorted; queries may have any
    shape. Returns insertion indices (int32), semantics matching
    ``np.searchsorted``. TPUs lack 64-bit ints, so 50-62-bit k-mer keys
    live as uint32 pairs and this replaces ``jnp.searchsorted``.
    """
    n = table_hi.shape[0]
    if n == 0:
        return jnp.zeros(q_hi.shape, jnp.int32)
    steps = math.ceil(math.log2(n + 1)) + 1
    # Derive the carry init from both operands so it inherits their
    # device-varying axes under shard_map (a plain zeros init would make
    # the fori_loop carry type mismatch inside sharded stages).
    base = (q_hi ^ q_hi).astype(jnp.int32) + (
        table_hi[0] ^ table_hi[0]
    ).astype(jnp.int32)
    lo_b = base
    hi_b = base + jnp.int32(n)

    if side == "left":
        # go right while table[mid] < query
        def cond(th, tl):
            return lex_less(th, tl, q_hi, q_lo)
    elif side == "right":
        # go right while table[mid] <= query
        def cond(th, tl):
            return ~lex_less(q_hi, q_lo, th, tl)
    else:
        raise ValueError(side)

    def body(_, carry):
        lo_b, hi_b = carry
        active = lo_b < hi_b
        mid = (lo_b + hi_b) >> 1
        mid_c = jnp.minimum(mid, n - 1)
        go_right = cond(table_hi[mid_c], table_lo[mid_c])
        new_lo = jnp.where(go_right, mid + 1, lo_b)
        new_hi = jnp.where(go_right, hi_b, mid)
        return (
            jnp.where(active, new_lo, lo_b),
            jnp.where(active, new_hi, hi_b),
        )

    lo_b, hi_b = jax.lax.fori_loop(0, steps, body, (lo_b, hi_b))
    return lo_b


def unique_sorted_pairs(
    hi: jnp.ndarray, lo: jnp.ndarray, valid: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Group boundaries of a sorted (hi, lo) sequence.

    Returns ``(is_head, group_id)``: ``is_head[i]`` marks the first element
    of each run of equal keys among valid entries (invalid entries, which
    must be sorted to the end, get group_id past the last real group).
    """
    prev_hi = jnp.concatenate([hi[:1], hi[:-1]])
    prev_lo = jnp.concatenate([lo[:1], lo[:-1]])
    first = jnp.zeros(hi.shape, bool).at[0].set(True)
    is_head = (first | (hi != prev_hi) | (lo != prev_lo)) & valid
    group_id = jnp.cumsum(is_head.astype(jnp.int32)) - 1
    group_id = jnp.where(valid, group_id, jnp.int32(2**31 - 1))
    return is_head, group_id


def expand_by_counts(
    counts: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Flatten variable-size groups into a fixed-capacity index space.

    Given per-group ``counts`` (int32, shape (G,)), produce for each output
    slot j in [0, capacity): the group it belongs to, its rank within the
    group, and a validity mask (slots past sum(counts) are invalid). This
    is the standard static-shape "ragged expand" used everywhere dynamic
    result sizes appear (SURVEY.md §7 "Hard parts": fixed capacities with
    overflow counters).
    """
    G = counts.shape[0]
    offsets = jnp.cumsum(counts)                       # inclusive
    total = offsets[-1] if G > 0 else jnp.int32(0)
    starts = offsets - counts
    # scatter each non-empty group's id at its start slot, then forward-
    # fill with a max-scan — O(capacity) scan instead of a binary search
    # per output slot (the searchsorted form was a hotspot on TPU).
    nonempty = (counts > 0) & (starts < capacity)
    scatter_idx = jnp.where(nonempty, starts, capacity)
    init = (
        jnp.full(capacity + 1, -1, jnp.int32)
        .at[scatter_idx]
        .max(jnp.arange(G, dtype=jnp.int32))[:capacity]
    )
    group = jax.lax.cummax(init)
    group_c = jnp.clip(group, 0, G - 1)
    j = jnp.arange(capacity, dtype=jnp.int32)
    rank = j - starts[group_c]
    valid = (j < total) & (group >= 0)
    return group_c, rank, valid


def expand_with_payload(
    counts: jnp.ndarray, payload: jnp.ndarray, capacity: int
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """expand_by_counts fused with a per-group payload lookup.

    Returns (group, rank, payload[group], valid). The group's start and
    payload are packed into one 2-column row so each output slot costs a
    single row gather instead of two 1-wide gathers — random-access op
    count is the dominant stage cost on this device (SURVEY.md §9).
    """
    G = counts.shape[0]
    offsets = jnp.cumsum(counts)
    total = offsets[-1] if G > 0 else jnp.int32(0)
    starts = offsets - counts
    packed = jnp.stack([starts, payload], axis=1)
    nonempty = (counts > 0) & (starts < capacity)
    scatter_idx = jnp.where(nonempty, starts, capacity)
    init = (
        jnp.full(capacity + 1, -1, jnp.int32)
        .at[scatter_idx]
        .max(jnp.arange(G, dtype=jnp.int32))[:capacity]
    )
    group = jax.lax.cummax(init)
    group_c = jnp.clip(group, 0, G - 1)
    row = packed[group_c]
    j = jnp.arange(capacity, dtype=jnp.int32)
    rank = j - row[:, 0]
    valid = (j < total) & (group >= 0)
    return group_c, rank, row[:, 1], valid


def words_less(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Lexicographic a < b over the last (word) axis; any leading shape."""
    W = a.shape[-1]
    less = jnp.zeros(a.shape[:-1], bool)
    eq = jnp.ones(a.shape[:-1], bool)
    for j in range(W):
        less = less | (eq & (a[..., j] < b[..., j]))
        eq = eq & (a[..., j] == b[..., j])
    return less


def segment_sum(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    return jax.ops.segment_sum(data, segment_ids, num_segments=num_segments)


def segment_max(data: jnp.ndarray, segment_ids: jnp.ndarray, num_segments: int):
    return jax.ops.segment_max(data, segment_ids, num_segments=num_segments)
