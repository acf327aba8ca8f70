"""Transitive reduction of the string graph (Myers 2005).

Edge v->x (offset sl_vx = L - overlap) is implied — and removed — when
some middle vertex w has v->w and w->x with sl_vx = sl_vw + sl_wx.
Exact overlaps need no fuzz: offsets add exactly (SURVEY.md §2
"Transitive reduction"; semantics pinned by
refmodel.oracle.oracle_transitive_reduction).

TPU design (SURVEY.md §3.4): no pointer chasing. The edge list is kept
sorted two ways — by (src, dst) for membership probes and by (src, sl)
for adjacency expansion. Each edge e1 = (v, w) expands against w's
out-edges with sl <= maxsl(v) - sl(e1) (anything larger cannot land on an
existing v-edge), which prunes the quadratic blowup; the expansion is a
static-capacity flatten, membership is a lexicographic binary search, and
removal is a scatter-OR. One pass suffices — implication is defined on
the ORIGINAL edge set, matching the oracle.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from sage2_tpu.ops.sort import expand_by_counts, lex_searchsorted, sort_by_keys

_I32_MAX = jnp.int32(2**31 - 1)


class ReducedGraph(NamedTuple):
    """Edge list after reduction, sorted by (src, dst); padding src=INT32_MAX."""

    src: jnp.ndarray
    dst: jnp.ndarray
    ovl: jnp.ndarray
    n_edges: jnp.ndarray
    n_expansions: jnp.ndarray  # exact length-2 path count (for sizing)
    overflow: jnp.ndarray  # expansion exceeded capacity


def transitive_reduction(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    ovl: jnp.ndarray,
    n_vertices: int,
    read_len,
    capacity: int = 1 << 20,
) -> ReducedGraph:
    """Remove transitively-implied edges. Inputs sorted by (src, dst).

    ``read_len``: scalar for fixed-length reads, or a (V,) per-vertex
    length array for ragged reads — the edge offset is
    sl = len(src) - overlap either way, and offsets stay exactly
    additive along paths (each lives in its source read's coordinates),
    so Myers reduction is unchanged.
    """
    E = src.shape[0]
    V = n_vertices
    is_edge = src != _I32_MAX
    if isinstance(read_len, int):
        src_len = read_len
    else:
        lens = jnp.asarray(read_len)
        src_len = lens[jnp.clip(src, 0, V - 1)]
    sl = jnp.where(is_edge, src_len - ovl, _I32_MAX)

    # adjacency view sorted by (src, sl); carry dst along
    ss_src, ss_sl, ss_dst = sort_by_keys([src, sl], [dst])
    u = lambda x: x.astype(jnp.uint32)

    start = lex_searchsorted(
        u(ss_src), u(ss_sl), u(jnp.arange(V, dtype=jnp.int32)),
        jnp.zeros(V, jnp.uint32), side="left",
    )

    # longest path offset usable from v: maxsl(v) over v's out-edges
    seg = jnp.where(is_edge, src, V)
    maxsl = jax.ops.segment_max(
        jnp.where(is_edge, sl, -1), jnp.minimum(seg, V), num_segments=V + 1
    )[:V]
    maxsl = jnp.maximum(maxsl, -1)  # empty segments -> -1

    # per-edge expansion count: #(w out-edges with sl <= maxsl(v) - sl1)
    w = jnp.where(is_edge, dst, 0)
    bound = jnp.where(is_edge, maxsl[jnp.minimum(src, V - 1)] - sl, -1)
    upto = lex_searchsorted(u(ss_src), u(ss_sl), u(w), u(bound), side="right")
    counts = jnp.where(is_edge & (bound >= 0), upto - start[w], 0)
    total = jnp.sum(counts)
    overflow = total > capacity

    e1, rank, valid = expand_by_counts(counts, capacity)
    e2 = jnp.minimum(start[jnp.minimum(dst[e1], V - 1)] + rank, E - 1)
    v = src[e1]
    x = ss_dst[e2]
    sls = sl[e1] + ss_sl[e2]
    valid = valid & (x != v)

    # membership probe in the (src, dst)-sorted list (the probed edge's
    # own sl — its src is v, so its length term is len(v))
    pos = lex_searchsorted(u(src), u(dst), u(v), u(x), side="left")
    pos_c = jnp.minimum(pos, E - 1)
    if isinstance(read_len, int):
        probe_len = read_len
    else:
        probe_len = lens[jnp.clip(v, 0, V - 1)]
    hit = valid & (src[pos_c] == v) & (dst[pos_c] == x) & (
        probe_len - ovl[pos_c] == sls
    )
    removed = (
        jnp.zeros(E, bool)
        .at[jnp.where(hit, pos_c, E)]
        .set(True, mode="drop")
    )

    keep = is_edge & ~removed
    o_src = jnp.where(keep, src, _I32_MAX)
    o_dst = jnp.where(keep, dst, _I32_MAX)
    o_ovl = jnp.where(keep, ovl, 0)
    o_src, o_dst, o_ovl = sort_by_keys([o_src, o_dst, o_ovl])
    n_edges = jnp.sum(keep.astype(jnp.int32))
    return ReducedGraph(o_src, o_dst, o_ovl, n_edges, total, overflow)
