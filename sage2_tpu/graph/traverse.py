"""Unitig contraction on device: unambiguous-path labeling by pointer
doubling (SURVEY.md §3.5 "rebuild partitions the graph and iterates
pointer-doubling/segment ops, finalizing ambiguous joins on host").

A chain edge u->v satisfies outdeg(u) == 1 and indeg(v) == 1. Each vertex
is labeled with its chain head and its distance from it in O(log V)
doubling rounds of pure gathers — no sequential walk. Cycles (e.g. a
circular genome with no branches) are broken deterministically at their
minimum vertex id, matching refmodel.oracle.oracle_unitigs.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

_I32_MAX = jnp.int32(2**31 - 1)


class UnitigLabels(NamedTuple):
    """Per-vertex chain labels (device arrays, size V).

    head: chain head vertex id; dist: position within the chain (0 at
    head); nxt: chain successor (-1 at chain tails); ovl_next: overlap
    length of the chain edge out of v (0 where nxt == -1); outdeg/indeg:
    degrees in the reduced graph.
    """

    head: jnp.ndarray
    dist: jnp.ndarray
    nxt: jnp.ndarray
    ovl_next: jnp.ndarray
    outdeg: jnp.ndarray
    indeg: jnp.ndarray


def contract_unitigs(
    src: jnp.ndarray, dst: jnp.ndarray, ovl: jnp.ndarray, n_vertices: int
) -> UnitigLabels:
    """Label unambiguous chains of the reduced string graph."""
    V = n_vertices
    is_edge = src != _I32_MAX
    seg_src = jnp.where(is_edge, src, V)
    seg_dst = jnp.where(is_edge, dst, V)
    ones = is_edge.astype(jnp.int32)
    outdeg = jax.ops.segment_sum(ones, seg_src, num_segments=V + 1)[:V]
    indeg = jax.ops.segment_sum(ones, seg_dst, num_segments=V + 1)[:V]

    # single out-/in-neighbors (valid only where degree == 1: with
    # degree > 1 an arbitrary writer wins and is masked out below)
    succ = (
        jnp.full(V + 1, -1, jnp.int32)
        .at[seg_src]
        .set(jnp.where(is_edge, dst, -1), mode="drop")[:V]
    )
    succ_ovl = (
        jnp.full(V + 1, 0, jnp.int32)
        .at[seg_src]
        .set(jnp.where(is_edge, ovl, 0), mode="drop")[:V]
    )
    pred = (
        jnp.full(V + 1, -1, jnp.int32)
        .at[seg_dst]
        .set(jnp.where(is_edge, src, -1), mode="drop")[:V]
    )

    succ_c = jnp.maximum(succ, 0)
    chain_out = (outdeg == 1) & (succ >= 0) & (indeg[succ_c] == 1)
    nxt = jnp.where(chain_out, succ, -1)
    ovl_next = jnp.where(chain_out, succ_ovl, 0)
    pred_c = jnp.maximum(pred, 0)
    chain_in = (indeg == 1) & (pred >= 0) & (outdeg[pred_c] == 1)
    ids = jnp.arange(V, dtype=jnp.int32)
    p = jnp.where(chain_in, pred_c, ids)

    steps = max(1, math.ceil(math.log2(max(V, 2))) + 1)

    def double(p):
        def body(_, p):
            return p[p]

        return jax.lax.fori_loop(0, steps, body, p)

    # min-id propagation over the backward closure (labels whole cycles)
    def min_prop(p):
        def body(_, carry):
            m, pp = carry
            return jnp.minimum(m, m[pp]), pp[pp]

        m, _ = jax.lax.fori_loop(0, steps, body, (ids, p))
        return m

    pf = double(p)
    in_cycle = p[pf] != pf
    m = min_prop(p)
    breaker = in_cycle & (m == ids)          # min vertex of each cycle
    p = jnp.where(breaker, ids, p)
    # the chain edge into the breaker is dissolved
    # non-breakers write slot V (scratch), discarded by the [:V] slice
    bpred = jnp.where(breaker, pred_c, V)
    nxt = jnp.concatenate([nxt, jnp.full((1,), -1, jnp.int32)])
    nxt = nxt.at[bpred].set(-1)[:V]
    ovl_next = jnp.concatenate([ovl_next, jnp.zeros((1,), jnp.int32)])
    ovl_next = ovl_next.at[bpred].set(0)[:V]

    head = double(p)

    # distance to head by doubling
    dist = jnp.where(p != ids, 1, 0).astype(jnp.int32)

    def dist_body(_, carry):
        d, pp = carry
        return d + d[pp], pp[pp]

    dist, _ = jax.lax.fori_loop(0, steps, dist_body, (dist, p))

    return UnitigLabels(head, dist, nxt, ovl_next, outdeg, indeg)
