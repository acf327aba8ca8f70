"""Sharded pipeline stages over a device mesh.

This is the rebuild of SAGE2's MPI runtime (SURVEY.md §2 "Parallel
runtime"): reads are sharded over the mesh's data axis (DP analog); the
k-mer space is hash-partitioned so each device owns a slice of the
global count table (the reference's "k-mer space partitioned by hash
across ranks" — its tensor-parallel analog); and all cross-device
movement is three collective patterns inside shard_map:

  * bucketed all-to-all — route k-mers / count queries / overlap seeds
    to their owner device (replaces MPI point-to-point exchange);
  * psum — global histograms and overflow flags;
  * all_gather — small replicated results (edge lists, merged tables).

Static shapes everywhere: routing uses fixed per-destination capacities
with exact overflow detection (SURVEY.md §7 "Hard parts"); callers retry
with larger capacities on overflow.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from sage2_tpu.kmer.count import KmerTable, count_from_keys, lookup_counts
from sage2_tpu.kmer.correct import (
    apply_verdicts,
    variant_keys_first,
    variant_keys_last,
)
from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import (
    expand_by_counts,
    expand_with_payload,
    lex_searchsorted,
    sort_by_keys,
)
from sage2_tpu.overlap.detect import verify_candidates

_U32_MAX = jnp.uint32(0xFFFFFFFF)
_I32_MAX = jnp.int32(2**31 - 1)


def _owner(hi: jnp.ndarray, lo: jnp.ndarray, ndev: int) -> jnp.ndarray:
    """Deterministic hash-partition of k-mer keys across devices.

    Canonical keys are lexicographically biased low, so range-partition
    would imbalance; a multiplicative mix spreads them uniformly.
    """
    h = hi * jnp.uint32(0x9E3779B1) + lo * jnp.uint32(0x85EBCA77)
    h = h ^ (h >> 16)
    h = h * jnp.uint32(0x7FEB352D)
    h = h ^ (h >> 15)
    return (h % jnp.uint32(ndev)).astype(jnp.int32)


class _Routed(NamedTuple):
    """Result of routing values to owner devices via all-to-all."""

    recv: Tuple[jnp.ndarray, ...]   # each (ndev, cap) received values
    recv_valid: jnp.ndarray         # (ndev, cap)
    dest: jnp.ndarray               # (Q,) destination of each local input
    rank: jnp.ndarray               # (Q,) slot rank of each local input
    sent_ok: jnp.ndarray            # (Q,) input made it into the buffer
    overflow: jnp.ndarray           # scalar bool (local; psum outside)


def _route(axis: str, owner: jnp.ndarray, valid: jnp.ndarray,
           values: Tuple[jnp.ndarray, ...], cap: int, ndev: int) -> _Routed:
    """All-to-all route each input to its owner device.

    Inputs are 1-D of length Q. The send buffer is (ndev, cap); inputs
    beyond an owner's capacity are dropped (overflow flagged). Answers
    can be routed back with _route_back using (dest, rank).
    """
    Q = owner.shape[0]
    own = jnp.where(valid, owner, ndev)
    idx = jnp.arange(Q, dtype=jnp.int32)
    s_own, s_idx = sort_by_keys([own], [idx])
    start = jnp.searchsorted(
        s_own, jnp.arange(ndev, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    pos = jnp.arange(Q, dtype=jnp.int32)
    rank_sorted = pos - start[jnp.minimum(s_own, ndev - 1)]
    ok_sorted = (s_own < ndev) & (rank_sorted < cap)
    slot_sorted = jnp.where(
        ok_sorted, s_own * cap + rank_sorted, ndev * cap
    )
    # per-input dest/rank in original order
    dest = jnp.zeros(Q, jnp.int32).at[s_idx].set(jnp.minimum(s_own, ndev - 1))
    rank = jnp.zeros(Q, jnp.int32).at[s_idx].set(rank_sorted)
    sent_ok = jnp.zeros(Q, bool).at[s_idx].set(ok_sorted)
    overflow = jnp.any((s_own < ndev) & ~ok_sorted)

    send_valid = (
        jnp.zeros(ndev * cap + 1, bool).at[slot_sorted].set(ok_sorted)[:-1]
    )
    recvs = []
    for v in values:
        sv = v[s_idx]
        buf = jnp.zeros(ndev * cap + 1, v.dtype).at[slot_sorted].set(
            jnp.where(ok_sorted, sv, jnp.zeros((), v.dtype))
        )[:-1]
        recvs.append(
            jax.lax.all_to_all(
                buf.reshape(ndev, cap), axis, 0, 0, tiled=True
            )
        )
    recv_valid = jax.lax.all_to_all(
        send_valid.reshape(ndev, cap), axis, 0, 0, tiled=True
    )
    return _Routed(tuple(recvs), recv_valid, dest, rank, sent_ok, overflow)


def _route_back(axis: str, answers: jnp.ndarray, routed: _Routed) -> jnp.ndarray:
    """Return per-owner answers (ndev, cap) to the senders; gather each
    original input's answer (0 where the input was dropped)."""
    back = jax.lax.all_to_all(answers, axis, 0, 0, tiled=True)
    ans = back[routed.dest, routed.rank]
    return jnp.where(routed.sent_ok, ans, jnp.zeros((), answers.dtype))


# --------------------------------------------------------------------------
# sharded k-mer counting
# --------------------------------------------------------------------------


def _local_count_owned(axis: str, hi, lo, valid, k: int, cap: int, ndev: int):
    """Route canonical keys to owners; owner builds its local sorted table."""
    routed = _route(axis, _owner(hi, lo, ndev), valid, (hi, lo), cap, ndev)
    r_hi, r_lo = routed.recv
    table = count_from_keys(
        r_hi.reshape(-1), r_lo.reshape(-1), k,
        valid=routed.recv_valid.reshape(-1),
    )
    overflow = jax.lax.psum(routed.overflow.astype(jnp.int32), axis) > 0
    return table, overflow


def _sharded_lookup(axis: str, table: KmerTable, q_hi, q_lo, cap: int,
                    ndev: int):
    """Distributed count lookup: route queries to owners, answer, return."""
    shape = q_hi.shape
    fh = q_hi.reshape(-1)
    fl = q_lo.reshape(-1)
    routed = _route(
        axis, _owner(fh, fl, ndev), jnp.ones(fh.shape, bool), (fh, fl),
        cap, ndev,
    )
    r_hi, r_lo = routed.recv
    ans = lookup_counts(table, r_hi, r_lo)
    ans = jnp.where(routed.recv_valid, ans, 0)
    counts = _route_back(axis, ans, routed)
    overflow = jax.lax.psum(routed.overflow.astype(jnp.int32), axis) > 0
    return counts.reshape(shape), overflow


def sharded_count_kmers(
    mesh: Mesh, reads: jnp.ndarray, k: int, route_cap: int
) -> Tuple[KmerTable, jnp.ndarray]:
    """Count canonical k-mers of reads sharded over the mesh data axis.

    Returns (table, overflow): ``table`` arrays are sharded over the data
    axis — device d holds the slice of the hash-partitioned global table
    it owns (stacked along a leading mesh axis).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None),),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(axis), P()),
    )
    def run(reads_local):
        hi, lo = bitpack.canonical_kmer_keys(reads_local, k)
        table, overflow = _local_count_owned(
            axis, hi.reshape(-1), lo.reshape(-1),
            jnp.ones(hi.size, bool), k, route_cap, ndev,
        )
        return (
            table.hi[None], table.lo[None], table.count[None],
            table.n_unique[None], overflow,
        )

    hi, lo, count, n_unique, overflow = run(reads)
    return KmerTable(hi, lo, count, n_unique, k), overflow


def sharded_correct_reads(
    mesh: Mesh,
    reads: jnp.ndarray,
    k: int,
    threshold: int,
    rounds: int,
    route_cap: int,
    query_cap: int,
    valid: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed spectrum correction: reads stay sharded; every count
    probe is a routed query against the hash-partitioned table.

    Semantics identical to kmer.correct_reads (same verdict rule and pass
    order) — tested for equality against the single-device path.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if valid is None:
        valid = jnp.ones(reads.shape[0], bool)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(axis, None), P()),
    )
    def run(reads_local, valid_local):
        r = reads_local
        any_overflow = jnp.zeros((), bool)
        for _ in range(rounds):
            hi, lo = bitpack.canonical_kmer_keys(r, k)
            kvalid = jnp.broadcast_to(
                valid_local[:, None], hi.shape
            ).reshape(-1)
            table, ovf = _local_count_owned(
                axis, hi.reshape(-1), lo.reshape(-1),
                kvalid, k, route_cap, ndev,
            )
            any_overflow |= ovf
            for which in ("last", "first"):
                if which == "last":
                    ch, cl, cur = variant_keys_last(r, k)
                    off = k - 1
                else:
                    ch, cl, cur = variant_keys_first(r, k)
                    off = 0
                counts, ovf = _sharded_lookup(
                    axis, table, ch, cl, query_cap, ndev
                )
                any_overflow |= ovf
                counts4 = jnp.moveaxis(counts, 0, -1)
                r = apply_verdicts(r, counts4, cur, off, threshold)
        return r, any_overflow

    return run(reads, valid)


# --------------------------------------------------------------------------
# sharded transitive reduction
# --------------------------------------------------------------------------


def sharded_transitive_reduction(
    mesh: Mesh,
    src: jnp.ndarray,
    dst: jnp.ndarray,
    ovl: jnp.ndarray,
    n_vertices: int,
    read_len: int,
    capacity_per_device: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, jnp.ndarray]:
    """Distributed Myers transitive reduction (SURVEY.md §3.4).

    The length-2-path EXPANSION — the stage's quadratic hot loop — is
    sharded: each device expands only its slice of the edge list against
    the replicated (src, sl)-sorted adjacency, probes membership, and
    scatters local removal hits; masks are psum-OR'd so the surviving
    edge set is bit-identical to graph.reduce.transitive_reduction (one
    pass over the ORIGINAL edge set, order-independent removal).

    Inputs are the globally (src, dst)-sorted padded edge list
    (replicated); E must divide the mesh size. Returns replicated
    (src, dst, ovl, n_edges, n_expansions, overflow).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    E = src.shape[0]
    V = n_vertices
    if E % ndev:
        raise ValueError(f"edge capacity {E} must divide mesh size {ndev}")

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(), P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(src_l, dst_l, ovl_l):
        e_l = src_l.shape[0]
        dev = jax.lax.axis_index(axis)
        base = dev * e_l
        src_g = jax.lax.all_gather(src_l, axis, tiled=True)
        dst_g = jax.lax.all_gather(dst_l, axis, tiled=True)
        ovl_g = jax.lax.all_gather(ovl_l, axis, tiled=True)

        is_edge_g = src_g != _I32_MAX
        sl_g = jnp.where(is_edge_g, read_len - ovl_g, _I32_MAX)
        ss_src, ss_sl, ss_dst = sort_by_keys([src_g, sl_g], [dst_g])
        u = lambda x: x.astype(jnp.uint32)
        start = lex_searchsorted(
            u(ss_src), u(ss_sl), u(jnp.arange(V, dtype=jnp.int32)),
            jnp.zeros(V, jnp.uint32), side="left",
        )
        seg = jnp.where(is_edge_g, src_g, V)
        maxsl = jax.ops.segment_max(
            jnp.where(is_edge_g, sl_g, -1), jnp.minimum(seg, V),
            num_segments=V + 1,
        )[:V]
        maxsl = jnp.maximum(maxsl, -1)

        # --- sharded expansion over the local edge slice ---------------
        is_edge = src_l != _I32_MAX
        sl_l = jnp.where(is_edge, read_len - ovl_l, _I32_MAX)
        w = jnp.where(is_edge, dst_l, 0)
        bound = jnp.where(
            is_edge, maxsl[jnp.minimum(src_l, V - 1)] - sl_l, -1
        )
        upto = lex_searchsorted(u(ss_src), u(ss_sl), u(w), u(bound),
                                side="right")
        counts = jnp.where(is_edge & (bound >= 0), upto - start[w], 0)
        total_l = jnp.sum(counts)
        overflow_l = total_l > capacity_per_device

        e1, rank, valid = expand_by_counts(counts, capacity_per_device)
        e2 = jnp.minimum(
            start[jnp.minimum(dst_l[e1], V - 1)] + rank, E - 1
        )
        v = src_l[e1]
        x = ss_dst[e2]
        sls = sl_l[e1] + ss_sl[e2]
        valid = valid & (x != v)

        pos = lex_searchsorted(u(src_g), u(dst_g), u(v), u(x), side="left")
        pos_c = jnp.minimum(pos, E - 1)
        hit = valid & (src_g[pos_c] == v) & (dst_g[pos_c] == x) & (
            read_len - ovl_g[pos_c] == sls
        )
        removed_l = (
            jnp.zeros(E, jnp.int32)
            .at[jnp.where(hit, pos_c, E)]
            .max(1, mode="drop")
        )
        removed = jax.lax.psum(removed_l, axis) > 0

        keep = is_edge_g & ~removed
        o_src = jnp.where(keep, src_g, _I32_MAX)
        o_dst = jnp.where(keep, dst_g, _I32_MAX)
        o_ovl = jnp.where(keep, ovl_g, 0)
        o_src, o_dst, o_ovl = sort_by_keys([o_src, o_dst, o_ovl])
        n_edges = jnp.sum(keep.astype(jnp.int32))
        n_expansions = jax.lax.psum(total_l, axis)
        overflow = jax.lax.psum(overflow_l.astype(jnp.int32), axis) > 0
        del base
        return o_src, o_dst, o_ovl, n_edges, n_expansions, overflow

    return run(src, dst, ovl)


# --------------------------------------------------------------------------
# sharded overlap detection
# --------------------------------------------------------------------------


def sharded_find_overlaps(
    mesh: Mesh,
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int,
    route_cap: int,
    join_cap: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Distributed suffix-prefix overlap detection (inverted strided join).

    The g-offset-seeds-per-read B-table is all_gathered and sorted
    replicated on every device; each device then joins only its
    OWN read shard's strided A-side probe positions against it and verifies
    against an all-gathered word-packed prefix replica. All candidates for a pair
    (a, b) arise from a's A-side entries, which live on a's owner — so
    the longest-per-pair reduction is complete locally; edge lists are
    all_gathered and globally sorted for a replicated deterministic
    result. (Streamed verification replaces the read replica for
    table-scale inputs in a later round.)
    Returns (src, dst, ovl, n_edges, overflow).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    del route_cap  # inverted join routes nothing; kept for API stability

    from sage2_tpu.overlap.detect import (
        _prefix_join_parts,
        auto_stride,
        reduce_edge_candidates,
        seed_keys_at_positions,
        shifted_word_packs,
    )

    pa = L - min_overlap
    g = auto_stride(min_overlap, s, pa)
    n_pos = -(-pa // g)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis)),
        out_specs=(P(), P(), P(), P(), P()),
        check_vma=False,
    )
    def run(reads_local, valid_local):
        m_local = reads_local.shape[0]
        dev = jax.lax.axis_index(axis)
        base = dev * m_local
        all_valid = jax.lax.all_gather(valid_local, axis, tiled=True)

        shifted_l = shifted_word_packs(reads_local)
        # strided schedule (detect.find_overlaps): replicated global
        # B-table of g offset seeds per read; local A probes every g-th
        # position. Entry ids e = b*g + o stay globally consistent
        # because the all_gather concatenates in device order.
        b_hi_l, b_lo_l = seed_keys_at_positions(
            shifted_l, s, list(range(g)), L
        )
        a_hi_l, a_lo_l = seed_keys_at_positions(
            shifted_l, s, [g * (j + 1) for j in range(n_pos)], L
        )
        b_hi = jax.lax.all_gather(b_hi_l, axis, tiled=True)
        b_lo = jax.lax.all_gather(b_lo_l, axis, tiled=True)
        b_valid = (
            jnp.repeat(all_valid, g) if g > 1 else all_valid
        )
        b_entry, lo_idx_l, counts_l = _prefix_join_parts(
            b_hi.reshape(-1), b_lo.reshape(-1), b_valid,
            a_hi_l, a_lo_l, valid_local, seed_bits=2 * s,
        )
        counts = counts_l
        n_cand_local = jnp.sum(counts)
        join_overflow = n_cand_local > join_cap

        # slot slab with embedded prefix words (detect.find_overlaps).
        # Only word-packed prefixes cross devices (W uint32 per read,
        # ~14x smaller than gathering the reads themselves).
        words0 = jax.lax.all_gather(
            bitpack.pack_read_words(reads_local), axis, tiled=True
        )
        slab = jnp.concatenate(
            [b_entry[:, None].astype(jnp.uint32),
             words0[jnp.minimum(b_entry // g, M - 1)]],
            axis=1,
        )

        entry, rank, lo_of_entry, cand_valid = expand_with_payload(
            counts.reshape(-1), lo_idx_l.reshape(-1), join_cap
        )
        cand_a = base + entry // n_pos
        cand_p = (entry % n_pos + 1) * g
        b_slot = jnp.minimum(lo_of_entry + rank, M * g - 1)
        row = slab[b_slot]
        e_b = row[:, 0].astype(jnp.int32)
        cand_b = e_b // g
        cand_p0 = cand_p - (e_b - cand_b * g)
        cand_valid = (
            cand_valid & (cand_a != cand_b) & (cand_p0 <= pa)
        )
        cand_p0 = jnp.clip(cand_p0, 1, pa)

        ok = verify_candidates(
            reads_local, cand_a - base, cand_p0, cand_b,
            shifted=shifted_l, words0=words0, max_p=pa,
            b_words=row[:, 1:],
        ) & cand_valid
        ovl = L - cand_p0

        e_src, e_dst, e_ovl, n_local = reduce_edge_candidates(
            ok, cand_a, cand_b, ovl, L, M
        )

        g_src = jax.lax.all_gather(e_src, axis, tiled=True)
        g_dst = jax.lax.all_gather(e_dst, axis, tiled=True)
        g_ovl = jax.lax.all_gather(e_ovl, axis, tiled=True)
        g_src, g_dst, g_ovl = sort_by_keys([g_src, g_dst, g_ovl])
        n_edges = jax.lax.psum(n_local, axis)
        overflow = jax.lax.psum(join_overflow.astype(jnp.int32), axis) > 0
        return g_src, g_dst, g_ovl, n_edges, overflow

    return run(reads2, valid2)
