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

from sage2_tpu.parallel import comm

from sage2_tpu.kmer.count import KmerTable, count_from_keys, lookup_counts
from sage2_tpu.kmer.correct import (
    apply_verdicts,
    variant_keys_first,
    variant_keys_last,
)
from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import (
    expand_by_counts,
    lex_searchsorted,
    sort_by_keys,
)

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
            comm.all_to_all(
                buf.reshape(ndev, cap), axis, 0, 0, tiled=True
            )
        )
    recv_valid = comm.all_to_all(
        send_valid.reshape(ndev, cap), axis, 0, 0, tiled=True
    )
    return _Routed(tuple(recvs), recv_valid, dest, rank, sent_ok, overflow)


def _route_back(axis: str, answers: jnp.ndarray, routed: _Routed) -> jnp.ndarray:
    """Return per-owner answers (ndev, cap) to the senders; gather each
    original input's answer (0 where the input was dropped)."""
    back = comm.all_to_all(answers, axis, 0, 0, tiled=True)
    ans = back[routed.dest, routed.rank]
    return jnp.where(routed.sent_ok, ans, jnp.zeros((), answers.dtype))


def _route_rows(
    axis: str,
    owner: jnp.ndarray,
    valid: jnp.ndarray,
    rows: jnp.ndarray,
    cap: int,
    ndev: int,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """One-way row routing: (Q, K) rows to owner devices in a SINGLE
    all_to_all (one 3-D transfer instead of K per-column exchanges).

    Returns (recv_rows (ndev*cap, K), recv_valid (ndev*cap,), overflow
    (local bool — psum outside)). Rows beyond an owner's per-source
    capacity are dropped and flagged.
    """
    Q, K = rows.shape
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
    overflow = jnp.any((s_own < ndev) & ~ok_sorted)
    buf = (
        jnp.zeros((ndev * cap + 1, K), rows.dtype)
        .at[slot_sorted]
        .set(jnp.where(ok_sorted[:, None], rows[s_idx],
                       jnp.zeros((), rows.dtype)), mode="drop")[:-1]
    )
    vbuf = (
        jnp.zeros(ndev * cap + 1, bool)
        .at[slot_sorted].set(ok_sorted, mode="drop")[:-1]
    )
    recv = comm.all_to_all(
        buf.reshape(ndev, cap, K), axis, 0, 0, tiled=True
    )
    recv_valid = comm.all_to_all(
        vbuf.reshape(ndev, cap), axis, 0, 0, tiled=True
    )
    return recv.reshape(ndev * cap, K), recv_valid.reshape(-1), overflow


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
    overflow = comm.psum(routed.overflow.astype(jnp.int32), axis) > 0
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
    overflow = comm.psum(routed.overflow.astype(jnp.int32), axis) > 0
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

    with comm.label('sharded_count_kmers'):
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
    lengths: jnp.ndarray | None = None,
    rule: str = "single_window",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Distributed spectrum correction: reads stay sharded; every count
    probe is a routed query against the hash-partitioned table.

    Semantics identical to kmer.correct_reads with the same ``rule``
    (single_window sub-passes or vote_all_windows covering-window
    voting — the voting accumulation is per-(read, window) local once
    counts arrive, so it composes with the routed lookup unchanged) —
    tested for equality against the single-device path for both rules.
    ``lengths``: ragged (0-padded) reads — windows past a read's end
    neither count, vote, nor edit, matching the in-core ragged rule.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    if valid is None:
        valid = jnp.ones(reads.shape[0], bool)
    ragged = lengths is not None
    P_ = reads.shape[1] - k + 1
    if rule not in ("single_window", "vote_all_windows"):
        raise ValueError(f"unknown correction rule {rule!r}")

    in_specs = [P(axis, None), P(axis)]
    if ragged:
        in_specs.append(P(axis))

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P()),
    )
    def run(reads_local, valid_local, *rest):
        r = reads_local
        lens_local = rest[0] if ragged else None
        wvalid = None
        if ragged:
            wvalid = jnp.arange(P_)[None, :] < (
                lens_local[:, None] - (k - 1)
            )
        any_overflow = jnp.zeros((), bool)
        for _ in range(rounds):
            hi, lo = bitpack.canonical_kmer_keys(r, k)
            kvalid = jnp.broadcast_to(valid_local[:, None], hi.shape)
            if wvalid is not None:
                kvalid = kvalid & wvalid
            table, ovf = _local_count_owned(
                axis, hi.reshape(-1), lo.reshape(-1),
                kvalid.reshape(-1), k, route_cap, ndev,
            )
            any_overflow |= ovf
            if rule == "vote_all_windows":
                from sage2_tpu.kmer.correct import voting_round

                ovf_acc = [jnp.zeros((), bool)]

                def lookup(ch, cl):
                    counts, o = _sharded_lookup(
                        axis, table, ch, cl, query_cap, ndev
                    )
                    ovf_acc[0] |= o
                    return counts

                r = voting_round(r, lookup, k, threshold, lens_local)
                any_overflow |= ovf_acc[0]
                continue
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
                r = apply_verdicts(r, counts4, cur, off, threshold,
                                   window_valid=wvalid)
        return r, any_overflow

    args = (reads, valid) + ((lengths,) if ragged else ())
    with comm.label('sharded_correct_reads'):
        return run(*args)


# --------------------------------------------------------------------------
# sharded transitive reduction
# --------------------------------------------------------------------------


def partition_edges_by_src(
    src, dst, ovl, n_vertices: int, ndev: int, pad_multiple: int = 1024
):
    """HOST-side partition of a (src, dst)-sorted padded edge list into
    per-device shards by src range (device d owns src in
    [d*ceil(V/ndev), (d+1)*ceil(V/ndev))). Returns int32 arrays of shape
    (ndev, E_d) padded with INT32_MAX/0; each shard stays sorted."""
    import numpy as np

    src = np.asarray(src)
    dst = np.asarray(dst)
    ovl = np.asarray(ovl)
    v_d = -(-n_vertices // ndev)
    # src is sorted with INT32_MAX padding at the tail: device range
    # boundaries come from one searchsorted over the device count —
    # O(ndev log E), not the O(ndev * E) mask passes this used to do
    # (they were a visible serial cost on the resume path at pod scale)
    bounds = np.searchsorted(
        src, np.arange(ndev + 1, dtype=np.int64) * v_d, side="left"
    )
    counts = np.diff(bounds)
    e_d = -(-max(int(counts.max()), 1) // pad_multiple) * pad_multiple
    o_src = np.full((ndev, e_d), 2**31 - 1, np.int32)
    o_dst = np.full((ndev, e_d), 2**31 - 1, np.int32)
    o_ovl = np.zeros((ndev, e_d), np.int32)
    for d in range(ndev):
        lo, hi = int(bounds[d]), int(bounds[d + 1])
        n = hi - lo
        o_src[d, :n] = src[lo:hi]
        o_dst[d, :n] = dst[lo:hi]
        o_ovl[d, :n] = ovl[lo:hi]
    return o_src, o_dst, o_ovl, v_d


def partition_vertex_range(values, n_vertices: int, ndev: int):
    """HOST-side partition of a (V,) per-vertex array into range shards
    (ndev, v_d) — device d owns vertices [d*v_d, (d+1)*v_d)."""
    import numpy as np

    values = np.asarray(values)
    v_d = -(-n_vertices // ndev)
    return np.pad(
        values[: ndev * v_d],
        (0, ndev * v_d - min(values.shape[0], ndev * v_d)),
    ).reshape(ndev, v_d)


def sharded_transitive_reduction(
    mesh: Mesh,
    src_sh: jnp.ndarray,
    dst_sh: jnp.ndarray,
    ovl_sh: jnp.ndarray,
    n_vertices: int,
    read_len: int,
    req_cap: int,
    cand_cap: int,
    lengths_sh: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray,
           jnp.ndarray, jnp.ndarray]:
    """Distributed Myers transitive reduction — NO edge-list replication
    (round 2; replaces the round-1 all_gather of the whole edge list).

    Edges live sharded by src range ((ndev, E_d) from
    partition_edges_by_src), which co-locates every vertex's
    out-adjacency and maxsl with its owner. Two routed phases:

      1. each edge (v, w, sl_vw) sends a request
         [v, w, sl_vw, maxsl(v) - sl_vw] to owner(w) (all-to-all);
      2. owner(w) expands the request against w's LOCAL (src, sl)-sorted
         adjacency (neighbors x with sl_wx <= bound), producing
         candidates [v, x, sl_vw + sl_wx] routed back to owner(v), which
         probes membership in its local (src, dst)-sorted slice and
         scatter-marks removals.

    Removal is defined on the ORIGINAL edge set (matching
    graph.reduce.transitive_reduction bit-for-bit); per-device memory is
    O(E/ndev + capacities). Returns per-device shards
    (src, dst, ovl) of shape (ndev, E_d), sorted with padding at the
    end, plus replicated (n_edges, n_expansions, overflow).

    ``lengths_sh``: ragged reads — (ndev, v_d) per-vertex lengths
    range-partitioned like the edges (partition_vertex_range); the edge
    offset becomes sl = len(src) - overlap. Both uses of a length (the
    adjacency offsets and the membership probe at owner(v)) are LOCAL to
    the vertex's owner, so no extra routing is needed.
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    e_d = src_sh.shape[1]
    V = n_vertices
    v_d = -(-V // ndev)
    u = lambda x: x.astype(jnp.uint32)
    ragged = lengths_sh is not None

    in_specs = [P(axis, None), P(axis, None), P(axis, None)]
    if ragged:
        in_specs.append(P(axis, None))

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P(axis, None), P(axis, None),
                   P(), P(), P()),
        check_vma=False,
    )
    def run(src_2d, dst_2d, ovl_2d, *rest):
        src_l = src_2d.reshape(-1)
        dst_l = dst_2d.reshape(-1)
        ovl_l = ovl_2d.reshape(-1)
        dev = jax.lax.axis_index(axis)
        vbase = dev * v_d

        is_edge = src_l != _I32_MAX
        if ragged:
            lens_l = rest[0].reshape(-1)
            src_len = lens_l[jnp.clip(src_l - vbase, 0, v_d - 1)]
        else:
            src_len = read_len
        sl_l = jnp.where(is_edge, src_len - ovl_l, _I32_MAX)

        # local adjacency sorted by (src, sl) + local per-vertex maxsl
        ss_src, ss_sl, ss_dst = sort_by_keys([src_l, sl_l], [dst_l])
        seg = jnp.where(is_edge, src_l - vbase, v_d)
        maxsl = jax.ops.segment_max(
            jnp.where(is_edge, sl_l, -1),
            jnp.clip(seg, 0, v_d), num_segments=v_d + 1,
        )[:v_d]
        maxsl = jnp.maximum(maxsl, -1)

        # --- phase 1: requests to owner(w) ------------------------------
        bound = jnp.where(
            is_edge,
            maxsl[jnp.clip(src_l - vbase, 0, v_d - 1)] - sl_l,
            -1,
        )
        req_valid = is_edge & (bound >= 0)
        req_rows = jnp.stack([src_l, dst_l, sl_l, bound], axis=1)
        req_owner = jnp.clip(dst_l // v_d, 0, ndev - 1)
        recv_req, req_ok, ovf_req = _route_rows(
            axis, req_owner, req_valid, req_rows, req_cap, ndev
        )
        rv, rw, rsl, rbound = (
            recv_req[:, 0], recv_req[:, 1], recv_req[:, 2], recv_req[:, 3]
        )

        # --- phase 2: expand against w's local adjacency ----------------
        start = lex_searchsorted(
            u(ss_src), u(ss_sl), u(rw), jnp.zeros_like(u(rw)), side="left"
        )
        upto = lex_searchsorted(
            u(ss_src), u(ss_sl), u(rw), u(rbound), side="right"
        )
        counts = jnp.where(req_ok, upto - start, 0)
        total_l = jnp.sum(counts)
        ovf_exp = total_l > cand_cap
        e1, rank, cand_ok = expand_by_counts(counts, cand_cap)
        e2 = jnp.minimum(start[e1] + rank, ss_dst.shape[0] - 1)
        cv = rv[e1]
        cx = ss_dst[e2]
        csls = rsl[e1] + ss_sl[e2]
        cand_ok = cand_ok & (cx != cv)

        # --- phase 3: candidates to owner(v) ----------------------------
        cand_rows = jnp.stack([cv, cx, csls], axis=1)
        cand_owner = jnp.clip(cv // v_d, 0, ndev - 1)
        recv_c, c_ok, ovf_cr = _route_rows(
            axis, cand_owner, cand_ok, cand_rows, cand_cap, ndev
        )
        pv, px, psls = recv_c[:, 0], recv_c[:, 1], recv_c[:, 2]

        # --- phase 4: local membership probe + removal ------------------
        e_l = src_l.shape[0]
        pos = lex_searchsorted(
            u(src_l), u(dst_l), u(pv), u(px), side="left"
        )
        pos_c = jnp.minimum(pos, e_l - 1)
        if ragged:
            probe_len = lens_l[jnp.clip(pv - vbase, 0, v_d - 1)]
        else:
            probe_len = read_len
        hit = c_ok & (src_l[pos_c] == pv) & (dst_l[pos_c] == px) & (
            probe_len - ovl_l[pos_c] == psls
        )
        removed = (
            jnp.zeros(e_l, bool)
            .at[jnp.where(hit, pos_c, e_l)]
            .set(True, mode="drop")
        )

        keep = is_edge & ~removed
        o_src = jnp.where(keep, src_l, _I32_MAX)
        o_dst = jnp.where(keep, dst_l, _I32_MAX)
        o_ovl = jnp.where(keep, ovl_l, 0)
        o_src, o_dst, o_ovl = sort_by_keys([o_src, o_dst, o_ovl])
        n_edges = comm.psum(jnp.sum(keep.astype(jnp.int32)), axis)
        n_expansions = comm.psum(total_l, axis)
        overflow = comm.psum(
            (ovf_req | ovf_exp | ovf_cr).astype(jnp.int32), axis
        ) > 0
        return (
            o_src[None], o_dst[None], o_ovl[None],
            n_edges, n_expansions, overflow,
        )

    args = (src_sh, dst_sh, ovl_sh) + (
        (lengths_sh,) if ragged else ()
    )
    with comm.label('sharded_transitive_reduction'):
        return run(*args)


# --------------------------------------------------------------------------
# sharded unitig labeling (pointer doubling with routed gathers)
# --------------------------------------------------------------------------


def _route_back_rows(
    axis: str, answers: jnp.ndarray, routed: _Routed
) -> jnp.ndarray:
    """Row variant of _route_back: answers (ndev, cap, K) -> (Q, K)."""
    back = comm.all_to_all(answers, axis, 0, 0, tiled=True)
    ans = back[routed.dest, routed.rank]
    return jnp.where(
        routed.sent_ok[:, None], ans, jnp.zeros((), answers.dtype)
    )


def _dedup_routed_gather(
    axis: str,
    ndev: int,
    tables: Tuple[jnp.ndarray, ...],
    idx: jnp.ndarray,
    valid: jnp.ndarray,
    cap: int,
):
    """Distributed gather rows = [t[idx] for t in tables] with LOCAL
    REQUEST DEDUP.

    ``tables`` are (v_d,) arrays cyclically partitioned (vertex v lives
    on device v % ndev at slot v // ndev). Pointer doubling concentrates
    many queries on few targets (chain heads); deduplicating locally
    first bounds per-destination traffic by the number of DISTINCT
    targets, so the route capacity stays O(v_d / ndev)-ish instead of
    O(v_d). Returns ((Q, K) answers, overflow)."""
    Q = idx.shape[0]
    iota = jnp.arange(Q, dtype=jnp.int32)
    key = jnp.where(valid, idx, _I32_MAX)
    s_key, s_ord = sort_by_keys([key], [iota])
    prev = jnp.concatenate([jnp.full((1,), -1, jnp.int32), s_key[:-1]])
    is_head = (s_key != prev) & (s_key != _I32_MAX)
    uniq = jnp.where(is_head, s_key, _I32_MAX)
    # per sorted element: position of its run head; back to input order
    head_pos = jax.lax.cummax(jnp.where(is_head, iota, 0))
    pos_of_orig = jnp.zeros(Q, jnp.int32).at[s_ord].set(head_pos)

    routed = _route(
        axis, uniq % ndev, uniq != _I32_MAX, (uniq,), cap, ndev
    )
    g_idx = routed.recv[0]
    slot = jnp.clip(g_idx // ndev, 0, tables[0].shape[0] - 1)
    answers = jnp.stack(
        [jnp.where(routed.recv_valid, t[slot], jnp.zeros((), t.dtype))
         for t in tables], axis=-1,
    )
    back = _route_back_rows(axis, answers, routed)   # (Q, K) @ uniq pos
    out = back[pos_of_orig]
    out = jnp.where(valid[:, None], out, jnp.zeros((), back.dtype))
    overflow = routed.overflow
    return out, overflow


def sharded_contract_unitigs(
    mesh: Mesh,
    src_sh: jnp.ndarray,
    dst_sh: jnp.ndarray,
    ovl_sh: jnp.ndarray,
    n_vertices: int,
    route_cap: int,
) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray]:
    """Distributed unambiguous-chain labeling (graph.traverse semantics,
    bit-identical) — per-device memory O(V/ndev + E/ndev + route_cap).

    Vertex state (head, dist, nxt, ovl_next, outdeg, indeg) lives
    CYCLICALLY partitioned: vertex v on device v % ndev, slot v // ndev
    (a range partition would send every chain's pointer-chase to one
    owner; cyclic spreads them uniformly). Edges arrive sharded by src
    range ((ndev, E_d), the reduction's output layout) and are re-routed
    by src % ndev / dst % ndev for degree/successor construction. Each
    pointer-doubling round is one deduplicated routed gather
    (_dedup_routed_gather). O(log V) rounds, matching
    graph.traverse.contract_unitigs exactly (same cycle breaking at the
    minimum vertex id).

    Returns ((head, dist, nxt, ovl_next, outdeg, indeg) each
    (ndev, v_d) cyclic shards, overflow)."""
    import math

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    V = n_vertices
    v_d = -(-V // ndev)
    steps = max(1, math.ceil(math.log2(max(V, 2))) + 1)

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None), P(axis, None), P(axis, None)),
        out_specs=(tuple(P(axis, None) for _ in range(6)), P()),
        check_vma=False,
    )
    def run(src_2d, dst_2d, ovl_2d):
        src_l = src_2d.reshape(-1)
        dst_l = dst_2d.reshape(-1)
        ovl_l = ovl_2d.reshape(-1)
        dev = jax.lax.axis_index(axis)
        is_edge = src_l != _I32_MAX
        any_ovf = jnp.zeros((), bool)

        # --- route edges to cyclic owners of src and dst ----------------
        erows = jnp.stack([src_l, dst_l, ovl_l], axis=1)
        r_s, v_s, ovf1 = _route_rows(
            axis, src_l % ndev, is_edge, erows, route_cap, ndev
        )
        r_d, v_d_ok, ovf2 = _route_rows(
            axis, dst_l % ndev, is_edge, erows, route_cap, ndev
        )
        any_ovf |= ovf1 | ovf2

        def myslot(v):
            return jnp.clip(v // ndev, 0, v_d - 1)

        # local outdeg / single successor (by src)
        s_src, s_dst, s_ovl = r_s[:, 0], r_s[:, 1], r_s[:, 2]
        seg_s = jnp.where(v_s, myslot(s_src), v_d)
        ones = v_s.astype(jnp.int32)
        outdeg = jax.ops.segment_sum(ones, seg_s, num_segments=v_d + 1)[:v_d]
        succ = (
            jnp.full(v_d + 1, -1, jnp.int32)
            .at[seg_s].set(jnp.where(v_s, s_dst, -1), mode="drop")[:v_d]
        )
        succ_ovl = (
            jnp.full(v_d + 1, 0, jnp.int32)
            .at[seg_s].set(jnp.where(v_s, s_ovl, 0), mode="drop")[:v_d]
        )
        # local indeg / single predecessor (by dst)
        d_src, d_dst = r_d[:, 0], r_d[:, 1]
        seg_d = jnp.where(v_d_ok, myslot(d_dst), v_d)
        indeg = jax.ops.segment_sum(
            v_d_ok.astype(jnp.int32), seg_d, num_segments=v_d + 1
        )[:v_d]
        pred = (
            jnp.full(v_d + 1, -1, jnp.int32)
            .at[seg_d].set(jnp.where(v_d_ok, d_src, -1), mode="drop")[:v_d]
        )

        # --- chain masks (two routed gathers) ---------------------------
        ideg_at_succ, ovf = _dedup_routed_gather(
            axis, ndev, (indeg,), succ, succ >= 0, route_cap
        )
        any_ovf |= ovf
        chain_out = (outdeg == 1) & (succ >= 0) & (
            ideg_at_succ[:, 0] == 1
        )
        nxt = jnp.where(chain_out, succ, -1)
        ovl_next = jnp.where(chain_out, succ_ovl, 0)
        odeg_at_pred, ovf = _dedup_routed_gather(
            axis, ndev, (outdeg,), pred, pred >= 0, route_cap
        )
        any_ovf |= ovf
        chain_in = (indeg == 1) & (pred >= 0) & (odeg_at_pred[:, 0] == 1)
        ids = dev + jnp.arange(v_d, dtype=jnp.int32) * ndev
        in_range = ids < V
        pred_c = jnp.maximum(pred, 0)
        p = jnp.where(chain_in & in_range, pred_c, jnp.minimum(ids, V - 1))

        # --- doubling helpers -------------------------------------------
        def g1(tbl, idx):
            out, ovf = _dedup_routed_gather(
                axis, ndev, (tbl,), idx, jnp.ones_like(idx, bool), route_cap
            )
            return out[:, 0], ovf

        def g2(t1, t2, idx):
            out, ovf = _dedup_routed_gather(
                axis, ndev, (t1, t2), idx, jnp.ones_like(idx, bool),
                route_cap,
            )
            return out[:, 0], out[:, 1], ovf

        def double(p0):
            def body(_, carry):
                p, ov = carry
                np_, o = g1(p, p)
                return np_, ov | o

            return jax.lax.fori_loop(0, steps, body, (p0, jnp.zeros((), bool)))

        def min_prop(p0):
            def body(_, carry):
                m, pp, ov = carry
                m_at, p_at, o = g2(m, pp, pp)
                return jnp.minimum(m, m_at), p_at, ov | o

            m, _, ov = jax.lax.fori_loop(
                0, steps, body,
                (jnp.minimum(ids, V - 1), p0, jnp.zeros((), bool)),
            )
            return m, ov

        pf, ovf = double(p)
        any_ovf |= ovf
        p_at_pf, ovf = g1(p, pf)
        any_ovf |= ovf
        in_cycle = p_at_pf != pf
        m, ovf = min_prop(p)
        any_ovf |= ovf
        breaker = in_cycle & (m == jnp.minimum(ids, V - 1)) & in_range
        p = jnp.where(breaker, jnp.minimum(ids, V - 1), p)
        # dissolve the chain edge INTO each breaker: its predecessor's
        # nxt/ovl_next reset — predecessors may be remote, so route them
        bp_rows = jnp.stack([pred_c], axis=1)
        r_bp, v_bp, ovf = _route_rows(
            axis, pred_c % ndev, breaker & (pred >= 0), bp_rows,
            route_cap, ndev,
        )
        any_ovf |= ovf
        bslot = jnp.where(v_bp, myslot(r_bp[:, 0]), v_d)
        nxt = jnp.concatenate([nxt, jnp.full((1,), -1, jnp.int32)])
        nxt = nxt.at[bslot].set(-1, mode="drop")[:v_d]
        ovl_next = jnp.concatenate([ovl_next, jnp.zeros((1,), jnp.int32)])
        ovl_next = ovl_next.at[bslot].set(0, mode="drop")[:v_d]

        head, ovf = double(p)
        any_ovf |= ovf

        dist = jnp.where(p != jnp.minimum(ids, V - 1), 1, 0).astype(jnp.int32)

        def dist_body(_, carry):
            d, pp, ov = carry
            d_at, p_at, o = g2(d, pp, pp)
            return d + d_at, p_at, ov | o

        dist, _, ovf = jax.lax.fori_loop(
            0, steps, dist_body, (dist, p, jnp.zeros((), bool))
        )
        any_ovf |= ovf

        overflow = comm.psum(any_ovf.astype(jnp.int32), axis) > 0
        return (
            (head[None], dist[None], nxt[None], ovl_next[None],
             outdeg[None], indeg[None]),
            overflow,
        )

    with comm.label('sharded_contract_unitigs'):
        return run(src_sh, dst_sh, ovl_sh)


def gather_cyclic_shards(shards, n_vertices: int):
    """HOST-side reassembly of cyclic (ndev, v_d) vertex shards into the
    global (V,) array: global[v] = shard[v % ndev, v // ndev]."""
    import numpy as np

    arr = np.asarray(shards)
    # global[j*ndev + d] = shard[d, j] — a transpose, not a device loop
    return np.ascontiguousarray(arr.T).reshape(-1)[:n_vertices]


# --------------------------------------------------------------------------
# sharded overlap detection
# --------------------------------------------------------------------------


def sharded_find_overlaps(
    mesh: Mesh,
    reads2: jnp.ndarray,
    valid2: jnp.ndarray,
    min_overlap: int,
    seed_len: int,
    row_cap: int,
    join_cap: int,
    edge_cap: int | None = None,
    lengths: jnp.ndarray | None = None,
) -> Tuple[jnp.ndarray, ...]:
    """Distributed fused-join overlap detection — NO per-device global
    replication (round 2; replaces the round-1 all_gathered table/slab).

    Every device builds the seed rows of ITS read shard (globally
    numbered), then ONE bucketed all-to-all routes each row to the owner
    of its 32-bit seed hash (SURVEY.md §2 parallelism table: "all-to-all
    keyed by minimizer bucket"). All rows of a hash run land on one
    owner, so each owner executes the same fused join core as the
    single-device kernel on its received rows only. A second all-to-all
    routes verified edges to their SOURCE read's owner, which merges and
    dedups (longest per (src, dst) — pairs verifying at several lengths
    can arrive from different hash owners). Per-device live memory is
    O(M/ndev + capacities), never O(M).

    Returns per-device edge shards (src, dst, ovl) of shape
    (ndev, edge_cap) — device d's slice holds the edges whose src lies
    in read range d, internally (src, dst)-sorted with INT32_MAX
    padding, so the host-side concatenation of the trimmed slices is the
    globally sorted edge list, bit-identical to detect.find_overlaps —
    plus replicated (n_edges, overflow). With ``lengths`` (ragged reads,
    (M,) per-row lengths) a replicated (M,) ``contained`` bool is
    appended: vertices verified as fully contained in a longer read
    (OR-reduced across hash owners; M bits per device — the one
    deliberately O(M) array, it is a bitmask, not row data).
    """
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    if edge_cap is None:
        edge_cap = join_cap
    if M % ndev:
        raise ValueError(f"reads ({M}) must divide the mesh size ({ndev})")
    m_local = M // ndev
    ragged = lengths is not None

    from sage2_tpu.overlap.detect import (
        _reduce_fused,
        build_seed_rows,
        fused_join_core,
        join_geometry,
    )

    geo = join_geometry(L, min_overlap, s)
    g, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt
    if M * R >= (1 << 31) - 1:
        raise ValueError(f"global seed rows {M * R} overflow 31-bit ids")

    in_specs = [P(axis, None), P(axis)]
    out_specs = [P(axis, None), P(axis, None), P(axis, None), P(), P()]
    if ragged:
        in_specs.append(P(axis))
        out_specs.append(P())

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=tuple(out_specs),
        check_vma=False,
    )
    def run(reads_local, valid_local, *rest):
        dev = jax.lax.axis_index(axis)
        base = dev * m_local
        lens_local = rest[0] if ragged else None

        # --- local seed rows, globally numbered -------------------------
        k_hi, k_lo, packed, payload = build_seed_rows(
            reads_local, valid_local, s, geo, id_base=base,
            lengths=lens_local,
        )
        n_l = m_local * R
        rows = jnp.concatenate(
            [k_hi.reshape(n_l, 1), k_lo.reshape(n_l, 1),
             packed.reshape(n_l, 1), payload.reshape(n_l, Wt + 2)],
            axis=1,
        )
        # routing still hashes the key pair down to one owner word
        from sage2_tpu.overlap.detect import _mix32

        owner = (
            _mix32(k_hi.reshape(-1), k_lo.reshape(-1))
            % jnp.uint32(ndev)
        ).astype(jnp.int32)
        live = packed.reshape(-1) != _U32_MAX
        recv, recv_valid, ovf_rows = _route_rows(
            axis, owner, live, rows, row_cap, ndev
        )

        # --- fused join on the received rows ----------------------------
        r_hi = jnp.where(recv_valid, recv[:, 0], _U32_MAX)
        r_lo = jnp.where(recv_valid, recv[:, 1], _U32_MAX)
        r_pk = jnp.where(recv_valid, recv[:, 2], _U32_MAX)
        ok, ok_cont, cand_a, cand_b, ovl, total = fused_join_core(
            r_hi, r_lo, r_pk, recv[:, 3:], geo, L, join_cap,
            min_overlap,
        )
        ovf_join = total > join_cap

        # --- local reduce, then route edges to their src owner ----------
        k_src, k_dst, k_ovl, _n0, _nd = _reduce_fused(
            ok, cand_a, cand_b, ovl, L, M
        )
        e_valid = k_src != _I32_MAX
        e_owner = jnp.clip(k_src // m_local, 0, ndev - 1)
        erows = jnp.stack([k_src, k_dst, k_ovl], axis=1)
        recv_e, recv_e_valid, ovf_er = _route_rows(
            axis, e_owner, e_valid, erows, edge_cap, ndev
        )

        # --- final per-owner merge + dedup ------------------------------
        f_src, f_dst, f_ovl, n_local, _nd2 = _reduce_fused(
            recv_e_valid, recv_e[:, 0], recv_e[:, 1], recv_e[:, 2], L, M
        )
        ovf_edges = n_local > edge_cap

        n_edges = comm.psum(n_local, axis)
        overflow = comm.psum(
            (ovf_rows | ovf_join | ovf_er | ovf_edges).astype(jnp.int32),
            axis,
        ) > 0
        outs = [
            f_src[None, :edge_cap], f_dst[None, :edge_cap],
            f_ovl[None, :edge_cap], n_edges, overflow,
        ]
        if ragged:
            # containment marks: each hash owner flags the cand_b of its
            # verified containments; OR across owners via psum
            cont_l = (
                jnp.zeros(M + 1, jnp.int32)
                .at[jnp.where(ok_cont, cand_b, M)]
                .set(1, mode="drop")[:M]
            )
            outs.append(comm.psum(cont_l, axis) > 0)
        return tuple(outs)

    args = (reads2, valid2) + ((lengths,) if ragged else ())
    with comm.label('sharded_find_overlaps'):
        return run(*args)


def gather_edge_shards(
    src_sh, dst_sh, ovl_sh, n_edges
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """HOST-side concatenation of per-device edge shards into the
    globally sorted padded edge list (device order == src-range order).
    Host memory only — no device ever holds the global list."""
    import numpy as np

    src = np.asarray(src_sh).reshape(-1)
    dst = np.asarray(dst_sh).reshape(-1)
    ovl = np.asarray(ovl_sh).reshape(-1)
    keep = src != (2**31 - 1)
    n = int(n_edges)
    out_src = np.full(src.shape[0], 2**31 - 1, np.int32)
    out_dst = np.full(src.shape[0], 2**31 - 1, np.int32)
    out_ovl = np.zeros(src.shape[0], np.int32)
    out_src[:n] = src[keep]
    out_dst[:n] = dst[keep]
    out_ovl[:n] = ovl[keep]
    return out_src, out_dst, out_ovl


def gather_edge_shards_spill(store, src_sh, dst_sh, ovl_sh, n_edges):
    """gather_edge_shards into spill memmaps ``edges_*`` one device
    shard at a time: host RAM stays O(shard), not O(global edges).
    Device order == src-range order, so per-shard compacted runs
    concatenate into the globally sorted list; sentinel-padded to a
    2^14 grain (the streamed pipeline's edge-list format)."""
    import numpy as np

    writers = [store.writer(n, np.int32)
               for n in ("edges_src", "edges_dst", "edges_ovl")]
    total = 0
    for d in range(src_sh.shape[0]):
        s = np.asarray(src_sh[d])
        keep = s != (2**31 - 1)
        writers[0].append(s[keep])
        writers[1].append(np.asarray(dst_sh[d])[keep])
        writers[2].append(np.asarray(ovl_sh[d])[keep])
        total += int(keep.sum())
    assert total == int(n_edges), (total, int(n_edges))
    pad_to = max(1, -(-total // (1 << 14)) * (1 << 14))
    src = writers[0].close(pad_to=pad_to, fill=2**31 - 1)
    dst = writers[1].close(pad_to=pad_to, fill=2**31 - 1)
    ovl = writers[2].close(pad_to=pad_to, fill=0)
    return src, dst, ovl
