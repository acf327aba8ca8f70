"""Streaming x mesh composition: chunked sharded pipeline stages.

BASELINE.json config #4 (C. elegans, ~100M reads) needs BOTH scaling
mechanisms at once: inputs larger than one device's HBM (stream read
chunks host->device) AND a device mesh (shard the k-mer space / seed
hash space / edge ranges). Round 2 made them mutually exclusive; this
module composes them:

  * counting/correction — per chunk, each device routes its slice's
    canonical keys to hash owners (the same `_owner` partition as the
    in-core sharded stages); owners fold the received keys into a
    RUNNING per-owner count table (sort+segment merge, the chunked
    analog of stream._merge_tables). Correction then streams chunks
    through the two single-window sub-passes with routed lookups
    against the sharded table. Bit-identical to the in-core paths.
  * overlap detection — three phases. (A) per chunk, devices route the
    chunk's ENTRY seed rows (globally numbered) to 32-bit-hash owners,
    who accumulate them; (B) per chunk, devices route the chunk's QUERY
    rows to the same owners, each owner runs the fused join core over
    [all its entries + this chunk's queries], reduces, and routes
    verified edges to their src-range owner; (C) each src owner merges
    and dedups its accumulated edges. Every true overlap (a, b) is found
    exactly once because all of a's query rows live in a's chunk, and
    the final per-owner reduction equals the in-core longest-per-pair
    rule (tested bit-identical).

Per-device residency: O(global_seed_rows / ndev + chunk + capacities) —
reads live on host, one chunk on device at a time; no device ever holds
the global read set or edge list. Reference: SAGE2 distributes both the
read set and the k-mer space across MPI ranks (SURVEY.md §2 parallelism
table); this is the TPU composition of those two axes.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from sage2_tpu.parallel import comm
from sage2_tpu.utils import watchdog

from sage2_tpu.kmer.count import SENTINEL, KmerTable, count_from_keys
from sage2_tpu.kmer.correct import (
    apply_verdicts,
    variant_keys_first,
    variant_keys_last,
)
from sage2_tpu.ops import bitpack
from sage2_tpu.ops.sort import sort_by_keys, unique_sorted_pairs
from sage2_tpu.parallel.sharded import (
    _I32_MAX,
    _U32_MAX,
    _owner,
    _route,
    _route_rows,
    _sharded_lookup,
)


def _pad_chunk(arr: np.ndarray, rows: int) -> Tuple[np.ndarray, np.ndarray]:
    """Pad a host chunk to exactly ``rows`` rows; returns (padded, valid)."""
    n = arr.shape[0]
    valid = np.zeros(rows, bool)
    valid[:n] = True
    if n == rows:
        return arr, valid
    pad = np.repeat(arr[-1:], rows - n, axis=0)
    return np.concatenate([arr, pad], axis=0), valid


# --------------------------------------------------------------------------
# chunked sharded k-mer counting
# --------------------------------------------------------------------------


def _merge_sorted_local(run, part, table_cap: int):
    """Fold a freshly-counted partial table into the running local table.

    run/part: (hi, lo, count) sorted tables (padding = SENTINEL keys,
    zero counts). Returns ((hi, lo, count) truncated to table_cap,
    n_unique, overflow)."""
    hi = jnp.concatenate([run[0], part[0]])
    lo = jnp.concatenate([run[1], part[1]])
    ct = jnp.concatenate([run[2], part[2]])
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
    overflow = n_unique > table_cap
    return (
        (out_hi[:table_cap], out_lo[:table_cap],
         counts[:table_cap].astype(jnp.int32)),
        jnp.minimum(n_unique, table_cap), overflow,
    )


@functools.lru_cache(maxsize=8)
def _count_step(mesh: Mesh, k: int, route_cap: int, table_cap: int,
                ragged: bool = False):
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    in_specs = [P(axis, None), P(axis),
                P(axis, None), P(axis, None), P(axis, None)]
    if ragged:
        in_specs.append(P(axis))

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P(axis, None), P(axis, None),
                   P(axis), P()),
    )
    def step(chunk_local, valid_local, run_hi2, run_lo2, run_ct2, *rest):
        hi, lo = bitpack.canonical_kmer_keys(chunk_local, k)
        kvalid = jnp.broadcast_to(valid_local[:, None], hi.shape)
        if ragged:
            Pw = hi.shape[1]
            kvalid = kvalid & (
                jnp.arange(Pw)[None, :] < (rest[0][:, None] - (k - 1))
            )
        kvalid = kvalid.reshape(-1)
        fh = hi.reshape(-1)
        fl = lo.reshape(-1)
        routed = _route(
            axis, _owner(fh, fl, ndev), kvalid, (fh, fl), route_cap, ndev
        )
        r_hi, r_lo = routed.recv
        part = count_from_keys(
            r_hi.reshape(-1), r_lo.reshape(-1), k,
            valid=routed.recv_valid.reshape(-1),
        )
        merged, n_unique, ovf_t = _merge_sorted_local(
            (run_hi2.reshape(-1), run_lo2.reshape(-1), run_ct2.reshape(-1)),
            (part.hi, part.lo, part.count), table_cap,
        )
        overflow = comm.psum(
            (routed.overflow | ovf_t).astype(jnp.int32), axis
        ) > 0
        return (
            merged[0][None], merged[1][None], merged[2][None],
            n_unique[None], overflow,
        )

    return step


def _chunk_lens(lengths, i: int, rows: int) -> jnp.ndarray:
    lc = np.zeros(rows, np.int32)
    seg = np.asarray(lengths[i : i + rows], np.int32)
    lc[: seg.shape[0]] = seg
    return jnp.asarray(lc)


def sharded_count_kmers_chunked(
    mesh: Mesh,
    reads: np.ndarray,
    k: int,
    chunk_reads: int,
    route_cap: int,
    table_cap: int,
    lengths: np.ndarray | None = None,
) -> Tuple[KmerTable, bool]:
    """Exact canonical counting of host-resident reads, streamed in
    chunks over the mesh. Returns the hash-partitioned sharded table
    ((ndev, table_cap) arrays, same layout as sharded_count_kmers) and
    a host overflow flag. ``lengths``: ragged (0-padded) reads — windows
    past a read's end are masked out."""
    ndev = mesh.devices.size
    N = reads.shape[0]
    rows = min(chunk_reads, N)
    rows += (-rows) % ndev
    ragged = lengths is not None
    step = _count_step(mesh, k, route_cap, table_cap, ragged)
    hi = jnp.full((ndev, table_cap), SENTINEL)
    lo = jnp.full((ndev, table_cap), SENTINEL)
    ct = jnp.zeros((ndev, table_cap), jnp.int32)
    n_unique = jnp.zeros((ndev,), jnp.int32)
    overflow = False
    for i in range(0, N, rows):
        watchdog.touch(f"sharded chunk {i}")
        chunk, valid = _pad_chunk(
            reads[i : i + rows].astype(np.int32), rows
        )
        extra = (_chunk_lens(lengths, i, rows),) if ragged else ()
        with comm.label("sharded_count_chunked"):
            hi, lo, ct, n_unique, ovf = step(
                jnp.asarray(chunk), jnp.asarray(valid), hi, lo, ct,
                *extra
            )
        if bool(ovf):
            # fail FAST: a capacity overflow dooms the whole pass, and
            # the caller's retry restarts from scratch — finishing the
            # remaining chunks would only burn wall-clock
            return KmerTable(hi, lo, ct, n_unique, k), True
    return KmerTable(hi, lo, ct, n_unique, k), overflow


# --------------------------------------------------------------------------
# chunked sharded spectrum correction
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _correct_step(mesh: Mesh, k: int, threshold: int, query_cap: int,
                  ragged: bool = False, rule: str = "single_window"):
    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    in_specs = [P(axis, None), P(axis),
                P(axis, None), P(axis, None), P(axis, None), P(axis)]
    if ragged:
        in_specs.append(P(axis))

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None), P()),
    )
    def step(chunk_local, valid_local, t_hi2, t_lo2, t_ct2, t_nu, *rest):
        table = KmerTable(
            t_hi2.reshape(-1), t_lo2.reshape(-1), t_ct2.reshape(-1),
            t_nu.reshape(()), k,
        )
        r = chunk_local
        lens_local = rest[0] if ragged else None
        wvalid = None
        if ragged:
            Pw = r.shape[1] - k + 1
            wvalid = jnp.arange(Pw)[None, :] < (
                lens_local[:, None] - (k - 1)
            )
        any_ovf = jnp.zeros((), bool)
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
            any_ovf |= ovf_acc[0]
        else:
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
                any_ovf |= ovf
                counts4 = jnp.moveaxis(counts, 0, -1)
                r = apply_verdicts(r, counts4, cur, off, threshold,
                                   window_valid=wvalid)
        r = jnp.where(valid_local[:, None], r, chunk_local)
        return r, any_ovf

    return step


def sharded_correct_reads_chunked(
    mesh: Mesh,
    reads: np.ndarray,
    k: int,
    threshold: int,
    rounds: int,
    chunk_reads: int,
    route_cap: int,
    query_cap: int,
    table_cap: int,
    lengths: np.ndarray | None = None,
    rule: str = "single_window",
    out: np.ndarray | None = None,
) -> Tuple[np.ndarray, bool]:
    """Streamed sharded correction: per round, the global sharded table
    is rebuilt by chunked routed counting, then every chunk applies the
    configured rule (single-window sub-passes or covering-window
    voting) with routed lookups. Bit-identical to kmer.correct_reads /
    stream.correct_reads_chunked with the same rule (tested).
    ``lengths``: ragged (0-padded) reads. ``out``: optional
    preallocated (N, L) int8 destination (e.g. a spill memmap) filled
    chunk by chunk — peak host RAM then stays O(chunk)."""
    ndev = mesh.devices.size
    N = reads.shape[0]
    if out is None:
        out = np.array(reads, dtype=np.int8, copy=True)
    else:
        assert out.shape == reads.shape and out.dtype == np.int8
        for i in range(0, N, chunk_reads):
            watchdog.touch(f"sharded chunk {i}")
            out[i : i + chunk_reads] = reads[i : i + chunk_reads]
    rows = min(chunk_reads, N)
    rows += (-rows) % ndev
    ragged = lengths is not None
    step = _correct_step(mesh, k, threshold, query_cap, ragged, rule)
    overflow = False
    for _ in range(rounds):
        table, ovf = sharded_count_kmers_chunked(
            mesh, out, k, chunk_reads, route_cap, table_cap,
            lengths=lengths,
        )
        if ovf:
            return out, True    # fail fast: the pass is doomed anyway
        for i in range(0, N, rows):
            watchdog.touch(f"sharded chunk {i}")
            chunk, valid = _pad_chunk(
                out[i : i + rows].astype(np.int32), rows
            )
            extra = (_chunk_lens(lengths, i, rows),) if ragged else ()
            with comm.label("sharded_correct_chunked"):
                corrected, ovf = step(
                    jnp.asarray(chunk), jnp.asarray(valid),
                    table.hi, table.lo, table.count,
                    table.n_unique, *extra,
                )
            if bool(ovf):
                return out, True
            nc = min(i + rows, N) - i
            out[i : i + rows] = np.asarray(corrected, np.int8)[:nc]
    return out, overflow


# --------------------------------------------------------------------------
# chunked sharded overlap detection
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=8)
def _entry_step(mesh: Mesh, min_overlap: int, seed_len: int, L: int,
                rows_local: int, row_cap: int, ragged: bool = False):
    from sage2_tpu.overlap.detect import (
        _mix32,
        build_seed_rows,
        join_geometry,
    )

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    s = min(seed_len, min_overlap, 32)
    geo = join_geometry(L, min_overlap, s)
    g, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt
    in_specs = [P(axis, None), P(axis), P()]
    if ragged:
        in_specs.append(P(axis))

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=tuple(in_specs),
        out_specs=(P(axis, None, None), P()),
        check_vma=False,
    )
    def step(chunk_local, valid_local, base, *rest):
        dev = jax.lax.axis_index(axis)
        id_base = base + (dev * rows_local).astype(jnp.uint32)
        k_hi, k_lo, packed, payload = build_seed_rows(
            chunk_local, valid_local, s, geo, id_base=id_base,
            lengths=rest[0] if ragged else None,
        )
        m = chunk_local.shape[0]
        rows = jnp.concatenate(
            [k_hi[:, :g].reshape(m * g, 1),
             k_lo[:, :g].reshape(m * g, 1),
             packed[:, :g].reshape(m * g, 1),
             payload[:, :g].reshape(m * g, Wt + 2)], axis=1,
        )
        hh = _mix32(k_hi[:, :g].reshape(-1), k_lo[:, :g].reshape(-1))
        live = packed[:, :g].reshape(-1) != _U32_MAX
        owner = (hh % jnp.uint32(ndev)).astype(jnp.int32)
        recv, recv_valid, ovf = _route_rows(
            axis, owner, live, rows, row_cap, ndev
        )
        # invalid slots carry dead keys + the packed sentinel so they
        # never join
        dead = ~recv_valid
        recv = recv.at[:, 0].set(jnp.where(dead, _U32_MAX, recv[:, 0]))
        recv = recv.at[:, 1].set(jnp.where(dead, _U32_MAX, recv[:, 1]))
        recv = recv.at[:, 2].set(jnp.where(dead, _U32_MAX, recv[:, 2]))
        overflow = comm.psum(ovf.astype(jnp.int32), axis) > 0
        return recv[None], overflow

    return step


@functools.lru_cache(maxsize=8)
def _query_step(mesh: Mesh, min_overlap: int, seed_len: int, L: int,
                rows_local: int, q_cap: int, join_cap: int,
                edge_chunk_cap: int, v_d: int, m_total: int,
                ragged: bool = False):
    from sage2_tpu.overlap.detect import (
        _mix32,
        _reduce_fused,
        build_seed_rows,
        fused_join_core,
        join_geometry,
    )

    axis = mesh.axis_names[0]
    ndev = mesh.devices.size
    s = min(seed_len, min_overlap, 32)
    geo = join_geometry(L, min_overlap, s)
    g, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt
    in_specs = [P(axis, None, None), P(axis, None), P(axis), P()]
    out_specs = [P(axis, None, None), P()]
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
    def step(entries, chunk_local, valid_local, base, *rest):
        dev = jax.lax.axis_index(axis)
        id_base = base + (dev * rows_local).astype(jnp.uint32)
        k_hi, k_lo, packed, payload = build_seed_rows(
            chunk_local, valid_local, s, geo, id_base=id_base,
            lengths=rest[0] if ragged else None,
        )
        m = chunk_local.shape[0]
        q_rows = jnp.concatenate(
            [k_hi[:, g:].reshape(m * n_pos, 1),
             k_lo[:, g:].reshape(m * n_pos, 1),
             packed[:, g:].reshape(m * n_pos, 1),
             payload[:, g:].reshape(m * n_pos, Wt + 2)], axis=1,
        )
        hh = _mix32(k_hi[:, g:].reshape(-1), k_lo[:, g:].reshape(-1))
        live_q = packed[:, g:].reshape(-1) != _U32_MAX
        owner = (hh % jnp.uint32(ndev)).astype(jnp.int32)
        recv_q, recv_qv, ovf_q = _route_rows(
            axis, owner, live_q, q_rows, q_cap, ndev
        )
        ent = entries.reshape(-1, entries.shape[-1])
        dead_q = ~recv_qv
        hi_all = jnp.concatenate([
            ent[:, 0], jnp.where(dead_q, _U32_MAX, recv_q[:, 0])
        ])
        lo_all = jnp.concatenate([
            ent[:, 1], jnp.where(dead_q, _U32_MAX, recv_q[:, 1])
        ])
        p_all = jnp.concatenate([
            ent[:, 2], jnp.where(dead_q, _U32_MAX, recv_q[:, 2])
        ])
        pay_all = jnp.concatenate([ent[:, 3:], recv_q[:, 3:]], axis=0)
        ok, ok_cont, cand_a, cand_b, ovl, total = fused_join_core(
            hi_all, lo_all, p_all, pay_all, geo, L, join_cap,
            min_overlap,
        )
        ovf_join = total > join_cap
        k_src, k_dst, k_ovl, _n0, _nd = _reduce_fused(
            ok, cand_a, cand_b, ovl, L, m_total
        )
        e_valid = k_src != _I32_MAX
        e_owner = jnp.clip(k_src // v_d, 0, ndev - 1)
        erows = jnp.stack([k_src, k_dst, k_ovl], axis=1)
        recv_e, recv_ev, ovf_e = _route_rows(
            axis, e_owner, e_valid, erows, edge_chunk_cap, ndev
        )
        recv_e = jnp.where(
            recv_ev[:, None], recv_e,
            jnp.asarray([_I32_MAX, _I32_MAX, 0], jnp.int32)[None, :],
        )
        overflow = comm.psum(
            (ovf_q | ovf_join | ovf_e).astype(jnp.int32), axis
        ) > 0
        outs = [recv_e[None], overflow]
        if ragged:
            cont_l = (
                jnp.zeros(m_total + 1, jnp.int32)
                .at[jnp.where(ok_cont, cand_b, m_total)]
                .set(1, mode="drop")[:m_total]
            )
            outs.append(comm.psum(cont_l, axis) > 0)
        return tuple(outs)

    return step


@functools.lru_cache(maxsize=8)
def _merge_edges_step(mesh: Mesh, L: int, m_total: int, edge_cap: int):
    from sage2_tpu.overlap.detect import _reduce_fused

    axis = mesh.axis_names[0]

    @jax.jit
    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None, None),),
        out_specs=(P(axis, None), P(axis, None), P(axis, None), P(), P()),
        check_vma=False,
    )
    def step(edges3):
        e = edges3.reshape(-1, 3)
        valid = e[:, 0] != _I32_MAX
        f_src, f_dst, f_ovl, n_local, _nd2 = _reduce_fused(
            valid, e[:, 0], e[:, 1], e[:, 2], L, m_total
        )
        ovf = n_local > edge_cap
        n_edges = comm.psum(n_local, axis)
        overflow = comm.psum(ovf.astype(jnp.int32), axis) > 0
        return (
            f_src[None, :edge_cap], f_dst[None, :edge_cap],
            f_ovl[None, :edge_cap], n_edges, overflow,
        )

    return step


def sharded_find_overlaps_chunked(
    mesh: Mesh,
    reads2: np.ndarray,
    valid2: np.ndarray,
    min_overlap: int,
    seed_len: int,
    chunk_reads: int,
    row_cap: int,
    q_cap: int,
    join_cap: int,
    edge_chunk_cap: int,
    edge_cap: int,
    lengths: np.ndarray | None = None,
) -> Tuple:
    """Streamed sharded overlap detection over host-resident reads.

    Returns (src_sh, dst_sh, ovl_sh, n_edges, overflow): per-device
    (ndev, edge_cap) DEVICE shards partitioned by src range with the
    same layout/contract as sharded_find_overlaps — they chain straight
    into the sharded reduction. Device residency is bounded by the
    accumulated per-owner entry rows (O(global_rows / ndev) — the
    distributed seed table) plus ONE chunk's rows and capacities; reads
    stream from host per chunk. With ``lengths`` (ragged, (M,) per-row)
    a host (M,) ``contained`` bool is appended (verified containments,
    OR-accumulated across chunks and hash owners).
    """
    from sage2_tpu.overlap.detect import join_geometry

    ndev = mesh.devices.size
    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    geo = join_geometry(L, min_overlap, s)
    if M * geo.R >= (1 << 31) - 1:
        raise ValueError(f"global seed rows {M * geo.R} overflow 31-bit ids")
    v_d = -(-M // ndev)
    rows = min(chunk_reads, M)
    rows += (-rows) % ndev
    rows_local = rows // ndev
    ragged = lengths is not None

    def chunk_args(i):
        chunk, cvalid = _pad_chunk(
            reads2[i : i + rows].astype(np.int32), rows
        )
        cvalid &= np.concatenate([
            np.asarray(valid2[i : i + rows]),
            np.zeros(rows - min(i + rows, M) + i, bool),
        ])
        extra = (_chunk_lens(lengths, i, rows),) if ragged else ()
        return (jnp.asarray(chunk), jnp.asarray(cvalid),
                jnp.uint32(i)) + extra

    ent_step = _entry_step(mesh, min_overlap, seed_len, L, rows_local,
                           row_cap, ragged)
    overflow = False
    ent_parts = []
    for i in range(0, M, rows):
        watchdog.touch(f"sharded chunk {i}")
        with comm.label("sharded_overlap_entry_chunked"):
            part, ovf = ent_step(*chunk_args(i))
        overflow = overflow or bool(ovf)
        ent_parts.append(part)
    entries = (
        jnp.concatenate(ent_parts, axis=1) if len(ent_parts) > 1
        else ent_parts[0]
    )
    del ent_parts

    q_step = _query_step(mesh, min_overlap, seed_len, L, rows_local,
                         q_cap, join_cap, edge_chunk_cap, v_d, M, ragged)
    edge_parts = []
    contained = np.zeros(M, bool) if ragged else None
    for i in range(0, M, rows):
        watchdog.touch(f"sharded chunk {i}")
        args = chunk_args(i)
        with comm.label("sharded_overlap_query_chunked"):
            out = q_step(entries, *args)
        part, ovf = out[0], out[1]
        overflow = overflow or bool(ovf)
        if ragged:
            contained |= np.asarray(out[2])
        edge_parts.append(part)
    edges3 = (
        jnp.concatenate(edge_parts, axis=1) if len(edge_parts) > 1
        else edge_parts[0]
    )
    del edge_parts

    m_step = _merge_edges_step(mesh, L, M, edge_cap)
    with comm.label("sharded_overlap_merge"):
        src_sh, dst_sh, ovl_sh, n_edges, ovf = m_step(edges3)
    overflow = overflow or bool(ovf)
    base = (src_sh, dst_sh, ovl_sh, int(n_edges), overflow)
    return base + ((contained,) if ragged else ())
