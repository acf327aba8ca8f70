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

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

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


# --------------------------------------------------------------------------
# chunked reduction for expansion totals beyond device memory
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnums=(3, 4))
def _reduce_prep(src, dst, ovl, n_vertices: int, fixed_len: int | None,
                 lens=None):
    """Adjacency views + per-edge expansion counts (E-sized, cheap)."""
    E = src.shape[0]
    V = n_vertices
    is_edge = src != _I32_MAX
    if fixed_len is not None:
        src_len = fixed_len
    else:
        src_len = lens[jnp.clip(src, 0, V - 1)]
    sl = jnp.where(is_edge, src_len - ovl, _I32_MAX)
    ss_src, ss_sl, ss_dst = sort_by_keys([src, sl], [dst])
    u = lambda x: x.astype(jnp.uint32)
    start = lex_searchsorted(
        u(ss_src), u(ss_sl), u(jnp.arange(V, dtype=jnp.int32)),
        jnp.zeros(V, jnp.uint32), side="left",
    )
    seg = jnp.where(is_edge, src, V)
    maxsl = jax.ops.segment_max(
        jnp.where(is_edge, sl, -1), jnp.minimum(seg, V), num_segments=V + 1
    )[:V]
    maxsl = jnp.maximum(maxsl, -1)
    w = jnp.where(is_edge, dst, 0)
    bound = jnp.where(is_edge, maxsl[jnp.minimum(src, V - 1)] - sl, -1)
    upto = lex_searchsorted(u(ss_src), u(ss_sl), u(w), u(bound), side="right")
    counts = jnp.where(is_edge & (bound >= 0), upto - start[w], 0)
    return ss_src, ss_sl, ss_dst, start, counts, sl


def _reduce_prep_host(src, dst, ovl, n_vertices: int, read_len):
    """_reduce_prep computed in numpy — identical outputs.

    The 84.5M-edge (src, sl) device sort crashed the real-TPU worker at
    E. coli scale (round-2 e2e run); host lexsort + searchsorted cost a
    few seconds at this size and keep the per-chunk expansion/probe
    kernels on device.
    """
    I32 = 2**31 - 1
    src_np = np.asarray(src)
    dst_np = np.asarray(dst)
    ovl_np = np.asarray(ovl)
    E = src_np.shape[0]
    V = n_vertices
    is_edge = src_np != I32
    if isinstance(read_len, int):
        src_len = read_len
    else:
        lens = np.asarray(read_len)
        src_len = lens[np.clip(src_np, 0, V - 1)]
    sl = np.where(is_edge, src_len - ovl_np, I32).astype(np.int64)
    # ONE combined-key argsort (src<<32 | sl): a single introsort pass
    # beats lexsort's two stable passes at this size, and the sorted key
    # array is needed for the searchsorteds anyway
    key0 = (src_np.astype(np.int64) << np.int64(32)) | sl
    order = np.argsort(key0, kind="stable")
    key = key0[order]
    ss_src = src_np[order]
    ss_sl = sl[order]
    ss_dst = dst_np[order]
    start = np.searchsorted(
        key, np.arange(V, dtype=np.int64) << np.int64(32), side="left"
    ).astype(np.int32)
    # per-src max sl = LAST element of each src run (sl ascends within a
    # run) — np.maximum.at on 84.5M edges was a reduce-stage hotspot
    s_end = np.searchsorted(
        key, (np.arange(V, dtype=np.int64) + 1) << np.int64(32),
        side="left",
    )
    maxsl = np.full(V, -1, np.int64)
    nz = s_end > start
    maxsl[nz] = ss_sl[s_end[nz] - 1]
    # a src run may end with I32 sentinels? no: sentinel rows have
    # src == I32_MAX and sort past every real vertex key
    w = np.where(is_edge, dst_np, 0)
    bound = np.where(is_edge, maxsl[np.clip(src_np, 0, V - 1)] - sl, -1)
    q = (w.astype(np.int64) << np.int64(32)) | np.maximum(bound, 0)
    upto = np.searchsorted(key, q, side="right").astype(np.int64)
    counts = np.where(
        is_edge & (bound >= 0), upto - start[w], 0
    ).astype(np.int32)
    return (
        jnp.asarray(ss_src), jnp.asarray(ss_sl.astype(np.int32)),
        jnp.asarray(ss_dst), jnp.asarray(start), counts,
        jnp.asarray(sl.astype(np.int32)),
    )


def transitive_reduction_chunked(
    src: jnp.ndarray,
    dst: jnp.ndarray,
    ovl: jnp.ndarray,
    n_vertices: int,
    read_len,
    chunk_cap: int = 1 << 24,
    max_chunk_doublings: int = 6,
    host_prep: bool | None = None,
) -> ReducedGraph:
    """Exact Myers reduction for dense graphs whose length-2-path
    expansion exceeds device memory (e.g. 50x-coverage string graphs:
    ~12 expansions/edge x tens of millions of edges).

    The edge list is processed in fixed-width slices; each slice expands
    against the GLOBAL adjacency (O(E) device residency) into at most
    ``chunk_cap`` candidates, probes membership, and contributes its
    removal marks, which accumulate on host. Semantics identical to
    transitive_reduction (removal defined on the original edge set);
    slices whose exact expansion total exceeds chunk_cap trigger a
    host-level retry with twice as many slices. ``host_prep`` (default:
    when E > 2^25) computes the adjacency sort/counts in numpy — device
    sorts at that operand size crashed the TPU worker.
    """
    E = src.shape[0]
    V = n_vertices
    if isinstance(read_len, int):
        fixed, lens = read_len, None
    else:
        fixed, lens = None, jnp.asarray(read_len)
    if host_prep is None:
        host_prep = E > (1 << 25)
    if host_prep:
        # host-first ordering: callers should pass HOST arrays at this
        # scale (the pipeline does) — prep reads them in place, and the
        # device copies are created exactly once below; uploading first
        # and downloading for prep doubled the relay transfers
        src_np = np.asarray(src)
        dst_np = np.asarray(dst)
        ovl_np = np.asarray(ovl)
        ss_src, ss_sl, ss_dst, start, counts_np, sl = _reduce_prep_host(
            src_np, dst_np, ovl_np, V, read_len
        )
        counts = jnp.asarray(counts_np)
        src = jnp.asarray(src_np)
        dst = jnp.asarray(dst_np)
        ovl = jnp.asarray(ovl_np)
        # membership-probe run table: first edge of each vertex in the
        # (src, dst)-sorted main list
        startd_np = np.searchsorted(
            src_np, np.arange(V + 1, dtype=src_np.dtype), side="left"
        ).astype(np.int32)
        max_deg = int(np.diff(startd_np).max(initial=1))
        startd = jnp.asarray(startd_np)
    else:
        src = jnp.asarray(src)
        dst = jnp.asarray(dst)
        ovl = jnp.asarray(ovl)
        src_np = np.asarray(src)
        dst_np = np.asarray(dst)
        ovl_np = np.asarray(ovl)
        ss_src, ss_sl, ss_dst, start, counts, sl = _reduce_prep(
            src, dst, ovl, V, fixed, lens
        )
        counts_np = np.asarray(counts)
        startd = jnp.searchsorted(
            src, jnp.arange(V + 1, dtype=src.dtype), side="left"
        ).astype(jnp.int32)
        max_deg = max(1, int(jnp.max(jnp.diff(startd))))
    # bounded bisection step count: each probe searches only its
    # vertex's out-run (<= max_deg entries, dst-sorted)
    steps = max(1, int(max_deg).bit_length())
    total = int(counts_np.sum())
    # size the kernel to the problem: a tiny graph must not compile (and
    # allocate) a full chunk_cap-wide expansion
    grain = 1 << 14
    chunk_cap = min(chunk_cap, max(grain, -(-total // grain) * grain))
    n_chunks = max(1, -(-total // chunk_cap))
    for _ in range(max_chunk_doublings):
        e_c = -(-E // n_chunks)
        sums = [int(counts_np[i : i + e_c].sum())
                for i in range(0, E, e_c)]
        if max(sums) <= chunk_cap:
            break
        n_chunks *= 2
    else:
        raise ValueError(
            f"cannot balance expansion {total} into chunks of {chunk_cap}"
        )
    e_c = -(-E // n_chunks)

    if fixed is not None:
        probe_len_all = None
    else:
        probe_len_all = lens[jnp.clip(src, 0, V - 1)]

    # removal marks accumulate ON DEVICE: a per-chunk (E,) readback cost
    # ~5 GB of relay transfers at E. coli scale (58 chunks x 84.5 MB) and
    # dominated the round-3 e2e reduce stage; one readback at the end
    removed_dev = jnp.zeros(E, bool)
    totals = []
    kernel = _chunk_kernel(E, e_c, chunk_cap, fixed, steps)
    for i in range(0, E, e_c):
        c_slice = slice(i, i + e_c)
        pad = e_c - (min(i + e_c, E) - i)
        def padded(a, fill):
            seg = a[c_slice]
            if pad:
                seg = jnp.concatenate(
                    [seg, jnp.full((pad,), fill, seg.dtype)]
                )
            return seg
        c_src = padded(src, _I32_MAX)
        c_dst = padded(dst, 0)
        c_sl = padded(sl, _I32_MAX)
        c_counts = padded(counts, 0)
        c_plen = (
            jnp.zeros((), jnp.int32) if fixed is not None
            else padded(probe_len_all, 0)
        )
        removed_dev, tot = kernel(
            removed_dev, c_src, c_dst, c_sl, c_counts, c_plen,
            src, dst, ovl, ss_sl, ss_dst, start, startd,
        )
        totals.append(tot)
    # ONE batched capacity validation after the loop (per-chunk scalar
    # readbacks would serialize the pipeline on the relay round trip)
    for tot in totals:
        assert int(tot) <= chunk_cap
    removed_np = np.asarray(removed_dev)

    keep = (src_np != 2**31 - 1) & ~removed_np
    o_src = np.where(keep, src_np, 2**31 - 1).astype(np.int32)
    o_dst = np.where(keep, dst_np, 2**31 - 1).astype(np.int32)
    o_ovl = np.where(keep, ovl_np, 0).astype(np.int32)
    order = np.lexsort((o_dst, o_src))
    n_edges = int(keep.sum())
    return ReducedGraph(
        jnp.asarray(o_src[order]), jnp.asarray(o_dst[order]),
        jnp.asarray(o_ovl[order]), jnp.asarray(n_edges),
        jnp.asarray(total), jnp.asarray(False),
    )


def transitive_reduction_native(
    src,
    dst,
    ovl,
    n_vertices: int,
    read_len,
    n_threads: int | None = None,
) -> ReducedGraph | None:
    """Myers reduction on host via the native C++ backend
    (csrc/reduce_host.cpp) — identical semantics and output layout to
    transitive_reduction_chunked, zero device transfers.

    Returns None when the native library is unavailable (no toolchain);
    callers fall back to the device kernels.
    """
    from sage2_tpu.graph import reduce_native

    src_np = np.ascontiguousarray(np.asarray(src), np.int32)
    dst_np = np.ascontiguousarray(np.asarray(dst), np.int32)
    ovl_np = np.ascontiguousarray(np.asarray(ovl), np.int32)
    if isinstance(read_len, (int, np.integer)):
        rl = int(read_len)
    else:
        rl = np.asarray(read_len, np.int32)
    out = reduce_native.reduce_marks(
        src_np, dst_np, ovl_np, n_vertices, rl, n_threads=n_threads
    )
    if out is None:
        return None
    removed, total = out
    E = src_np.shape[0]
    keep = (src_np != 2**31 - 1) & ~removed
    n_edges = int(keep.sum())
    # identical to the chunked path's lexsort((dst, src)) with removed
    # rows sentinel'd: kept rows are already (src, dst)-sorted, padding
    # rows (I32_MAX, I32_MAX, 0) all sort to the tail
    pad = E - n_edges
    o_src = np.concatenate(
        [src_np[keep], np.full(pad, 2**31 - 1, np.int32)]
    )
    o_dst = np.concatenate(
        [dst_np[keep], np.full(pad, 2**31 - 1, np.int32)]
    )
    o_ovl = np.concatenate([ovl_np[keep], np.zeros(pad, np.int32)])
    return ReducedGraph(
        o_src, o_dst, o_ovl, np.int32(n_edges), np.int64(total),
        np.bool_(False),
    )


def transitive_reduction_spill(
    store,
    src: np.ndarray,
    dst: np.ndarray,
    ovl: np.ndarray,
    n_vertices: int,
    read_len,
    n_threads: int | None = None,
    window: int = 1 << 22,
) -> ReducedGraph | None:
    """Native reduction with O(window) host RAM: marks land in a spill
    memmap and the kept edges are compacted window-by-window into
    ``reduced_src``/``reduced_dst``/``reduced_ovl`` spill files
    (VERDICT round-3 #4). Identical edge output to
    transitive_reduction_native up to tail-padding length (padded to a
    2^14 grain above n_edges instead of the input capacity). Returns
    None when the native backend is unavailable.
    """
    from sage2_tpu.graph import reduce_native

    src = np.ascontiguousarray(src, np.int32)
    dst = np.ascontiguousarray(dst, np.int32)
    ovl = np.ascontiguousarray(ovl, np.int32)
    E = src.shape[0]
    marks = store.empty("reduce_marks", np.uint8, (E,))
    if isinstance(read_len, (int, np.integer)):
        rl = int(read_len)
    else:
        rl = np.asarray(read_len, np.int32)
    out = reduce_native.reduce_marks(
        src, dst, ovl, n_vertices, rl, n_threads=n_threads,
        removed_out=marks,
    )
    if out is None:
        return None
    _, total = out
    writers = [store.writer(n, np.int32)
               for n in ("reduced_src", "reduced_dst", "reduced_ovl")]
    n_edges = 0
    for w0 in range(0, E, window):
        s = src[w0 : w0 + window]
        keep = (s != 2**31 - 1) & (marks[w0 : w0 + window] == 0)
        n_edges += int(keep.sum())
        writers[0].append(s[keep])
        writers[1].append(dst[w0 : w0 + window][keep])
        writers[2].append(ovl[w0 : w0 + window][keep])
    pad_to = max(1, -(-n_edges // (1 << 14)) * (1 << 14))
    o_src = writers[0].close(pad_to=pad_to, fill=2**31 - 1)
    o_dst = writers[1].close(pad_to=pad_to, fill=2**31 - 1)
    o_ovl = writers[2].close(pad_to=pad_to, fill=0)
    return ReducedGraph(
        o_src, o_dst, o_ovl, np.int32(n_edges), np.int64(total),
        np.bool_(False),
    )


def transitive_reduction_auto(
    src,
    dst,
    ovl,
    n_vertices: int,
    read_len,
    chunk_cap: int = 1 << 24,
    backend: str = "auto",
    n_threads: int | None = None,
) -> ReducedGraph:
    """Backend dispatcher for the single-device reduction stage.

    ``backend``:
      * "auto" — native C++ whenever the edge list is host-resident:
        feeding host arrays to the device kernels pays O(E) transfers
        plus dispatch floors for a memory-bound irregular walk, while
        the native path's only fixed cost is thread spawn (~ms), so the
        host backend wins at every host-resident size (measured
        scripts/probe_reduce_native.py: ~0.1-0.4 us/edge end to end vs
        a >30 ms device dispatch floor — break-even near 1e5 edges,
        below which both are instant anyway). Device arrays stay on
        device.
      * "native" — force the host backend (error if no toolchain).
      * "device" — force the device kernels (in-core or exact chunked).

    ``n_threads``: worker threads for the native backend (default: all
    cores).
    """
    if backend not in ("auto", "native", "device"):
        raise ValueError(f"unknown reduce backend: {backend!r}")
    host_resident = isinstance(src, np.ndarray)
    use_native = backend == "native" or (
        backend == "auto" and host_resident
    )
    if use_native:
        red = transitive_reduction_native(src, dst, ovl, n_vertices,
                                          read_len, n_threads=n_threads)
        if red is not None:
            return red
        if backend == "native":
            raise RuntimeError(
                "reduce backend 'native' requested but the C++ library "
                "could not be built (see stderr)"
            )
    return transitive_reduction_chunked(
        src, dst, ovl, n_vertices, read_len, chunk_cap=chunk_cap
    )


@functools.lru_cache(maxsize=8)
def _chunk_kernel(E: int, e_c: int, cand_cap: int, fixed_len, steps: int):
    @functools.partial(jax.jit, donate_argnums=(0,))
    def run(removed_acc, c_src, c_dst, c_sl, c_counts, c_plen,
            src, dst, ovl, ss_sl, ss_dst, start, startd):
        V = start.shape[0]
        total = jnp.sum(c_counts)
        e1, rank, valid = expand_by_counts(c_counts, cand_cap)
        e2 = jnp.minimum(
            start[jnp.clip(c_dst[e1], 0, V - 1)] + rank, E - 1
        )
        v = c_src[e1]
        x = ss_dst[e2]
        sls = c_sl[e1] + ss_sl[e2]
        valid = valid & (x != v)
        # membership probe: bounded lower_bound over v's out-run in the
        # (src, dst)-sorted list — src is constant inside the run, so
        # each bisection step is ONE dst gather; a global lexicographic
        # binary search cost 31 steps x 2 gathers per candidate and
        # dominated the E. coli-scale reduce kernels
        vc = jnp.clip(v, 0, V - 1)
        lo = startd[vc]
        hi = startd[vc + 1]
        hi0 = hi
        for _ in range(steps):
            active = lo < hi
            mid = (lo + hi) >> 1
            dmid = dst[jnp.minimum(mid, E - 1)]
            go_right = dmid < x
            lo = jnp.where(active & go_right, mid + 1, lo)
            hi = jnp.where(active & ~go_right, mid, hi)
        pos_c = jnp.minimum(lo, E - 1)
        plen = fixed_len if fixed_len is not None else c_plen[e1]
        hit = valid & (lo < hi0) & (dst[pos_c] == x) & (
            plen - ovl[pos_c] == sls
        )
        removed = (
            removed_acc
            .at[jnp.where(hit, pos_c, E)]
            .set(True, mode="drop")
        )
        return removed, total

    return run
