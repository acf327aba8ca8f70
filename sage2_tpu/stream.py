"""Chunked (streaming) stage variants for inputs larger than HBM.

SURVEY.md §7 "Datasets larger than HBM": read shards stream host->device
per stage; per-chunk partial results merge through the same sort-reduce
machinery as the in-core paths, so results are bit-identical to the
unchunked functions (tested). The stage-artifact checkpoints double as
the spill mechanism between stages.
"""

from __future__ import annotations

import functools
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from sage2_tpu.kmer.count import SENTINEL, KmerTable, count_from_keys
from sage2_tpu.kmer.correct import correct_reads
from sage2_tpu.ops import bitpack
from sage2_tpu.utils import watchdog
from sage2_tpu.ops.sort import (
    expand_with_payload,
    sort_by_keys,
    unique_sorted_pairs,
)


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
    reads: np.ndarray, k: int, chunk_reads: int,
    lengths: Optional[np.ndarray] = None,
) -> KmerTable:
    """Exact canonical k-mer counting over host-resident reads, streamed
    to the device in chunks of ``chunk_reads``. Device memory is bounded
    by one chunk plus the (unique-key) merged table. ``lengths``: ragged
    (0-padded) reads — windows past a read's end are masked out."""
    N = reads.shape[0]
    table: Optional[KmerTable] = None
    for i in range(0, N, chunk_reads):
        watchdog.touch(f"count chunk {i}/{N}")
        raw = reads[i : i + chunk_reads]
        nc = raw.shape[0]
        # pad the tail chunk to the common shape (one jit cache entry for
        # all chunks); padded rows are masked out of the count
        pad = chunk_reads - nc if N > chunk_reads else 0
        if pad:
            raw = np.concatenate([raw, np.repeat(raw[-1:], pad, axis=0)])
        chunk = jnp.asarray(raw.astype(np.int32))
        hi, lo = bitpack.canonical_kmer_keys(chunk, k)
        valid = None
        if pad or lengths is not None:
            P = hi.shape[1]
            rowmask = jnp.arange(chunk.shape[0]) < nc
            if lengths is not None:
                lens_c = np.zeros(chunk.shape[0], np.int32)
                lens_c[:nc] = lengths[i : i + chunk_reads]
                wmask = jnp.arange(P)[None, :] < (
                    jnp.asarray(lens_c)[:, None] - (k - 1)
                )
                valid = (rowmask[:, None] & wmask).reshape(-1)
            else:
                valid = jnp.repeat(rowmask, P)
        part = count_from_keys(hi.reshape(-1), lo.reshape(-1), k,
                               valid=valid)
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


# Block-nested entry chunking (BASELINE.md round-4 "streamed-join HBM
# ceiling"): when the GLOBAL seed slab + its M*g-row sort would exceed
# HBM (~8-10M vertices on a 16 GB chip), the entry side streams too.
# Auto-engages above _BLOCK_ENGAGE_ROWS seed rows; each block holds
# ~_BLOCK_TARGET_ROWS rows (slab ~0.5 GB at production widths).
_BLOCK_ENGAGE_ROWS = 48 * 1024 * 1024
_BLOCK_TARGET_ROWS = 24 * 1024 * 1024

# A/B toggle (scripts/probe_correct_ab.py): route the streamed
# single_window corrector through the DENSE per-chunk kernel instead of
# the two-phase weak-window path — both are bit-identical (tested); the
# toggle exists to measure the two-phase speedup in one warm process
# (VERDICT r4 #4: the claimed win was never demonstrated at scale).
FORCE_DENSE_CORRECT = False


def find_overlaps_chunked(
    reads2: np.ndarray,
    valid2: np.ndarray,
    min_overlap: int,
    chunk_reads: int,
    seed_len: int = 32,
    capacity_per_chunk: int = 1 << 20,
    stride: int | None = None,
    store=None,
    entry_block_reads: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, bool]:
    """Streamed strided overlap detection for reads larger than HBM.

    Device residency is bounded by: the global seed table (g entries/read,
    12 B each), the first-shift word packs (words0, W uint32/read, needed
    for B-side verification), the bucket start table, and ONE read chunk's
    unshifted word packs + candidates. Seed keys and A-side verification
    words are computed from the unshifted packing with register shifts
    (detect.seed_keys_from_words0 / verify_candidates_words0): the
    16-shift packs of a 2M-read chunk alone were 3.6 GB and OOMed HBM.

    Exactness: every candidate (a, b) arises from a's probes, which all
    live in a's chunk, so the longest-per-pair reduction is complete per
    chunk; per-chunk edge lists concatenate into the final globally
    sorted list. Results are bit-identical to overlap.find_overlaps
    (tested).

    Returns (src, dst, ovl, n_edges, overflow) as host arrays.
    ``store`` (utils.spill.SpillStore): append per-chunk edges to
    memmap files ``edges_src``/``edges_dst``/``edges_ovl`` (padded to a
    2^14 grain with the I32_MAX sentinel) instead of holding the full
    edge list in RAM.

    ``entry_block_reads``: stream the ENTRY side too (block-nested
    join) — build the seed table + slab for blocks of this many reads
    and probe every query chunk against every block. None = auto:
    engages when the global seed-row count exceeds _BLOCK_ENGAGE_ROWS
    (the measured single-device HBM ceiling class); pass a value >= the
    read count to force the single-slab path. Bit-identical to the
    single-slab path (tested with tiny blocks).
    """
    from sage2_tpu.overlap import detect

    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    pa = L - min_overlap
    g = detect.auto_stride(min_overlap, s, pa) if stride is None else stride
    n_pos = -(-pa // g)
    I32_MAX = np.int32(2**31 - 1)

    if entry_block_reads is None and M * g > _BLOCK_ENGAGE_ROWS:
        entry_block_reads = max(chunk_reads, _BLOCK_TARGET_ROWS // g)
    if entry_block_reads is not None and entry_block_reads < M:
        return _find_overlaps_chunked_blocked(
            reads2, valid2, min_overlap, chunk_reads, s, g, n_pos, pa,
            capacity_per_chunk, store, entry_block_reads,
        )

    # --- pass 1: chunked B-side seed keys; single final sort -----------
    # bucket-only ordering (see detect.build_seed_table): operands are
    # (hi, packed invalid-bit|entry-id). Per-chunk parts accumulate and
    # ONE final sort orders them — re-sorting the growing run after
    # every chunk was O(n_chunks * Mg log Mg) total sort work.
    if M * g >= 1 << 31:
        # entry ids pack as (invalid-bit | id) in one uint32 word
        raise ValueError(f"seed table too large: {M * g} entries >= 2^31")
    hi_parts = []
    packed_parts = []
    words0_parts = []
    for i in range(0, M, chunk_reads):
        watchdog.touch(f"overlap seed chunk {i}/{M}")
        chunk = jnp.asarray(reads2[i : i + chunk_reads].astype(np.int32))
        cvalid = jnp.asarray(valid2[i : i + chunk_reads])
        words0c = bitpack.pack_read_words(chunk)
        words0_parts.append(words0c)
        b_hi, _b_lo = detect.seed_keys_from_words0(
            words0c, s, list(range(g)), L
        )
        ev = jnp.repeat(cvalid, g) if g > 1 else cvalid
        hi = jnp.where(ev, b_hi.reshape(-1), jnp.uint32(0xFFFFFFFF))
        entry = jnp.uint32(i * g) + jnp.arange(hi.shape[0], dtype=jnp.uint32)
        packed = jnp.where(
            ev, jnp.uint32(0), jnp.uint32(0x80000000)
        ) | entry
        hi_parts.append(hi)
        packed_parts.append(packed)
    assert hi_parts, "no reads"
    b_hi_sorted, b_packed = sort_by_keys(
        [jnp.concatenate(hi_parts), jnp.concatenate(packed_parts)]
    )
    del hi_parts, packed_parts
    b_entry = (b_packed & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
    b_val = ((b_packed >> 31) == 0).astype(jnp.int32)
    B = detect._pick_bucket_bits(M * g, M * n_pos, 2 * s, None)
    st = detect.table_from_sorted(b_hi_sorted, b_entry, b_val, B)
    words0 = jnp.concatenate(words0_parts, axis=0)
    # slot slab: [entry id | owner's prefix words] -> one gather per
    # candidate for entry decode + B-side verification (detect.find_overlaps)
    slab = jnp.concatenate(
        [st.entry[:, None].astype(jnp.uint32),
         words0[jnp.minimum(st.entry // g, M - 1)]],
        axis=1,
    )
    del words0_parts

    # --- pass 2: per-chunk probe + expand + verify + reduce -------------
    chunks_out = []
    writers = (
        [store.writer(n, np.int32)
         for n in ("edges_src", "edges_dst", "edges_ovl")]
        if store is not None else None
    )
    n_edges_total = 0
    overflow = False
    for i in range(0, M, chunk_reads):
        watchdog.touch(f"overlap probe chunk {i}/{M}")
        chunk = jnp.asarray(reads2[i : i + chunk_reads].astype(np.int32))
        cvalid = jnp.asarray(valid2[i : i + chunk_reads])
        mc = chunk.shape[0]
        words0c = bitpack.pack_read_words(chunk)
        a_hi, _a_lo = detect.seed_keys_from_words0(
            words0c, s, [g * (j + 1) for j in range(n_pos)], L
        )
        lo_idx, counts = detect.probe_seed_table(st, a_hi, cvalid)
        n_cand = int(jnp.sum(counts))
        if n_cand > capacity_per_chunk:
            # fail FAST: the pass is doomed — finishing the remaining
            # chunks only to retry wastes a full streamed pass (the
            # sharded path has failed fast since round 3)
            overflow = True
            break
        entry, rank, lo_of_entry, cand_valid = expand_with_payload(
            counts.reshape(-1), lo_idx.reshape(-1), capacity_per_chunk
        )
        cand_a = i + entry // n_pos                       # global id
        cand_p = (entry % n_pos + 1) * g
        b_slot = jnp.minimum(lo_of_entry + rank, M * g - 1)
        row = slab[b_slot]
        e_b = row[:, 0].astype(jnp.int32)
        cand_b = e_b // g
        cand_p0 = cand_p - (e_b - cand_b * g)
        cand_valid = cand_valid & (cand_a != cand_b) & (cand_p0 <= pa)
        cand_p0 = jnp.clip(cand_p0, 1, pa)

        ok = detect.verify_candidates_words0(
            words0c, cand_a - i, cand_p0, row[:, 1:], L, max_p=pa,
        ) & cand_valid

        ovl = L - cand_p0
        k_src, k_dst, k_ovl, n_keep_dev = detect.reduce_edge_candidates(
            ok, cand_a, cand_b, ovl, L, M
        )
        n_keep = int(n_keep_dev)
        n_edges_total += n_keep
        part = (
            np.asarray(k_src[:n_keep]), np.asarray(k_dst[:n_keep]),
            np.asarray(k_ovl[:n_keep]),
        )
        if writers is not None:
            for w, a in zip(writers, part):
                w.append(a)
        else:
            chunks_out.append(part)
        del words0c, chunk

    if overflow:
        if writers is not None:
            for w in writers:
                w.abort()
        empty = np.zeros(0, np.int32)
        return empty, empty, empty, 0, True
    # chunks are processed in ascending a-range, so per-chunk sorted edge
    # lists concatenate into a globally (src, dst)-sorted list
    if writers is not None:
        pad_to = max(1, -(-n_edges_total // (1 << 14)) * (1 << 14))
        src = writers[0].close(pad_to=pad_to, fill=2**31 - 1)
        dst = writers[1].close(pad_to=pad_to, fill=2**31 - 1)
        ovl = writers[2].close(pad_to=pad_to, fill=0)
        return src, dst, ovl, n_edges_total, overflow
    src = np.concatenate([c[0] for c in chunks_out])
    dst = np.concatenate([c[1] for c in chunks_out])
    ovl = np.concatenate([c[2] for c in chunks_out])
    return src, dst, ovl, n_edges_total, overflow


def _find_overlaps_chunked_blocked(
    reads2: np.ndarray,
    valid2: np.ndarray,
    min_overlap: int,
    chunk_reads: int,
    s: int,
    g: int,
    n_pos: int,
    pa: int,
    capacity_per_chunk: int,
    store,
    entry_block_reads: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, bool]:
    """Block-nested streamed join: the entry side streams in blocks of
    ``entry_block_reads`` reads, so device residency is O(block + chunk)
    instead of O(M) — this lifts the single-device HBM ceiling
    (BASELINE.md round-4: global slab + M*g-row sort cap ~8-10M
    vertices on a 16 GB chip).

    Exactness: every candidate (a, b) arises from a's probes hitting
    b's entry seeds, and ALL of read b's g entry seeds live in b's
    (single) block — so the longest-per-pair reduction is complete per
    (query chunk x entry block) and pairs are disjoint across blocks.
    Per-chunk fragments (one per block, each (src, dst)-sorted) merge
    with one lexsort per chunk; chunks concatenate in ascending a-range
    into the same globally sorted list the single-slab path emits
    (bit-identity tested with tiny blocks).
    """
    from sage2_tpu.overlap import detect

    M, L = reads2.shape
    EB = entry_block_reads
    if M * g >= 1 << 31:
        raise ValueError(f"seed table too large: {M * g} entries >= 2^31")
    n_chunks = -(-M // chunk_reads)
    n_blocks = -(-M // EB)
    # constant geometry over blocks: one compiled program each for the
    # block build and the probe
    B = detect._pick_bucket_bits(
        EB * g, min(M, chunk_reads) * n_pos, 2 * s, None
    )

    # per-chunk edge fragments, appended in ascending block order
    if store is not None:
        frag_writers = [
            [store.writer(f"efrag{c}_{n}", np.int32)
             for n in ("src", "dst", "ovl")]
            for c in range(n_chunks)
        ]
        frags = None
    else:
        frags = [[] for _ in range(n_chunks)]
        frag_writers = None

    overflow = False
    for b0 in range(0, M, EB):
        watchdog.touch(f"overlap entry block {b0}/{M}")
        nb = min(EB, M - b0)
        raw = reads2[b0 : b0 + nb].astype(np.int32)
        if nb < EB and n_blocks > 1:
            raw = np.concatenate([raw, np.zeros((EB - nb, L), np.int32)])
        bval = np.zeros(raw.shape[0], bool)
        bval[:nb] = valid2[b0 : b0 + nb]
        EBp = raw.shape[0]
        blk = jnp.asarray(raw)
        bvalid = jnp.asarray(bval)
        words0b = bitpack.pack_read_words(blk)
        b_hi, _ = detect.seed_keys_from_words0(
            words0b, s, list(range(g)), L
        )
        ev = jnp.repeat(bvalid, g) if g > 1 else bvalid
        hi = jnp.where(ev, b_hi.reshape(-1), jnp.uint32(0xFFFFFFFF))
        # GLOBAL entry ids (the slab decode below recovers the global
        # read id b = entry // g, exactly as the single-slab path)
        entry = jnp.uint32(b0 * g) + jnp.arange(
            hi.shape[0], dtype=jnp.uint32
        )
        packed = jnp.where(
            ev, jnp.uint32(0), jnp.uint32(0x80000000)
        ) | entry
        hs, ps = sort_by_keys([hi, packed])
        b_entry = (ps & jnp.uint32(0x7FFFFFFF)).astype(jnp.int32)
        b_val = ((ps >> 31) == 0).astype(jnp.int32)
        st = detect.table_from_sorted(hs, b_entry, b_val, B)
        local = jnp.clip((st.entry - np.int32(b0 * g)) // g, 0, EBp - 1)
        slab = jnp.concatenate(
            [st.entry[:, None].astype(jnp.uint32), words0b[local]],
            axis=1,
        )
        del words0b, blk, b_hi, hi, entry, packed, hs, ps

        for ci, i in enumerate(range(0, M, chunk_reads)):
            watchdog.touch(f"overlap block {b0} probe chunk {i}/{M}")
            chunk = jnp.asarray(reads2[i : i + chunk_reads].astype(np.int32))
            cvalid = jnp.asarray(valid2[i : i + chunk_reads])
            words0c = bitpack.pack_read_words(chunk)
            a_hi, _ = detect.seed_keys_from_words0(
                words0c, s, [g * (j + 1) for j in range(n_pos)], L
            )
            lo_idx, counts = detect.probe_seed_table(st, a_hi, cvalid)
            n_cand = int(jnp.sum(counts))
            if n_cand > capacity_per_chunk:
                overflow = True   # fail fast: the pass is doomed
                break
            entry_q, rank, lo_of_entry, cand_valid = expand_with_payload(
                counts.reshape(-1), lo_idx.reshape(-1), capacity_per_chunk
            )
            cand_a = i + entry_q // n_pos                    # global id
            cand_p = (entry_q % n_pos + 1) * g
            b_slot = jnp.minimum(lo_of_entry + rank, EBp * g - 1)
            row = slab[b_slot]
            e_b = row[:, 0].astype(jnp.int32)                # global entry
            cand_b = e_b // g
            cand_p0 = cand_p - (e_b - cand_b * g)
            cand_valid = cand_valid & (cand_a != cand_b) & (cand_p0 <= pa)
            cand_p0 = jnp.clip(cand_p0, 1, pa)

            ok = detect.verify_candidates_words0(
                words0c, cand_a - i, cand_p0, row[:, 1:], L, max_p=pa,
            ) & cand_valid

            ovl = L - cand_p0
            k_src, k_dst, k_ovl, n_keep_dev = detect.reduce_edge_candidates(
                ok, cand_a, cand_b, ovl, L, M
            )
            n_keep = int(n_keep_dev)
            part = (
                np.asarray(k_src[:n_keep]), np.asarray(k_dst[:n_keep]),
                np.asarray(k_ovl[:n_keep]),
            )
            if frag_writers is not None:
                for w, a in zip(frag_writers[ci], part):
                    w.append(a)
            else:
                frags[ci].append(part)
            del words0c, chunk
        del slab, st
        if overflow:
            break

    if overflow:
        if frag_writers is not None:
            for ws in frag_writers:
                for w in ws:
                    w.abort()
        empty = np.zeros(0, np.int32)
        return empty, empty, empty, 0, True

    # merge: per chunk, the per-block fragments lexsort by (src, dst)
    # (pairs are unique across blocks, so the order is total); chunks
    # concatenate in ascending a-range into the globally sorted list
    writers = (
        [store.writer(n, np.int32)
         for n in ("edges_src", "edges_dst", "edges_ovl")]
        if store is not None else None
    )
    chunks_out = []
    n_edges_total = 0
    for ci in range(n_chunks):
        if frag_writers is not None:
            fsrc = frag_writers[ci][0].close()
            fdst = frag_writers[ci][1].close()
            fovl = frag_writers[ci][2].close()
            src_c = np.asarray(fsrc)
            dst_c = np.asarray(fdst)
            ovl_c = np.asarray(fovl)
        else:
            parts = frags[ci]
            src_c = np.concatenate([p[0] for p in parts]) if parts else \
                np.zeros(0, np.int32)
            dst_c = np.concatenate([p[1] for p in parts]) if parts else \
                np.zeros(0, np.int32)
            ovl_c = np.concatenate([p[2] for p in parts]) if parts else \
                np.zeros(0, np.int32)
        order = np.lexsort((dst_c, src_c))
        part = (src_c[order], dst_c[order], ovl_c[order])
        n_edges_total += part[0].shape[0]
        if writers is not None:
            for w, a in zip(writers, part):
                w.append(a)
            for nme in (f"efrag{ci}_src", f"efrag{ci}_dst",
                        f"efrag{ci}_ovl"):
                store.remove(nme)
        else:
            chunks_out.append(part)

    if writers is not None:
        pad_to = max(1, -(-n_edges_total // (1 << 14)) * (1 << 14))
        src = writers[0].close(pad_to=pad_to, fill=2**31 - 1)
        dst = writers[1].close(pad_to=pad_to, fill=2**31 - 1)
        ovl = writers[2].close(pad_to=pad_to, fill=0)
        return src, dst, ovl, n_edges_total, False
    src = np.concatenate([c[0] for c in chunks_out])
    dst = np.concatenate([c[1] for c in chunks_out])
    ovl = np.concatenate([c[2] for c in chunks_out])
    return src, dst, ovl, n_edges_total, False


def _revcomp_ragged_np(rows: np.ndarray, lens: np.ndarray) -> np.ndarray:
    """Numpy ragged reverse complement (padding stays 0 at the end)."""
    L = rows.shape[1]
    j = np.arange(L)[None, :]
    real = j < lens[:, None]
    idx = np.where(real, lens[:, None] - 1 - j, j)
    vals = np.take_along_axis(rows, idx, axis=1)
    return np.where(real, 3 - vals, 0).astype(rows.dtype)


def find_overlaps_chunked_ragged(
    reads2: np.ndarray,
    valid2: np.ndarray,
    lengths2: np.ndarray,
    min_overlap: int,
    chunk_reads: int,
    seed_len: int = 32,
    capacity_per_chunk: int = 1 << 20,
    store=None,
    entry_block_reads: int | None = None,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, np.ndarray, bool]:
    """Streamed RAGGED overlap detection (fused-join formulation).

    Phase A streams chunks and keeps only their globally-numbered ENTRY
    seed rows on device (the distributed seed table — same residency
    class as find_overlaps_chunked's table+slab); phase B streams chunks
    again, running the fused join core over [all entries + the chunk's
    query rows] and reducing per chunk (complete per chunk: all of a
    read's query rows live in its own chunk). Containment marks
    accumulate per chunk. Returns (src, dst, ovl, n_edges, contained,
    overflow) as host arrays — bit-identical to detect.find_overlaps
    with lengths (tested).
    """
    from sage2_tpu.overlap.detect import join_geometry

    M, L = reads2.shape
    s = min(seed_len, min_overlap, 32)
    geo = join_geometry(L, min_overlap, s)
    g, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt
    if M * R >= (1 << 31) - 1:
        raise ValueError(f"seed rows {M * R} overflow 31-bit row ids")

    if entry_block_reads is None and M * g > _BLOCK_ENGAGE_ROWS:
        entry_block_reads = max(chunk_reads, _BLOCK_TARGET_ROWS // g)
    if entry_block_reads is not None and entry_block_reads < M:
        return _find_overlaps_chunked_ragged_blocked(
            reads2, valid2, lengths2, min_overlap, chunk_reads, s, geo,
            capacity_per_chunk, store, entry_block_reads,
        )

    def chunk_rows(i):
        raw = reads2[i : i + chunk_reads].astype(np.int32)
        nc = raw.shape[0]
        pad = chunk_reads - nc if M > chunk_reads else 0
        if pad:
            raw = np.concatenate([raw, np.zeros((pad, L), np.int32)])
        cvalid = np.zeros(raw.shape[0], bool)
        cvalid[:nc] = valid2[i : i + nc]
        lens_c = np.zeros(raw.shape[0], np.int32)
        lens_c[:nc] = lengths2[i : i + nc]
        return (jnp.asarray(raw), jnp.asarray(cvalid),
                jnp.asarray(lens_c))

    ent_parts = []
    for i in range(0, M, chunk_reads):
        chunk, cvalid, lens_c = chunk_rows(i)
        k_hi, k_lo, packed, payload = _ragged_entry_rows(
            chunk, cvalid, lens_c, s, geo, i
        )
        m = chunk.shape[0]
        ent_parts.append(jnp.concatenate(
            [k_hi[:, :g].reshape(m * g, 1),
             k_lo[:, :g].reshape(m * g, 1),
             packed[:, :g].reshape(m * g, 1),
             payload[:, :g].reshape(m * g, Wt + 2)], axis=1,
        ))
        del chunk
    entries = (jnp.concatenate(ent_parts) if len(ent_parts) > 1
               else ent_parts[0])
    del ent_parts

    chunks_out = []
    writers = (
        [store.writer(n, np.int32)
         for n in ("edges_raw_src", "edges_raw_dst", "edges_raw_ovl")]
        if store is not None else None
    )
    contained = np.zeros(M, bool)
    n_edges_total = 0
    overflow = False
    for i in range(0, M, chunk_reads):
        chunk, cvalid, lens_c = chunk_rows(i)
        out = _ragged_query_join(
            entries, chunk, cvalid, lens_c, s, geo, i,
            capacity_per_chunk, min_overlap, M,
        )
        k_src, k_dst, k_ovl, n_keep_dev, cont_c, total = out
        if int(total) > capacity_per_chunk:
            overflow = True
            break       # fail fast: the pass is doomed (see above)
        n_keep = int(n_keep_dev)
        n_edges_total += n_keep
        part = (
            np.asarray(k_src[:n_keep]), np.asarray(k_dst[:n_keep]),
            np.asarray(k_ovl[:n_keep]),
        )
        if writers is not None:
            for w, a in zip(writers, part):
                w.append(a)
        else:
            chunks_out.append(part)
        contained |= np.asarray(cont_c)
        del chunk
    if overflow:
        if writers is not None:
            for w in writers:
                w.abort()
        empty = np.zeros(0, np.int32)
        return empty, empty, empty, 0, contained, True
    if writers is not None:
        src = writers[0].close()
        dst = writers[1].close()
        ovl = writers[2].close()
        return src, dst, ovl, n_edges_total, contained, overflow
    src = np.concatenate([c[0] for c in chunks_out])
    dst = np.concatenate([c[1] for c in chunks_out])
    ovl = np.concatenate([c[2] for c in chunks_out])
    return src, dst, ovl, n_edges_total, contained, overflow


def _find_overlaps_chunked_ragged_blocked(
    reads2: np.ndarray,
    valid2: np.ndarray,
    lengths2: np.ndarray,
    min_overlap: int,
    chunk_reads: int,
    s: int,
    geo,
    capacity_per_chunk: int,
    store,
    entry_block_reads: int,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int, np.ndarray, bool]:
    """Block-nested RAGGED streamed join: the entry-row slab streams in
    blocks of ``entry_block_reads`` reads (device residency
    O(block + chunk) instead of O(M) — the ragged analog of
    _find_overlaps_chunked_blocked; same exactness argument: all of
    read b's entry rows live in b's block, so the per-pair reduction is
    complete per (query chunk x entry block) and pairs are disjoint
    across blocks). Containment marks OR-accumulate across blocks.
    Bit-identical to the single-slab ragged path (tested).
    """
    M, L = reads2.shape
    g, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt
    EB = entry_block_reads
    n_chunks = -(-M // chunk_reads)

    def chunk_rows(i, end=None):
        """Padded chunk starting at read i; rows at/after ``end`` (the
        block boundary) are masked INVALID so a read's entry rows land
        in exactly ONE block (duplicated entries would duplicate
        pairs)."""
        end = M if end is None else min(end, M)
        raw = reads2[i : i + chunk_reads].astype(np.int32)
        nc = raw.shape[0]
        pad = chunk_reads - nc if M > chunk_reads else 0
        if pad:
            raw = np.concatenate([raw, np.zeros((pad, L), np.int32)])
        nv = max(0, min(end - i, nc))
        cvalid = np.zeros(raw.shape[0], bool)
        cvalid[:nv] = valid2[i : i + nv]
        lens_c = np.zeros(raw.shape[0], np.int32)
        lens_c[:nc] = lengths2[i : i + nc]
        return (jnp.asarray(raw), jnp.asarray(cvalid),
                jnp.asarray(lens_c))

    if store is not None:
        frag_writers = [
            [store.writer(f"efrag{c}_{n}", np.int32)
             for n in ("src", "dst", "ovl")]
            for c in range(n_chunks)
        ]
        frags = None
    else:
        frags = [[] for _ in range(n_chunks)]
        frag_writers = None

    contained = np.zeros(M, bool)
    overflow = False
    for b0 in range(0, M, EB):
        watchdog.touch(f"ragged entry block {b0}/{M}")
        # entry rows for reads [b0, b0+EB), streamed chunk by chunk
        ent_parts = []
        for i in range(b0, min(b0 + EB, M), chunk_reads):
            chunk, cvalid, lens_c = chunk_rows(i, end=b0 + EB)
            k_hi, k_lo, packed, payload = _ragged_entry_rows(
                chunk, cvalid, lens_c, s, geo, i
            )
            m = chunk.shape[0]
            ent_parts.append(jnp.concatenate(
                [k_hi[:, :g].reshape(m * g, 1),
                 k_lo[:, :g].reshape(m * g, 1),
                 packed[:, :g].reshape(m * g, 1),
                 payload[:, :g].reshape(m * g, Wt + 2)], axis=1,
            ))
            del chunk
        entries = (jnp.concatenate(ent_parts) if len(ent_parts) > 1
                   else ent_parts[0])
        del ent_parts

        for ci, i in enumerate(range(0, M, chunk_reads)):
            watchdog.touch(f"ragged block {b0} probe chunk {i}/{M}")
            chunk, cvalid, lens_c = chunk_rows(i)
            out = _ragged_query_join(
                entries, chunk, cvalid, lens_c, s, geo, i,
                capacity_per_chunk, min_overlap, M,
            )
            k_src, k_dst, k_ovl, n_keep_dev, cont_c, total = out
            if int(total) > capacity_per_chunk:
                overflow = True
                break       # fail fast: the pass is doomed
            n_keep = int(n_keep_dev)
            part = (
                np.asarray(k_src[:n_keep]), np.asarray(k_dst[:n_keep]),
                np.asarray(k_ovl[:n_keep]),
            )
            if frag_writers is not None:
                for w, a in zip(frag_writers[ci], part):
                    w.append(a)
            else:
                frags[ci].append(part)
            contained |= np.asarray(cont_c)
            del chunk
        del entries
        if overflow:
            break

    if overflow:
        if frag_writers is not None:
            for ws in frag_writers:
                for w in ws:
                    w.abort()
        empty = np.zeros(0, np.int32)
        return empty, empty, empty, 0, contained, True

    # per-chunk merge of the per-block fragments (pairs unique across
    # blocks -> lexsort by (src, dst) is a total order), chunks
    # concatenate in ascending a-range — same output as the single-slab
    # path (which emits per-chunk (src, dst)-sorted lists unpadded)
    writers = (
        [store.writer(n, np.int32)
         for n in ("edges_raw_src", "edges_raw_dst", "edges_raw_ovl")]
        if store is not None else None
    )
    chunks_out = []
    n_edges_total = 0
    for ci in range(n_chunks):
        if frag_writers is not None:
            src_c = np.asarray(frag_writers[ci][0].close())
            dst_c = np.asarray(frag_writers[ci][1].close())
            ovl_c = np.asarray(frag_writers[ci][2].close())
        else:
            parts = frags[ci]
            src_c = np.concatenate([p[0] for p in parts]) if parts else \
                np.zeros(0, np.int32)
            dst_c = np.concatenate([p[1] for p in parts]) if parts else \
                np.zeros(0, np.int32)
            ovl_c = np.concatenate([p[2] for p in parts]) if parts else \
                np.zeros(0, np.int32)
        order = np.lexsort((dst_c, src_c))
        part = (src_c[order], dst_c[order], ovl_c[order])
        n_edges_total += part[0].shape[0]
        if writers is not None:
            for w, a in zip(writers, part):
                w.append(a)
            for nme in (f"efrag{ci}_src", f"efrag{ci}_dst",
                        f"efrag{ci}_ovl"):
                store.remove(nme)
        else:
            chunks_out.append(part)

    if writers is not None:
        src = writers[0].close()
        dst = writers[1].close()
        ovl = writers[2].close()
        return src, dst, ovl, n_edges_total, contained, False
    src = np.concatenate([c[0] for c in chunks_out])
    dst = np.concatenate([c[1] for c in chunks_out])
    ovl = np.concatenate([c[2] for c in chunks_out])
    return src, dst, ovl, n_edges_total, contained, False


def compact_pad_edges_spill(
    store, e_src, e_dst, e_ovl, n_raw: int,
    cont: Optional[np.ndarray] = None,
    window: int = 1 << 22,
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, int]:
    """Windowed containment-filter + sentinel-pad of a raw spilled edge
    list into the final ``edges_*`` spill files (O(window) host RAM).

    ``cont``: per-vertex containment mask; edges touching a contained
    vertex drop (None = keep all). Output layout matches the in-RAM
    path: kept edges in original order, padded to a 2^14 grain with
    (I32_MAX, I32_MAX, 0) rows.
    """
    writers = [store.writer(n, np.int32)
               for n in ("edges_src", "edges_dst", "edges_ovl")]
    n_out = 0
    for w0 in range(0, n_raw, window):
        s = np.asarray(e_src[w0 : w0 + window])
        d = np.asarray(e_dst[w0 : w0 + window])
        o = np.asarray(e_ovl[w0 : w0 + window])
        if cont is not None:
            keep = ~(cont[s] | cont[d])
            s, d, o = s[keep], d[keep], o[keep]
        n_out += s.shape[0]
        writers[0].append(s)
        writers[1].append(d)
        writers[2].append(o)
    pad_to = max(1, -(-n_out // (1 << 14)) * (1 << 14))
    src = writers[0].close(pad_to=pad_to, fill=2**31 - 1)
    dst = writers[1].close(pad_to=pad_to, fill=2**31 - 1)
    ovl = writers[2].close(pad_to=pad_to, fill=0)
    return src, dst, ovl, n_out


@functools.lru_cache(maxsize=8)
def _ragged_entry_kernel(s: int, geo):
    from sage2_tpu.overlap.detect import build_seed_rows

    @jax.jit
    def entry_rows(chunk, cvalid, lens_c, base):
        return build_seed_rows(chunk, cvalid, s, geo, id_base=base,
                               lengths=lens_c)

    return entry_rows


@functools.lru_cache(maxsize=8)
def _ragged_join_kernel(s: int, geo, min_overlap: int, cap: int,
                        m_total: int):
    from sage2_tpu.overlap.detect import (
        _reduce_fused,
        build_seed_rows,
        fused_join_core,
    )

    g, n_pos, R, pa, Wp, _trim = geo
    Wt = geo.Wt

    @jax.jit
    def query_join(entries, chunk, cvalid, lens_c, base):
        L = chunk.shape[1]
        k_hi, k_lo, packed, payload = build_seed_rows(
            chunk, cvalid, s, geo, id_base=base, lengths=lens_c
        )
        m = chunk.shape[0]
        hi_q = k_hi[:, g:].reshape(-1)
        lo_q = k_lo[:, g:].reshape(-1)
        p_q = packed[:, g:].reshape(-1)
        pay_q = payload[:, g:].reshape(m * n_pos, Wt + 2)
        hi_all = jnp.concatenate([entries[:, 0], hi_q])
        lo_all = jnp.concatenate([entries[:, 1], lo_q])
        p_all = jnp.concatenate([entries[:, 2], p_q])
        pay_all = jnp.concatenate([entries[:, 3:], pay_q], axis=0)
        ok, ok_cont, cand_a, cand_b, ovl, total = fused_join_core(
            hi_all, lo_all, p_all, pay_all, geo, L, cap, min_overlap,
        )
        cont = (
            jnp.zeros(m_total + 1, bool)
            .at[jnp.where(ok_cont, cand_b, m_total)]
            .set(True, mode="drop")[:m_total]
        )
        k_src, k_dst, k_ovl, n_keep, _nd = _reduce_fused(
            ok, cand_a, cand_b, ovl, L, m_total
        )
        return k_src, k_dst, k_ovl, n_keep, cont, total

    return query_join


def _ragged_entry_rows(chunk, cvalid, lens_c, s, geo, base):
    return _ragged_entry_kernel(s, geo)(
        chunk, cvalid, lens_c, jnp.uint32(base)
    )


def _ragged_query_join(entries, chunk, cvalid, lens_c, s, geo, base,
                       cap, min_overlap, m_total):
    return _ragged_join_kernel(s, geo, min_overlap, cap, m_total)(
        entries, chunk, cvalid, lens_c, jnp.uint32(base)
    )


def prepare_reads_chunked(
    reads: np.ndarray, chunk_reads: int,
    lengths: Optional[np.ndarray] = None,
    store=None,
) -> Tuple:
    """Host-side read dedup + RC augmentation for larger-than-HBM sets.

    Bit-identical layout to overlap.prepare.prepare_reads (same
    canonical-word stable sort, head-of-group representative, vertex
    numbering): only the canonical packed words (W uint32/read) are
    computed on device per chunk; the dedup sort runs on host, so device
    memory stays bounded by one chunk. Returns host arrays
    (reads2 int8 (2N, L), valid2, multiplicity, n_unique,
    vertex_of_read, lengths2) — lengths2 is None for fixed-length
    inputs. With ``lengths`` (ragged, 0-padded) the length joins the
    dedup key exactly as in prepare_reads (a read only collapses with an
    equal-length read; containment is the overlap kernel's job).
    """
    from sage2_tpu.ops import bitpack
    from sage2_tpu.overlap.prepare import revcomp_ragged

    N, L = reads.shape
    canon_w_parts = []
    take_rc_parts = []
    for i in range(0, N, chunk_reads):
        watchdog.touch(f"count chunk {i}/{N}")
        raw = reads[i : i + chunk_reads].astype(np.int32)
        if lengths is not None:
            # enforce zero padding so packed-word keys are well defined
            lens_c = np.asarray(lengths[i : i + chunk_reads], np.int32)
            raw = np.where(
                np.arange(L)[None, :] < lens_c[:, None], raw, 0
            )
            chunk = jnp.asarray(raw)
            rc = revcomp_ragged(chunk, jnp.asarray(lens_c))
        else:
            chunk = jnp.asarray(raw)
            rc = bitpack.revcomp_codes(chunk)
        fwd_w = bitpack.pack_read_words(chunk)
        rc_w = bitpack.pack_read_words(rc)
        from sage2_tpu.ops.sort import words_less

        take_rc = words_less(rc_w, fwd_w)
        canon_w_parts.append(np.asarray(
            jnp.where(take_rc[:, None], rc_w, fwd_w)
        ))
        take_rc_parts.append(np.asarray(take_rc))
    canon_w = np.concatenate(canon_w_parts)
    take_rc = np.concatenate(take_rc_parts)
    W = canon_w.shape[1]

    # stable host sort on the canonical words (major key first; length
    # is the most-major key for ragged inputs, matching prepare_reads)
    keys = tuple(canon_w[:, j] for j in range(W - 1, -1, -1))
    if lengths is not None:
        keys = keys + (np.asarray(lengths),)
    order = np.lexsort(keys)
    s_keys = canon_w[order]
    neq = np.ones(N, bool)
    neq[1:] = (s_keys[1:] != s_keys[:-1]).any(axis=1)
    if lengths is not None:
        s_lens = np.asarray(lengths)[order]
        neq[1:] |= s_lens[1:] != s_lens[:-1]
    group_id = np.cumsum(neq) - 1
    n_unique = int(group_id[-1] + 1)

    rep = np.zeros(n_unique, np.int64)
    rep[group_id[neq]] = order[neq]
    mult = np.bincount(group_id, minlength=n_unique).astype(np.int32)
    gid_in = np.empty(N, np.int32)
    gid_in[order] = group_id.astype(np.int32)
    vertex_of_read = gid_in + np.where(take_rc, N, 0).astype(np.int32)

    reads2 = (
        store.empty("reads2", np.int8, (2 * N, L)) if store is not None
        else np.zeros((2 * N, L), np.int8)
    )
    lens_u = (np.asarray(lengths, np.int32)[rep]
              if lengths is not None else None)
    # representative rows gather + orient in WINDOWS so peak RAM stays
    # O(chunk) even when reads/reads2 are spill memmaps (VERDICT r3 #4)
    for w0 in range(0, n_unique, chunk_reads):
        rw = rep[w0 : w0 + chunk_reads]
        u = np.asarray(reads[rw], np.int8)
        f = take_rc[rw]
        if lengths is not None:
            lu = lens_u[w0 : w0 + chunk_reads]
            u = np.where(
                np.arange(L)[None, :] < lu[:, None], u, 0
            ).astype(np.int8)
            u[f] = _revcomp_ragged_np(u[f], lu[f])
            ru = _revcomp_ragged_np(u, lu)
        else:
            u[f] = (3 - u[f])[:, ::-1]
            ru = (3 - u)[:, ::-1]
        reads2[w0 : w0 + rw.shape[0]] = u
        reads2[N + w0 : N + w0 + rw.shape[0]] = ru
    valid2 = np.zeros(2 * N, bool)
    valid2[:n_unique] = True
    valid2[N : N + n_unique] = True
    mult2 = np.zeros(2 * N, np.int32)
    mult2[:n_unique] = mult
    mult2[N : N + n_unique] = mult
    lengths2 = None
    if lengths is not None:
        lengths2 = np.zeros(2 * N, np.int32)
        lengths2[:n_unique] = lens_u
        lengths2[N : N + n_unique] = lens_u
    return reads2, valid2, mult2, n_unique, vertex_of_read, lengths2


def correct_reads_chunked(
    reads: np.ndarray,
    k: int,
    threshold: int,
    rounds: int,
    chunk_reads: int,
    rule: str = "single_window",
    lengths: Optional[np.ndarray] = None,
    out: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Spectrum correction streamed in chunks.

    Matches kmer.correct_reads exactly: each round recounts over ALL
    reads (chunked), then applies both sub-passes per chunk against that
    round's global table. (The in-core path recounts between the forward
    and backward sub-pass only at round boundaries too, and sub-pass
    verdicts depend only on the global table and the chunk's own rows,
    so chunking is exact.) ``lengths``: ragged (0-padded) inputs.

    The single_window rule runs through the two-phase weak-window path
    (kmer.correct.twophase_round — bit-identical, tested) with the
    global table pruned once per round; the voting rule keeps the dense
    per-chunk kernel.

    ``out``: optional preallocated (N, L) int8 destination (e.g. a
    spill memmap) that the corrected reads are written into chunk by
    chunk; peak host RAM then stays O(chunk).
    """
    from sage2_tpu.kmer.correct import (
        prune_table_for_correction,
        twophase_round,
    )

    N = reads.shape[0]
    use_twophase = rule == "single_window" and not FORCE_DENSE_CORRECT
    if out is None:
        out = np.array(reads, dtype=np.int8, copy=True)
    else:
        # caller-provided destination (e.g. a spill memmap): initialize
        # in windows so peak RAM stays O(chunk)
        assert out.shape == reads.shape and out.dtype == np.int8
        for i in range(0, N, chunk_reads):
            out[i : i + chunk_reads] = reads[i : i + chunk_reads]
    for _ in range(rounds):
        table = count_kmers_chunked(out, k, chunk_reads, lengths=lengths)
        pruned = (
            prune_table_for_correction(table, threshold)
            if use_twophase else None
        )
        for i in range(0, N, chunk_reads):
            watchdog.touch(f"correct chunk {i}/{N}")
            raw = out[i : i + chunk_reads]
            nc = raw.shape[0]
            # pad the tail chunk to the common shape — an uneven split
            # would give the last chunk its own jit cache entry; each
            # row's verdicts depend only on the global table and the row
            # itself, so padded rows are independent and discarded
            pad = chunk_reads - nc if N > chunk_reads else 0
            if pad:
                raw = np.concatenate(
                    [raw, np.repeat(raw[-1:], pad, axis=0)]
                )
            chunk = jnp.asarray(raw.astype(np.int32))
            lens_c = None
            if lengths is not None:
                lc = np.full(chunk.shape[0], raw.shape[1], np.int32)
                lc[:nc] = lengths[i : i + chunk_reads]
                lens_c = jnp.asarray(lc)
            if use_twophase:
                corrected = twophase_round(
                    chunk, pruned, k, threshold, lengths=lens_c
                )
            else:
                corrected = correct_reads(
                    chunk, k, threshold, rounds=1, table=table,
                    rule=rule, lengths=lens_c,
                )
            out[i : i + chunk_reads] = np.asarray(
                corrected, dtype=np.int8
            )[:nc]
    return out
