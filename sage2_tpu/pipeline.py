"""Pipeline orchestration: stages 1-6 end to end (SURVEY.md §3.1).

Mirrors the reference's main() flow — load -> count -> correct ->
overlap -> graph -> traverse -> emit — with the TPU layering of
SURVEY.md §1: everything from counting through unitig labeling is
device-resident; host touches data only at ingest and contig emission.

Stage artifacts: each stage writes an .npz + manifest entry under
``outdir`` (SURVEY.md §5 "Checkpoint / resume"): corrected.npz,
edges.npz, labels.npz, contigs.fasta, stats.json. ``resume_from``
re-enters the pipeline at any stage, loading the previous artifact.
Capacity overflow (static-shape escape hatch, SURVEY.md §7) retries the
stage with doubled capacity.
"""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
import numpy as np

from sage2_tpu.config import AssemblyConfig
from sage2_tpu.graph.finish import (
    annotate_copy_counts,
    build_unitig_graph,
    emit_contigs,
    estimate_single_copy_coverage,
    join_paths,
    pop_bubbles,
    prune_weak_branches,
    prune_zero_copy_branches,
    remove_tips,
)
from sage2_tpu.graph.traverse import contract_unitigs
from sage2_tpu.kmer import correct_reads, count_kmers
from sage2_tpu.overlap import find_overlaps_auto, prepare_reads
from sage2_tpu.utils.metrics import MetricsLog
from sage2_tpu.utils.stats import assembly_stats

STAGES = ["correct", "overlap", "reduce", "traverse", "finish"]


def _save(outdir: Optional[str], name: str, **arrays) -> None:
    if outdir:
        os.makedirs(outdir, exist_ok=True)
        np.savez_compressed(os.path.join(outdir, name + ".npz"), **arrays)


def _manifest(outdir: Optional[str], config: AssemblyConfig, stage: str,
              spilled: bool = False) -> None:
    if not outdir:
        return
    os.makedirs(outdir, exist_ok=True)  # spill runs skip the big _save
    path = os.path.join(outdir, "manifest.json")
    m = {"config": config.to_dict(), "config_digest": config.digest(),
         "stages": []}
    if os.path.exists(path):
        with open(path) as f:
            m = json.load(f)
    if m.get("config_digest") != config.digest():
        m = {"config": config.to_dict(), "config_digest": config.digest(),
             "stages": []}
    if stage not in m["stages"]:
        m["stages"].append(stage)
    # big arrays live in the spill store, not the npz artifacts — a
    # resume of this outdir needs the same --spill-dir (ADVICE r4)
    if spilled:
        m["spilled"] = True
    with open(path, "w") as f:
        json.dump(m, f, indent=1)


def assemble(
    reads: np.ndarray,
    config: AssemblyConfig = AssemblyConfig(),
    outdir: Optional[str] = None,
    metrics: Optional[MetricsLog] = None,
    resume_from: Optional[str] = None,
    profile_dir: Optional[str] = None,
    mate_of: Optional[np.ndarray] = None,
    lengths: Optional[np.ndarray] = None,
) -> Tuple[List[np.ndarray], Dict[str, float]]:
    """Assemble reads (N, L) int codes -> (contigs, stats).

    ``profile_dir``: dump a jax.profiler trace (Perfetto/XProf) of the
    device stages there (SURVEY.md §5 "Tracing / profiling").
    ``mate_of``: optional (N,) paired-end mate index per read (from
    io.load_read_pairs); pairing survives dedup as vertex pairs in the
    edges artifact (mate_pairs) and — when config.scaffold is set —
    drives mate-pair scaffolding (graph.scaffold): the returned
    sequences are then SCAFFOLDS (gaps as code 4 / 'N'), with contigs
    still written to contigs.fasta and scaffold stats merged into the
    stats dict.
    ``lengths``: per-read lengths for ragged inputs (reads padded with
    zeros to the array width; length_policy="pad" at ingest). Ragged
    runs detect and remove CONTAINED reads (a read occurring inside a
    longer one) before graph building, the SAGE containment-removal
    step that degenerates to dedup for fixed-length reads. Ragged is
    single-device in-core only this round (no mesh/streaming).
    """
    log = metrics or MetricsLog(
        os.path.join(outdir, "metrics.jsonl") if outdir else None
    )
    if profile_dir:
        import contextlib

        import jax

        trace_cm = jax.profiler.trace(profile_dir)
    else:
        import contextlib

        trace_cm = contextlib.nullcontext()
    with trace_cm:
        return _assemble_inner(
            reads, config, outdir, log, resume_from, mate_of, lengths
        )


def _pad_rows(arr: np.ndarray, multiple: int) -> np.ndarray:
    """Pad rows so the leading dim divides the mesh size (padding reads
    are all-A duplicates, collapsed by dedup / masked by validity)."""
    n = arr.shape[0]
    pad = (-n) % multiple
    if not pad:
        return arr
    return np.concatenate([arr, np.repeat(arr[-1:], pad, axis=0)], axis=0)


def _mate_pairs(vertex_of_read, mate_of) -> np.ndarray:
    """(n_pairs, 2) int32 vertex pairs from per-read mates: row =
    (vertex of R1-as-read, vertex of R2-as-read), each pair once."""
    v = np.asarray(vertex_of_read)
    m = np.asarray(mate_of)
    i = np.arange(m.shape[0])
    first = i < m
    return np.stack([v[i[first]], v[m[first]]], axis=1).astype(np.int32)


def _assemble_inner(reads, config, outdir, log, resume_from, mate_of=None,
                    lengths=None):
    N, L = reads.shape
    start = STAGES.index(resume_from) if resume_from else 0
    mate_pairs_np = None
    edges_dev = None     # meshed: per-device src-range edge shards
    reduced_dev = None   # meshed: reduced edges, still on device

    mesh = None
    if config.mesh_shape is not None:
        from sage2_tpu.parallel import make_mesh

        mesh = make_mesh(int(np.prod(config.mesh_shape)))
        log.log("mesh", n_devices=mesh.devices.size)

    # larger-than-HBM streaming (SURVEY.md §7): chunk the device-facing
    # stages when the input exceeds the configured residency budget.
    # Composes with the mesh (BASELINE.json config #4 needs both at
    # once): chunks stream host->device while each chunk's work routes
    # over the mesh (parallel.sharded_stream).
    stream_chunk = None
    if (config.max_device_reads is not None
            and N > config.max_device_reads):
        stream_chunk = config.max_device_reads
        log.log("streaming", chunk_reads=stream_chunk, n_reads=N,
                meshed=mesh is not None)

    # host-side spill (VERDICT round-3 #4): big host-resident stage
    # arrays become memmaps under spill_dir so host RSS stays
    # O(chunk + reduced graph); bit-identical results (tested)
    store = None
    if config.spill_dir and stream_chunk is not None:
        from sage2_tpu.utils.spill import SpillStore

        store = SpillStore(config.spill_dir)
        # resume must not trust a stale/mismatched spill dir: the store
        # records the config digest at run start and a resume validates
        # it (spill_dir itself is excluded from the digest, so the same
        # digest means "same pipeline semantics") — ADVICE r4
        if resume_from:
            d = store.get_meta("config_digest")
            if d is not None and d != config.digest():
                raise ValueError(
                    f"spill dir {config.spill_dir} was written by a run "
                    f"with a different config (digest {d} != "
                    f"{config.digest()}); its arrays do not match this "
                    f"resume — point --spill-dir at the original run's "
                    f"spill directory"
                )
        else:
            store.set_meta("config_digest", config.digest())
        log.log("spill", dir=config.spill_dir, meshed=mesh is not None)
    elif config.spill_dir:
        log.log("spill_skipped", reason="spill requires a streamed path "
                "(set max_device_reads below the input size)")

    if resume_from and store is None and outdir:
        # the original run may have spilled its big arrays — resuming
        # without the spill store would die on missing npz keys/files
        # deep in a stage (ADVICE r4: fail here, with a real message)
        mpath = os.path.join(outdir, "manifest.json")
        if os.path.exists(mpath):
            with open(mpath) as f:
                if json.load(f).get("spilled"):
                    raise ValueError(
                        f"{outdir} was produced by a run that spilled its "
                        f"stage arrays to a spill store; resume with the "
                        f"same --spill-dir"
                    )

    lengths_dev = None if lengths is None else jnp.asarray(
        np.asarray(lengths, np.int32)
    )

    # --- stage 1+2: count + correct (SURVEY.md §3.2) -------------------
    if start <= STAGES.index("correct"):
        if mesh is not None and stream_chunk is not None:
            from sage2_tpu.parallel import sharded_correct_reads_chunked

            nd = mesh.devices.size
            rows = min(stream_chunk, N)
            rows += (-rows) % nd
            cap = max(4096, 4 * rows * (L - config.k + 1) // nd)
            # unique k-mers per device: at low coverage or small k the
            # unique fraction approaches 1/coverage-ish but error k-mers
            # inflate it — total/4 start (memory-cheap: 12 B/slot),
            # doubled on overflow (which now fails FAST, first chunk)
            tcap = max(1 << 15, N * (L - config.k + 1) // (4 * nd))
            while True:
                with log.timed("correct", rounds=config.correction_rounds,
                               sharded=True, streamed=True,
                               chunk_reads=stream_chunk):
                    corrected_np, ovf = sharded_correct_reads_chunked(
                        mesh, reads, config.k, config.solid_threshold,
                        config.correction_rounds,
                        chunk_reads=stream_chunk,
                        route_cap=cap, query_cap=cap, table_cap=tcap,
                        lengths=lengths,
                        rule=config.correction_rule,
                        out=(store.empty("corrected", np.int8,
                                         reads.shape)
                             if store is not None else None),
                    )
                if not ovf:
                    break
                cap *= 2
                tcap *= 2
                log.log("correct_retry", route_cap=cap, table_cap=tcap)
        elif mesh is not None:
            from sage2_tpu.parallel import sharded_correct_reads

            nd = mesh.devices.size
            padded = _pad_rows(reads.astype(np.int32), nd)
            pvalid = np.arange(padded.shape[0]) < N
            lens_pad = None
            if lengths is not None:
                lens_pad = jnp.asarray(_pad_rows(
                    np.asarray(lengths, np.int32).reshape(-1, 1), nd
                ).reshape(-1))
            cap = max(4096, 4 * padded.shape[0] * (L - config.k + 1) // nd)
            with log.timed("correct", rounds=config.correction_rounds,
                           sharded=True):
                corrected, ovf = sharded_correct_reads(
                    mesh, jnp.asarray(padded), config.k,
                    config.solid_threshold, config.correction_rounds,
                    route_cap=cap, query_cap=cap,
                    valid=jnp.asarray(pvalid),
                    lengths=lens_pad,
                    rule=config.correction_rule,
                )
                corrected.block_until_ready()
            assert not bool(ovf), "sharded correction routing overflow"
            corrected_np = np.asarray(corrected, dtype=np.int8)[:N]
        elif stream_chunk is not None:
            from sage2_tpu.stream import correct_reads_chunked

            with log.timed("correct", rounds=config.correction_rounds,
                           streamed=True, chunk_reads=stream_chunk):
                corrected_np = correct_reads_chunked(
                    reads, config.k, config.solid_threshold,
                    config.correction_rounds, chunk_reads=stream_chunk,
                    rule=config.correction_rule,
                    lengths=lengths,
                    out=(store.empty("corrected", np.int8, reads.shape)
                         if store is not None else None),
                )
        else:
            r = jnp.asarray(reads.astype(np.int32))
            with log.timed("count", n_reads=N, read_len=L, k=config.k):
                table = count_kmers(r, config.k, lengths=lengths_dev)
                table.hi.block_until_ready()
            log.log("count_result", n_unique=int(table.n_unique))
            with log.timed("correct", rounds=config.correction_rounds):
                if config.correction_rule == "single_window":
                    from sage2_tpu.kmer.correct import (
                        correct_reads_twophase,
                    )

                    corrected = correct_reads_twophase(
                        r, config.k, config.solid_threshold,
                        config.correction_rounds, table=table,
                        lengths=lengths_dev,
                    )
                else:
                    corrected = correct_reads(
                        r, config.k, config.solid_threshold,
                        config.correction_rounds, table=table,
                        lengths=lengths_dev,
                        rule=config.correction_rule,
                    )
                corrected.block_until_ready()
            corrected_np = np.asarray(corrected, dtype=np.int8)
        if store is None:
            _save(outdir, "corrected", reads=corrected_np)
        _manifest(outdir, config, "correct", spilled=store is not None)
    elif store is not None and store.exists("corrected"):
        corrected_np = store.load("corrected")
    else:
        corrected_np = np.load(os.path.join(outdir, "corrected.npz"))["reads"]

    # --- stage 3: dedup + overlaps (SURVEY.md §3.3) --------------------
    if start <= STAGES.index("overlap"):
        if stream_chunk is not None and mesh is not None:
            from sage2_tpu.overlap.detect import join_geometry
            from sage2_tpu.parallel import sharded_find_overlaps_chunked
            from sage2_tpu.parallel.sharded import gather_edge_shards
            from sage2_tpu.stream import prepare_reads_chunked

            # host-side dedup (device holds one chunk's packs at a time)
            with log.timed("dedup", streamed=True):
                (reads2_np, valid2_np, mult_np, n_uniq, vread_np,
                 lengths2_stream) = prepare_reads_chunked(
                    corrected_np, stream_chunk, lengths=lengths,
                    store=store,
                )
            nd = mesh.devices.size
            M2 = reads2_np.shape[0]
            geo = join_geometry(
                L, config.min_overlap, config.effective_seed_len
            )
            rows = min(2 * stream_chunk, M2)
            rows += (-rows) % nd
            row_cap = max(4096, 2 * (rows // nd) * geo.g // nd)
            q_cap = max(4096, 2 * (rows // nd) * geo.n_pos // nd)
            join_cap = max(1 << 16, 32 * rows // nd)
            # a chunk's edges all land on the 1-2 owners of its src
            # range, so the per-(src,dst)-pair edge route needs ~1/nd of
            # the whole chunk's edges, not 1/nd^2
            edge_chunk_cap = max(4096, 32 * rows // nd)
            edge_cap = max(1 << 16, 32 * (M2 + (-M2) % nd) // nd)
            while True:
                with log.timed("overlap", sharded=True, streamed=True,
                               chunk_reads=stream_chunk):
                    out = sharded_find_overlaps_chunked(
                        mesh, reads2_np, valid2_np, config.min_overlap,
                        config.effective_seed_len,
                        chunk_reads=2 * stream_chunk,
                        row_cap=row_cap, q_cap=q_cap, join_cap=join_cap,
                        edge_chunk_cap=edge_chunk_cap, edge_cap=edge_cap,
                        lengths=lengths2_stream,
                    )
                    src_sh, dst_sh, ovl_sh, n_edges_i, ovf = out[:5]
                if not ovf:
                    break
                row_cap *= 2
                q_cap *= 2
                join_cap *= 2
                edge_chunk_cap *= 2
                edge_cap *= 2
                log.log("overlap_retry", row_cap=row_cap, q_cap=q_cap,
                        join_cap=join_cap, edge_chunk_cap=edge_chunk_cap,
                        edge_cap=edge_cap)
            edges_dev = (src_sh, dst_sh, ovl_sh)
            n_cand_i = n_edges_i
            log.log("overlap_result", n_edges=n_edges_i,
                    n_candidates=n_cand_i, n_unique_reads=n_uniq)
            log.log(
                "overlap_device_memory",
                chunk_rows_per_device=rows // nd,
                entry_rows_per_device="accumulated/ndev",
                row_cap=row_cap, q_cap=q_cap, join_cap=join_cap,
                edge_chunk_cap=edge_chunk_cap, edge_cap=edge_cap,
                global_reads=M2,
            )
            if store is not None and lengths is None and outdir:
                # spill the artifact gather one device shard at a time
                from sage2_tpu.parallel.sharded import (
                    gather_edge_shards_spill,
                )

                edges = gather_edge_shards_spill(
                    store, src_sh, dst_sh, ovl_sh, n_edges_i
                )
            else:
                edges = (
                    gather_edge_shards(src_sh, dst_sh, ovl_sh, n_edges_i)
                    if (outdir or lengths is not None) else None
                )
            if lengths is not None:
                # SAGE containment removal (ragged, streamed+meshed);
                # the edge set changes on host -> drop device chaining
                cont = out[5]
                capn = M2 // 2
                cont = cont | np.roll(cont, capn)
                n_cont = int(cont.sum())
                log.log("containment", n_contained=n_cont)
                if n_cont:
                    e_src, e_dst, e_ovl = edges
                    real = e_src != 2**31 - 1
                    drop = real.copy()
                    drop[real] = (cont[e_src[real]] | cont[e_dst[real]])
                    keepm = real & ~drop
                    nkeep = int(keepm.sum())
                    pad_to = e_src.shape[0]
                    ns = np.full(pad_to, 2**31 - 1, np.int32)
                    nd2 = np.full(pad_to, 2**31 - 1, np.int32)
                    no = np.zeros(pad_to, np.int32)
                    ns[:nkeep] = e_src[keepm]
                    nd2[:nkeep] = e_dst[keepm]
                    no[:nkeep] = e_ovl[keepm]
                    edges = (ns, nd2, no)
                    n_edges_i = nkeep
                    edges_dev = None
                    valid2_np = valid2_np & ~cont
            extra = {}
            if lengths2_stream is not None:
                extra["lengths2"] = lengths2_stream
            if mate_of is not None:
                mate_pairs_np = _mate_pairs(vread_np, mate_of)
                extra["mate_pairs"] = mate_pairs_np
                log.log("mate_pairs", n_pairs=len(mate_pairs_np))
            if outdir and edges is not None:
                if store is not None and store.exists("edges_src"):
                    _save(outdir, "edges", n_edges=n_edges_i,
                          valid2=valid2_np, multiplicity=mult_np,
                          **extra)
                else:
                    _save(outdir, "edges", src=edges[0], dst=edges[1],
                          ovl=edges[2], n_edges=n_edges_i,
                          reads2=reads2_np, valid2=valid2_np,
                          multiplicity=mult_np, **extra)
                _manifest(outdir, config, "overlap", spilled=store is not None)
            rs = None
        elif stream_chunk is not None:
            from sage2_tpu.stream import (
                find_overlaps_chunked,
                find_overlaps_chunked_ragged,
                prepare_reads_chunked,
            )

            with log.timed("dedup", streamed=True):
                (reads2_np, valid2_np, mult_np, n_uniq, vread_np,
                 lengths2_stream) = prepare_reads_chunked(
                    corrected_np, stream_chunk, lengths=lengths,
                    store=store,
                )
            # ~19 edges/vertex at 50x coverage -> up to ~32/read chunk
            # candidates; starting at 64x avoids two doubling retries
            # (each a full streamed pass) on dense real-scale graphs
            cap_chunk = max(1 << 16, 64 * stream_chunk)
            while True:
                with log.timed("overlap", streamed=True,
                               chunk_reads=stream_chunk):
                    if lengths is not None:
                        (e_src, e_dst, e_ovl, n_edges_i, cont,
                         ovf) = find_overlaps_chunked_ragged(
                            reads2_np, valid2_np, lengths2_stream,
                            config.min_overlap,
                            chunk_reads=2 * stream_chunk,
                            seed_len=config.effective_seed_len,
                            capacity_per_chunk=cap_chunk,
                            store=store,
                            entry_block_reads=config.entry_block_reads,
                        )
                    else:
                        e_src, e_dst, e_ovl, n_edges_i, ovf = (
                            find_overlaps_chunked(
                                reads2_np, valid2_np, config.min_overlap,
                                chunk_reads=2 * stream_chunk,
                                seed_len=config.effective_seed_len,
                                capacity_per_chunk=cap_chunk,
                                store=store,
                                entry_block_reads=config.entry_block_reads,
                            )
                        )
                if not ovf:
                    break
                cap_chunk *= 2
                log.log("overlap_retry", capacity_per_chunk=cap_chunk)
            cont_mask = None
            if lengths is not None:
                # SAGE containment removal (ragged, streamed): contained
                # vertices (either orientation) leave with their edges
                capn = reads2_np.shape[0] // 2
                cont = cont | np.roll(cont, capn)
                n_cont = int(cont.sum())
                log.log("containment", n_contained=n_cont)
                if n_cont:
                    cont_mask = cont
                    valid2_np = valid2_np & ~cont
            if store is not None and lengths is None:
                # fixed-length spill: find_overlaps_chunked already
                # wrote the padded edges_* memmaps
                edges = (e_src, e_dst, e_ovl)
            elif store is not None:
                from sage2_tpu.stream import compact_pad_edges_spill

                e_src, e_dst, e_ovl, n_edges_i = compact_pad_edges_spill(
                    store, e_src, e_dst, e_ovl, n_edges_i,
                    cont=cont_mask,
                )
                edges = (e_src, e_dst, e_ovl)
            else:
                if cont_mask is not None:
                    keepm = ~(cont_mask[e_src[:n_edges_i]]
                              | cont_mask[e_dst[:n_edges_i]])
                    e_src = e_src[:n_edges_i][keepm]
                    e_dst = e_dst[:n_edges_i][keepm]
                    e_ovl = e_ovl[:n_edges_i][keepm]
                    n_edges_i = int(keepm.sum())
                # pad to a fixed-capacity sorted edge list
                pad_to = max(1, -(-n_edges_i // (1 << 14)) * (1 << 14))
                edges = tuple(
                    np.concatenate([
                        a[:n_edges_i],
                        np.full(pad_to - n_edges_i,
                                2**31 - 1 if j < 2 else 0, np.int32),
                    ])
                    for j, a in enumerate((e_src, e_dst, e_ovl))
                )
            n_cand_i = n_edges_i
            log.log("overlap_result", n_edges=n_edges_i,
                    n_candidates=n_cand_i, n_unique_reads=n_uniq)
            extra = {}
            if lengths2_stream is not None:
                extra["lengths2"] = lengths2_stream
            if mate_of is not None:
                mate_pairs_np = _mate_pairs(vread_np, mate_of)
                extra["mate_pairs"] = mate_pairs_np
                log.log("mate_pairs", n_pairs=len(mate_pairs_np))
            if store is not None:
                # big arrays live in the spill store; the npz carries
                # only the small per-vertex/meta arrays
                _save(outdir, "edges", n_edges=n_edges_i,
                      valid2=valid2_np, multiplicity=mult_np, **extra)
            else:
                _save(outdir, "edges", src=edges[0], dst=edges[1],
                      ovl=edges[2], n_edges=n_edges_i, reads2=reads2_np,
                      valid2=valid2_np, multiplicity=mult_np, **extra)
            _manifest(outdir, config, "overlap", spilled=store is not None)
            rs = None
        else:
            rs = prepare_reads(
                jnp.asarray(corrected_np.astype(np.int32)),
                lengths=lengths_dev,
            )
        if rs is None:
            pass
        elif mesh is not None:
            from sage2_tpu.overlap.detect import join_geometry
            from sage2_tpu.parallel import sharded_find_overlaps
            from sage2_tpu.parallel.sharded import gather_edge_shards

            nd = mesh.devices.size
            M2 = rs.reads2.shape[0]
            padm = (-M2) % nd
            reads2 = jnp.concatenate(
                [rs.reads2, jnp.zeros((padm, L), rs.reads2.dtype)]
            ) if padm else rs.reads2
            valid2 = jnp.concatenate(
                [rs.valid2, jnp.zeros((padm,), bool)]
            ) if padm else rs.valid2
            lengths2 = None
            if rs.lengths2 is not None:
                lengths2 = jnp.concatenate(
                    [rs.lengths2, jnp.zeros((padm,), jnp.int32)]
                ) if padm else rs.lengths2
            Mp = M2 + padm
            geo = join_geometry(
                L, config.min_overlap, config.effective_seed_len
            )
            # per-device capacities: every array inside the sharded stage
            # is O(M/ndev + cap) — logged below as the o(global) evidence
            row_cap = max(4096, 2 * (Mp // nd) * geo.R // nd)
            join_cap = max(1 << 16, 32 * Mp // nd)
            edge_cap = join_cap
            while True:
                with log.timed("overlap", sharded=True):
                    out = sharded_find_overlaps(
                        mesh, reads2, valid2, config.min_overlap,
                        config.effective_seed_len, row_cap=row_cap,
                        join_cap=join_cap, edge_cap=edge_cap,
                        lengths=lengths2,
                    )
                    src_sh, dst_sh, ovl_sh, n_edges, ovf = out[:5]
                    src_sh.block_until_ready()
                if not bool(ovf):
                    break
                row_cap *= 2
                join_cap *= 2
                edge_cap *= 2
                log.log("overlap_retry", row_cap=row_cap,
                        join_cap=join_cap, edge_cap=edge_cap)
            # the overlap output IS the reduction's input partition:
            # device d's slice holds src range [d*Mp/nd, (d+1)*Mp/nd),
            # internally (src, dst)-sorted — keep it ON DEVICE and chain
            # it into the sharded reduce/traverse stages (no host
            # round-trip between device stages); the global edge list is
            # materialized on host ONLY for the optional stage artifact
            edges_dev = (src_sh, dst_sh, ovl_sh)
            n_edges_i = int(n_edges)
            n_cand_i = n_edges_i
            log.log(
                "overlap_device_memory",
                reads_per_device=Mp // nd,
                seed_rows_per_device=(Mp // nd) * geo.R,
                row_cap=row_cap, join_cap=join_cap, edge_cap=edge_cap,
                global_reads=Mp,
            )
            edges = (
                gather_edge_shards(src_sh, dst_sh, ovl_sh, n_edges)
                if (outdir or lengths is not None) else None
            )
            if lengths is not None:
                # SAGE containment removal (ragged): contained vertices
                # (either orientation) leave the graph with their edges.
                # The edge set changes on host, so the device-shard
                # chaining is dropped for this run (reduce re-partitions)
                cont = np.asarray(out[5])[:M2]
                capn = M2 // 2
                cont = cont | np.roll(cont, capn)
                n_cont = int(cont.sum())
                log.log("containment", n_contained=n_cont)
                if n_cont:
                    e_src, e_dst, e_ovl = edges
                    real = e_src != 2**31 - 1
                    drop = real.copy()
                    drop[real] = (cont[e_src[real]] | cont[e_dst[real]])
                    keepm = real & ~drop
                    nkeep = int(keepm.sum())
                    pad_to = e_src.shape[0]
                    ns = np.full(pad_to, 2**31 - 1, np.int32)
                    nd2 = np.full(pad_to, 2**31 - 1, np.int32)
                    no = np.zeros(pad_to, np.int32)
                    ns[:nkeep] = e_src[keepm]
                    nd2[:nkeep] = e_dst[keepm]
                    no[:nkeep] = e_ovl[keepm]
                    edges = (ns, nd2, no)
                    n_edges_i = nkeep
                    edges_dev = None
                    valid2_cont = np.asarray(rs.valid2) & ~cont
                else:
                    valid2_cont = None
            else:
                valid2_cont = None
        else:
            with log.timed("overlap"):
                res = find_overlaps_auto(
                    rs.reads2, rs.valid2, config.min_overlap,
                    config.effective_seed_len, lengths=rs.lengths2,
                )
                res.src.block_until_ready()
            assert not bool(res.overflow)
            edges = (np.asarray(res.src), np.asarray(res.dst),
                     np.asarray(res.ovl))
            n_edges_i = int(res.n_edges)
            n_cand_i = int(res.n_candidates)
            if lengths is not None:
                # SAGE containment removal: a contained read (either
                # orientation) leaves the graph; its incident edges drop
                cont = np.asarray(res.contained)
                capn = cont.shape[0] // 2
                cont = cont | np.roll(cont, capn)
                n_cont = int(cont.sum())
                log.log("containment", n_contained=n_cont)
                if n_cont:
                    e_src, e_dst, e_ovl = edges
                    real = e_src != 2**31 - 1
                    drop = real.copy()
                    drop[real] = (cont[e_src[real]] | cont[e_dst[real]])
                    keepm = real & ~drop
                    nkeep = int(keepm.sum())
                    pad_to = e_src.shape[0]
                    ns = np.full(pad_to, 2**31 - 1, np.int32)
                    nd2 = np.full(pad_to, 2**31 - 1, np.int32)
                    no = np.zeros(pad_to, np.int32)
                    ns[:nkeep] = e_src[keepm]
                    nd2[:nkeep] = e_dst[keepm]
                    no[:nkeep] = e_ovl[keepm]
                    edges = (ns, nd2, no)
                    n_edges_i = nkeep
                    valid2_cont = np.asarray(rs.valid2) & ~cont
                else:
                    valid2_cont = None
            else:
                valid2_cont = None
        if rs is not None:
            log.log("overlap_result", n_edges=n_edges_i,
                    n_candidates=n_cand_i,
                    n_unique_reads=int(rs.n_unique))
            reads2_np = np.asarray(rs.reads2, dtype=np.int8)
            valid2_np = np.asarray(rs.valid2)
            if lengths is not None and valid2_cont is not None:
                valid2_np = valid2_cont
            mult_np = np.asarray(rs.multiplicity)
            extra = {}
            if rs.lengths2 is not None:
                extra["lengths2"] = np.asarray(rs.lengths2)
            if mate_of is not None:
                mate_pairs_np = _mate_pairs(
                    np.asarray(rs.vertex_of_read), mate_of
                )
                extra["mate_pairs"] = mate_pairs_np
                log.log("mate_pairs", n_pairs=len(mate_pairs_np))
            if edges is not None:
                _save(outdir, "edges", src=edges[0], dst=edges[1],
                      ovl=edges[2], n_edges=n_edges_i, reads2=reads2_np,
                      valid2=valid2_np, multiplicity=mult_np, **extra)
                _manifest(outdir, config, "overlap", spilled=store is not None)
        if rs is not None and rs.lengths2 is not None:
            lengths2_np = np.asarray(rs.lengths2)
        elif stream_chunk is not None and lengths is not None:
            lengths2_np = lengths2_stream
        else:
            lengths2_np = None
    else:
        z = np.load(os.path.join(outdir, "edges.npz"))
        if store is not None and store.exists("edges_src"):
            edges = (store.load("edges_src"), store.load("edges_dst"),
                     store.load("edges_ovl"))
            reads2_np = store.load("reads2")
        elif "src" not in z:
            # the original run spilled the edge arrays; edges.npz carries
            # only the small metadata (ADVICE r4: fail with a real
            # message, not KeyError('src'))
            raise ValueError(
                f"edges.npz in {outdir} has no edge arrays — the original "
                f"run wrote them to a spill store; resume with the same "
                f"--spill-dir"
            )
        else:
            edges = (z["src"], z["dst"], z["ovl"])
            reads2_np = z["reads2"]
        valid2_np, mult_np = z["valid2"], z["multiplicity"]
        lengths2_np = z["lengths2"] if "lengths2" in z else None
        mate_pairs_np = z["mate_pairs"] if "mate_pairs" in z else None

    V = reads2_np.shape[0]
    vlen_arg = L if lengths2_np is None else lengths2_np

    # --- stage 4: transitive reduction (SURVEY.md §3.4) ----------------
    if start <= STAGES.index("reduce"):
        if mesh is not None:
            from sage2_tpu.parallel import sharded_transitive_reduction
            from sage2_tpu.parallel.sharded import (
                gather_edge_shards,
                partition_edges_by_src,
            )

            nd = mesh.devices.size
            if edges_dev is not None:
                # overlap output shards chain straight in: same src-range
                # partition, same per-shard sort, still on device
                s_sh, d_sh, o_sh = edges_dev
                n_edges_glob = n_edges_i
            else:
                s_np, d_np, o_np, _vd = partition_edges_by_src(
                    edges[0], edges[1], edges[2], V, nd
                )
                s_sh, d_sh, o_sh = (
                    jnp.asarray(s_np), jnp.asarray(d_np), jnp.asarray(o_np)
                )
                n_edges_glob = int(np.sum(s_np != 2**31 - 1))
            lens_sh = None
            if not isinstance(vlen_arg, int):
                from sage2_tpu.parallel.sharded import (
                    partition_vertex_range,
                )

                lens_sh = jnp.asarray(partition_vertex_range(
                    np.asarray(vlen_arg, np.int32), V, nd
                ))
            cap = config.reduce_capacity
            reqc = max(4096, 2 * s_sh.shape[1] // nd)
            while True:
                cap_dev = -(-cap // nd)
                with log.timed("reduce", capacity=cap, sharded=True):
                    (r_src, r_dst, r_ovl, r_n, r_exp,
                     r_ovf) = sharded_transitive_reduction(
                        mesh, s_sh, d_sh, o_sh, V, L,
                        req_cap=reqc,
                        cand_cap=cap_dev,
                        lengths_sh=lens_sh,
                    )
                    r_src.block_until_ready()
                if not bool(r_ovf):
                    log.log(
                        "reduce_device_memory",
                        edges_per_device=int(s_sh.shape[1]),
                        req_cap=reqc,
                        cand_cap=cap_dev, global_edges=n_edges_glob,
                    )
                    reduced_dev = (r_src, r_dst, r_ovl)
                    g_src, g_dst, g_ovl = gather_edge_shards(
                        r_src, r_dst, r_ovl, r_n
                    )
                    red_edges = (g_src, g_dst, g_ovl)
                    red_n, red_exp = int(r_n), int(r_exp)
                    break
                red_exp = int(r_exp)
                # jump past the kernel's exact expansion count (each
                # retry is a fresh compile — doubling wastes several);
                # per-device imbalance can overflow below the exact
                # global count, so also double
                grain = 1 << 16
                cap = max(
                    cap + grain, 2 * cap,
                    -(-int(red_exp * 1.05) // grain) * grain,
                )
                reqc *= 2  # request routing may also have overflowed
                log.log("reduce_retry", new_capacity=cap)
        else:
            # exact-sizing path: per-edge expansion counts come first
            # (E-sized prep, host-side numpy above 2^25 edges), so the
            # kernel is sized to the problem — no capacity retries, no
            # doomed compiles (round-2 burned 50% of e2e wall-clock on
            # in-core retry recompiles at 1 Mbp)
            from sage2_tpu.graph.reduce import (
                transitive_reduction_auto,
                transitive_reduction_spill,
            )

            with log.timed("reduce", backend=config.reduce_backend):
                # host arrays pass through as-is: the native backend
                # reduces them in place with zero transfers; the device
                # backend preps on host and uploads operands exactly once
                red = None
                if (store is not None
                        and config.reduce_backend in ("auto", "native")):
                    # marks + compacted output stay in spill memmaps;
                    # host RAM stays O(window)
                    red = transitive_reduction_spill(
                        store, edges[0], edges[1], edges[2], V, vlen_arg,
                    )
                if red is None:
                    red = transitive_reduction_auto(
                        edges[0], edges[1], edges[2], V, vlen_arg,
                        chunk_cap=1 << 24,
                        backend=config.reduce_backend,
                    )
            red_edges = (np.asarray(red.src), np.asarray(red.dst),
                         np.asarray(red.ovl))
            red_n, red_exp = int(red.n_edges), int(red.n_expansions)
        log.log("reduce_result", n_edges=red_n, n_expansions=red_exp)
        redges = red_edges
        # reduced_* spill files are produced only by
        # transitive_reduction_spill (single-device auto/native path);
        # meshed spill runs, reduce_backend='device', and the
        # native-unavailable fallback must still persist the reduced
        # graph or resume_from='traverse'/'finish' has nothing to load
        # (ADVICE r4 medium)
        if store is None or not store.exists("reduced_src"):
            _save(outdir, "reduced", src=redges[0], dst=redges[1],
                  ovl=redges[2])
        _manifest(outdir, config, "reduce", spilled=store is not None)
    elif store is not None and store.exists("reduced_src"):
        redges = (store.load("reduced_src"), store.load("reduced_dst"),
                  store.load("reduced_ovl"))
    else:
        z = np.load(os.path.join(outdir, "reduced.npz"))
        redges = (z["src"], z["dst"], z["ovl"])

    # --- stage 5: unitig labeling (SURVEY.md §3.5) ---------------------
    if start <= STAGES.index("traverse"):
        if mesh is not None:
            from sage2_tpu.parallel import (
                gather_cyclic_shards,
                partition_edges_by_src,
                sharded_contract_unitigs,
            )

            nd = mesh.devices.size
            if reduced_dev is not None:
                # reduced edge shards chain straight in, still on device
                s_sh, d_sh, o_sh = reduced_dev
            else:
                s_np, d_np, o_np, _vd = partition_edges_by_src(
                    redges[0], redges[1], redges[2], V, nd
                )
                s_sh, d_sh, o_sh = (
                    jnp.asarray(s_np), jnp.asarray(d_np), jnp.asarray(o_np)
                )
            rcap = max(4096, 2 * max(s_sh.shape[1], -(-V // nd)) // nd)
            while True:
                with log.timed("traverse", sharded=True):
                    shards, t_ovf = sharded_contract_unitigs(
                        mesh, s_sh, d_sh, o_sh, V, route_cap=rcap,
                    )
                    shards[0].block_until_ready()
                if not bool(t_ovf):
                    break
                rcap *= 2
                log.log("traverse_retry", route_cap=rcap)
            names = ["head", "dist", "nxt", "ovl_next", "outdeg", "indeg"]
            lab = {
                k: gather_cyclic_shards(sh, V)
                for k, sh in zip(names, shards)
            }
            log.log("traverse_device_memory",
                    vertices_per_device=-(-V // nd),
                    edges_per_device=int(s_sh.shape[1]),
                    route_cap=rcap, global_vertices=V)
        else:
            with log.timed("traverse"):
                labels = contract_unitigs(
                    jnp.asarray(redges[0]), jnp.asarray(redges[1]),
                    jnp.asarray(redges[2]), V,
                )
                labels.head.block_until_ready()
            lab = {k: np.asarray(v) for k, v in labels._asdict().items()}
        _save(outdir, "labels", **lab)
        _manifest(outdir, config, "traverse")
    else:
        lab = dict(np.load(os.path.join(outdir, "labels.npz")))

    # --- stage 6: host finishing + emission ----------------------------
    with log.timed("finish"):
        g = build_unitig_graph(
            lab["head"], lab["dist"], lab["ovl_next"], redges,
            valid2_np, mult_np, vlen_arg,
        )
        n_unitigs_raw = len(g.unitigs)
        capn = V // 2
        n_tips = remove_tips(g, capn, config.tip_max_reads)
        n_pruned = 0
        c1 = estimate_single_copy_coverage(g, L)
        annotate_copy_counts(g, c1)
        if config.traversal == "mincost":
            n_pruned = prune_weak_branches(g, config.branch_dominance)
            n_pruned += prune_zero_copy_branches(g, c1)
        n_bub = pop_bubbles(g, capn, config.bubble_max_reads, config.bubble_ratio)
        n_tips += remove_tips(g, capn, config.tip_max_reads)
        if config.traversal == "mincost":
            from sage2_tpu.graph.finish import mincost_paths

            annotate_copy_counts(g, c1)  # re-annotate post-cleaning
            flow_stats: dict = {}
            paths = mincost_paths(
                g, capn,
                path_penalty=config.path_penalty,
                flow_max_extra=config.flow_max_extra,
                flow_max_component=config.flow_max_component,
                stats_out=flow_stats,
            )
            log.log("flow_traversal", **flow_stats)
        else:
            paths = join_paths(g)
        do_scaffold = (
            config.scaffold and mate_pairs_np is not None
            and len(mate_pairs_np) > 0
        )
        if do_scaffold:
            from sage2_tpu.graph.finish import emit_contigs_with_placements
            from sage2_tpu.graph.scaffold import scaffold_contigs

            contigs, placements = emit_contigs_with_placements(
                g, paths, reads2_np, config, lengths=lengths2_np,
            )
            rlen_arr = (
                np.full(V, L, np.int64) if lengths2_np is None
                else np.asarray(lengths2_np, np.int64)
            )
            scaffolds, sc_report = scaffold_contigs(
                contigs, placements, mate_pairs_np, rlen_arr, V // 2,
                min_links=config.min_mate_links,
                insert_size=config.insert_size,
            )
        else:
            contigs = emit_contigs(
                g, paths, reads2_np, config, lengths=lengths2_np,
            )
            scaffolds = None
    stats = assembly_stats(contigs)
    if scaffolds is not None:
        sc_stats = assembly_stats(scaffolds)
        stats.update({
            "n_scaffolds": sc_stats["n_contigs"],
            "scaffold_n50": sc_stats["n50"],
            "scaffold_max": sc_stats["max_contig"],
            "scaffold_joins": sc_report["n_joins"],
            "insert_size": sc_report["insert_size"],
        })
        log.log("scaffold_result", **sc_report)
    log.log("finish_result", n_unitigs=n_unitigs_raw, tips_removed=n_tips,
            single_copy_coverage=round(c1, 2),
            branches_pruned=n_pruned, bubbles_popped=n_bub, **stats)
    if outdir:
        from sage2_tpu.io.writer import write_fasta
        write_fasta(os.path.join(outdir, "contigs.fasta"), contigs)
        if scaffolds is not None:
            write_fasta(
                os.path.join(outdir, "scaffolds.fasta"), scaffolds,
                prefix="scaffold",
            )
        with open(os.path.join(outdir, "stats.json"), "w") as f:
            json.dump(stats, f, indent=1)
        _manifest(outdir, config, "finish")
    if mesh is not None:
        # collective-volume ledger (SURVEY.md §5 metrics; the config-#4
        # communication model): per sharded program, dispatch counts +
        # per-dispatch collective operand bytes from trace-time shapes
        from sage2_tpu.parallel import comm

        cs = comm.summary()
        if cs:
            log.log("comm", programs=cs)
    return (scaffolds if scaffolds is not None else contigs), stats
