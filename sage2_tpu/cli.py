"""Command-line interface (SURVEY.md §2 "CLI/flags", L7).

Subcommands mirror the standalone configs of BASELINE.json:

  assemble  — full pipeline: reads -> contigs (config #1)
  correct   — k-mer counting + spectrum correction only (config #2)
  overlap   — overlap graph (+ optional transitive reduction) (config #3)
  simulate  — generate synthetic genome + reads (no-network stand-in)
  stats     — N50 etc. of a contig FASTA

Example:
  python -m sage2_tpu assemble -o out/ --k 25 --min-overlap 40 reads.fastq.gz
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import List, Optional

import numpy as np


def _add_common(p: argparse.ArgumentParser) -> None:
    p.add_argument("--k", type=int, default=25, help="k-mer length (<=31)")
    p.add_argument("--min-overlap", type=int, default=40)
    p.add_argument("--solid-threshold", type=int, default=2)
    p.add_argument("--correction-rounds", type=int, default=2)
    p.add_argument("--correction-rule",
                   choices=["single_window", "vote_all_windows"],
                   default="single_window",
                   help="spectrum-correction verdict rule: one covering"
                        " window per sub-pass (pinned default) or"
                        " RACER-style voting across ALL covering windows")
    p.add_argument("--min-contig-len", type=int, default=200)
    p.add_argument("--traversal", choices=["unitig", "mincost"],
                   default="mincost")
    p.add_argument("--candidate-capacity", type=int, default=1 << 20)
    p.add_argument("--reduce-capacity", type=int, default=1 << 20)
    p.add_argument("--reduce-backend",
                   choices=["auto", "device", "native"], default="auto",
                   help="single-device transitive-reduction backend:"
                        " host C++ (native), device kernels (device), or"
                        " pick by edge-list residency (auto)")
    p.add_argument("--length-policy",
                   choices=["strict", "trim", "filter", "pad"],
                   default="strict",
                   help="how to handle mixed read lengths at ingest;"
                        " 'pad' keeps every read at its own length"
                        " (lossless ragged mode)")
    p.add_argument("--platform", default=None,
                   help="force a jax platform (e.g. cpu, axon)")
    p.add_argument("--mesh", type=int, default=None, metavar="N",
                   help="shard stages over an N-device mesh")
    p.add_argument("--max-device-reads", type=int, default=None,
                   metavar="N",
                   help="stream count/correct/dedup/overlap in chunks of"
                        " N reads when the input is larger (bounds device"
                        " memory; bit-identical to in-core)")
    p.add_argument("--spill-dir", default=None, metavar="DIR",
                   help="spill the streamed pipeline's big host arrays"
                        " (corrected reads, read store, edge list) to"
                        " memmaps under DIR, bounding host RSS by"
                        " O(chunk + reduced graph); bit-identical"
                        " results (requires --max-device-reads;"
                        " single-device path)")
    p.add_argument("--entry-block-reads", type=int, default=None,
                   metavar="N",
                   help="streamed overlap: also stream the ENTRY side in"
                        " blocks of N reads (block-nested join) — lifts"
                        " the single-device HBM ceiling; default: auto"
                        " above the measured ceiling; bit-identical")
    p.add_argument("--paired", action="store_true",
                   help="treat input files as (R1, R2) pairs; mate"
                        " pairing survives dedup into the edges artifact"
                        " and drives contig scaffolding")
    p.add_argument("--no-scaffold", action="store_true",
                   help="keep mate pairs but skip scaffolding")
    p.add_argument("--min-mate-links", type=int, default=3,
                   help="supporting pairs required to accept a scaffold"
                        " join")
    p.add_argument("--insert-size", type=int, default=None,
                   help="outer mate-pair insert size; default: estimated"
                        " from same-contig proper pairs")


def _config(args) -> "AssemblyConfig":
    from sage2_tpu.config import AssemblyConfig

    return AssemblyConfig(
        k=args.k,
        min_overlap=args.min_overlap,
        solid_threshold=args.solid_threshold,
        correction_rounds=args.correction_rounds,
        correction_rule=getattr(args, "correction_rule", "single_window"),
        min_contig_len=args.min_contig_len,
        traversal=args.traversal,
        candidate_capacity=args.candidate_capacity,
        reduce_capacity=args.reduce_capacity,
        reduce_backend=getattr(args, "reduce_backend", "auto"),
        mesh_shape=(args.mesh,) if getattr(args, "mesh", None) else None,
        max_device_reads=getattr(args, "max_device_reads", None),
        spill_dir=getattr(args, "spill_dir", None),
        entry_block_reads=getattr(args, "entry_block_reads", None),
        scaffold=not getattr(args, "no_scaffold", False),
        min_mate_links=getattr(args, "min_mate_links", 3),
        insert_size=getattr(args, "insert_size", None),
    )


def _setup_platform(args) -> None:
    if getattr(args, "platform", None):
        import jax

        jax.config.update("jax_platforms", args.platform)
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()


def main(argv: Optional[List[str]] = None) -> int:
    ap = argparse.ArgumentParser(
        prog="sage2_tpu",
        description="TPU-native overlap-graph assembler (SAGE2 method)",
    )
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("assemble", help="full pipeline: reads -> contigs")
    _add_common(p)
    p.add_argument("-o", "--outdir", required=True)
    p.add_argument("--resume-from",
                   choices=["correct", "overlap", "reduce", "traverse",
                            "finish"])
    p.add_argument("--profile", metavar="DIR",
                   help="dump a jax.profiler trace of the device stages")
    p.add_argument("reads", nargs="+", help="FASTQ/FASTA files (gz ok)")

    p = sub.add_parser("correct", help="count + spectrum-correct only")
    _add_common(p)
    p.add_argument("-o", "--output", required=True,
                   help="corrected reads FASTA (.gz ok)")
    p.add_argument("reads", nargs="+")

    p = sub.add_parser("overlap", help="overlap graph (+ reduction)")
    _add_common(p)
    p.add_argument("-o", "--output", required=True, help="edge TSV output")
    p.add_argument("--no-reduce", action="store_true",
                   help="skip transitive reduction")
    p.add_argument("--no-correct", action="store_true",
                   help="skip error correction")
    p.add_argument("reads", nargs="+")

    p = sub.add_parser("simulate", help="synthetic genome + reads")
    p.add_argument("-o", "--output", required=True, help="FASTQ out (.gz ok)")
    p.add_argument("--genome-out", help="also write the genome FASTA")
    p.add_argument("--genome-len", type=int, default=100_000)
    p.add_argument("--read-len", type=int, default=100)
    p.add_argument("--coverage", type=float, default=40.0)
    p.add_argument("--error-rate", type=float, default=0.005)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--circular", action="store_true")
    p.add_argument("--paired", action="store_true",
                   help="write an (R1, R2) FASTQ pair (derives the R2"
                        " path from the output path)")
    p.add_argument("--insert-size", type=int, default=400)
    p.add_argument("--insert-sd", type=int, default=30)

    p = sub.add_parser("stats", help="assembly stats of a FASTA")
    p.add_argument("fasta")
    p.add_argument("--genome", help="genome FASTA for genome-fraction")

    args = ap.parse_args(argv)

    if args.cmd == "simulate":
        from sage2_tpu.data import simulate_genome, simulate_reads, write_fastq
        from sage2_tpu.io.writer import write_fasta

        genome = simulate_genome(args.genome_len, seed=args.seed)
        if args.paired:
            from sage2_tpu.data import simulate_read_pairs

            reads, _mate_of, _ = simulate_read_pairs(
                genome, read_len=args.read_len, coverage=args.coverage,
                insert_mean=args.insert_size, insert_sd=args.insert_sd,
                error_rate=args.error_rate, seed=args.seed + 1,
            )
            n = reads.shape[0] // 2
            r2_path = _mate_path(args.output)
            write_fastq(args.output, reads[:n], name_prefix="sim/1")
            write_fastq(r2_path, reads[n:], name_prefix="sim/2")
            print(f"wrote {n} read pairs x {args.read_len} bp to "
                  f"{args.output} + {r2_path}", file=sys.stderr)
        else:
            reads, _ = simulate_reads(
                genome, read_len=args.read_len, coverage=args.coverage,
                error_rate=args.error_rate, seed=args.seed + 1,
                circular=args.circular,
            )
            if args.output.endswith((".fa", ".fasta", ".fna")):
                write_fasta(args.output, [r for r in reads.astype(np.int8)],
                            prefix="read")
            else:
                write_fastq(args.output, reads)
            print(f"wrote {reads.shape[0]} reads x {args.read_len} bp "
                  f"to {args.output}", file=sys.stderr)
        if args.genome_out:
            write_fasta(args.genome_out, [genome.astype(np.int8)],
                        prefix="genome")
        return 0

    if args.cmd == "stats":
        from sage2_tpu.utils.stats import assembly_stats

        contigs = _read_fasta_ragged(args.fasta)
        genome = None
        if args.genome:
            g = _read_fasta_ragged(args.genome)
            genome = g[0] if g else None
        print(json.dumps(assembly_stats(contigs, genome), indent=1))
        return 0

    _setup_platform(args)
    from sage2_tpu.io import load_reads

    mate_of = None
    read_lengths = None
    if args.length_policy == "pad":
        if getattr(args, "paired", False):
            from sage2_tpu.io.fastq import load_read_pairs_ragged

            reads, read_lengths, mate_of = load_read_pairs_ragged(
                args.reads
            )
        else:
            from sage2_tpu.io.fastq import load_reads_ragged

            reads, read_lengths = load_reads_ragged(args.reads)
        if reads.size and (read_lengths == read_lengths[0]).all():
            read_lengths = None        # uniform after all: fixed path
    elif getattr(args, "paired", False):
        from sage2_tpu.io.fastq import load_read_pairs

        reads, mate_of = load_read_pairs(
            args.reads, length_policy=args.length_policy
        )
    else:
        reads = load_reads(args.reads, length_policy=args.length_policy)
    if reads.size == 0:
        print("no reads loaded", file=sys.stderr)
        return 1
    cfg = _config(args)

    if args.cmd == "assemble":
        from sage2_tpu.pipeline import assemble

        contigs, stats = assemble(
            reads, cfg, outdir=args.outdir,
            resume_from=getattr(args, "resume_from", None),
            profile_dir=getattr(args, "profile", None),
            mate_of=mate_of,
            lengths=read_lengths,
        )
        print(json.dumps(stats, indent=1))
        return 0

    if args.cmd == "correct":
        import jax.numpy as jnp

        from sage2_tpu.io.writer import write_fasta
        from sage2_tpu.kmer import correct_reads

        corrected = np.asarray(
            correct_reads(
                jnp.asarray(reads.astype(np.int32)), cfg.k,
                cfg.solid_threshold, cfg.correction_rounds,
            ),
            dtype=np.int8,
        )
        write_fasta(args.output, list(corrected), prefix="read")
        print(f"wrote {corrected.shape[0]} corrected reads", file=sys.stderr)
        return 0

    if args.cmd == "overlap":
        import jax.numpy as jnp

        from sage2_tpu.graph.reduce import transitive_reduction
        from sage2_tpu.kmer import correct_reads
        from sage2_tpu.overlap import find_overlaps, prepare_reads

        r = jnp.asarray(reads.astype(np.int32))
        if not args.no_correct:
            r = correct_reads(r, cfg.k, cfg.solid_threshold,
                              cfg.correction_rounds)
        rs = prepare_reads(r)
        res = find_overlaps(
            rs.reads2, rs.valid2, cfg.min_overlap,
            cfg.effective_seed_len, capacity=cfg.candidate_capacity,
        )
        if bool(res.overflow):
            print("candidate capacity overflow; raise --candidate-capacity",
                  file=sys.stderr)
            return 2
        src, dst, ovl = res.src, res.dst, res.ovl
        if not args.no_reduce:
            red = transitive_reduction(
                src, dst, ovl, rs.reads2.shape[0], reads.shape[1],
                capacity=cfg.reduce_capacity,
            )
            src, dst, ovl = red.src, red.dst, red.ovl
        src, dst, ovl = np.asarray(src), np.asarray(dst), np.asarray(ovl)
        with open(args.output, "w") as f:
            f.write("#src\tdst\toverlap\n")
            for a, b, o in zip(src, dst, ovl):
                if a != 2**31 - 1:
                    f.write(f"{a}\t{b}\t{o}\n")
        print(f"wrote edges to {args.output}", file=sys.stderr)
        return 0

    return 1


def _mate_path(r1_path: str) -> str:
    """Derive an R2 path from an R1 path: swap an 'R1'/'_1' token in the
    BASENAME only (directory names stay untouched), or insert '_R2'
    before the final extension."""
    import os.path

    head, base = os.path.split(r1_path)
    for a, b in (("R1", "R2"), ("_1.", "_2.")):
        if a in base:
            return os.path.join(head, base.replace(a, b, 1))
    stem, ext = os.path.splitext(base)
    if ext == ".gz":  # keep compound extensions like .fastq.gz together
        stem2, ext2 = os.path.splitext(stem)
        stem, ext = stem2, ext2 + ext
    return os.path.join(head, f"{stem}_R2{ext}")


def _read_fasta_ragged(path: str) -> List[np.ndarray]:
    import gzip

    from sage2_tpu.ops.bitpack import encode_ascii

    opener = gzip.open if path.endswith(".gz") else open
    seqs, cur = [], []
    with opener(path, "rb") as f:
        for line in f:
            line = line.strip()
            if line.startswith(b">"):
                if cur:
                    seqs.append(b"".join(cur))
                    cur = []
            elif line:
                cur.append(line)
    if cur:
        seqs.append(b"".join(cur))
    return [
        encode_ascii(np.frombuffer(s, dtype=np.uint8)).astype(np.int8)
        for s in seqs
    ]


if __name__ == "__main__":
    sys.exit(main())
