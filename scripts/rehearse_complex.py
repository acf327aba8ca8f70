"""Config #5 complexity rehearsal (VERDICT round-3 #7): a repeat-rich
two-chromosome genome at tens of Mbp, streamed through the full
pipeline on the bench chip.

Watches the three config-#5 risk axes: the min-cost flow's
greedy-fallback rate (flow_max_component), misassembly count from the
alignment-based validator, and finish-stage wall clock, plus the usual
stage table / peak RSS.

Env: SAGE2_CPLX_GENOME (20_000_000), SAGE2_CPLX_COVERAGE (40),
SAGE2_CPLX_CHUNK (500_000), SAGE2_CPLX_OUTDIR, SAGE2_CPLX_RESUME,
SAGE2_CPLX_DIVERGENCE (0.01).
"""
from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    genome_len = int(os.environ.get("SAGE2_CPLX_GENOME", 20_000_000))
    coverage = float(os.environ.get("SAGE2_CPLX_COVERAGE", 40))
    chunk = int(os.environ.get("SAGE2_CPLX_CHUNK", 500_000))
    outdir = os.environ.get("SAGE2_CPLX_OUTDIR") or None
    resume = os.environ.get("SAGE2_CPLX_RESUME") or None
    divergence = float(os.environ.get("SAGE2_CPLX_DIVERGENCE", 0.01))
    read_len, err = 100, 0.005

    cache_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    import jax

    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    if os.environ.get("SAGE2_PLATFORM"):
        # the axon sitecustomize pins jax_platforms programmatically, so
        # the JAX_PLATFORMS env var alone doesn't win
        jax.config.update("jax_platforms", os.environ["SAGE2_PLATFORM"])
    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    from sage2_tpu.utils.platform import warmup_compile

    # absorb the unpredictable per-process first-compile cost
    # (280-1500 s on the relay) before any stage timer starts
    warmup_compile()

    # relay-stall watchdog (VERDICT r4 Weak #7): a degraded relay once
    # stalled a first dispatch >40 min and ate the round's rehearsal.
    # Default 2400 s clears the measured 280-1500 s first-compile
    # ceiling; any chunk heartbeat resets it. SAGE2_WATCHDOG_SECS=0
    # disables.
    from sage2_tpu.utils import watchdog

    wd = float(os.environ.get("SAGE2_WATCHDOG_SECS", 2400))
    if wd > 0:
        watchdog.start(wd)
        log(f"watchdog armed: {wd:.0f}s no-progress limit")

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.data import simulate_complex_genome, simulate_reads
    from sage2_tpu.pipeline import assemble
    from sage2_tpu.utils.metrics import MetricsLog
    from sage2_tpu.utils.stats import (
        count_misassembled,
        genome_fraction,
    )

    log(f"device: {jax.devices()[0]}")
    t0 = time.perf_counter()
    # repeat load scales with genome size: ~2.5% dispersed + ~0.5%
    # tandem at the default 20 Mbp (the structure class, not the exact
    # human density — config #5's tangles in rehearsal form)
    fam = int(os.environ.get("SAGE2_CPLX_FAMILIES", 6))
    copies = int(os.environ.get(
        "SAGE2_CPLX_COPIES", max(10, genome_len // 160_000)
    ))
    chroms = simulate_complex_genome(
        genome_len, seed=17, n_chromosomes=2,
        dispersed_families=fam, dispersed_copies=copies,
        dispersed_len=600,
        tandem_loci=max(10, genome_len // 300_000), tandem_unit=150,
        tandem_copies=6,
        divergence=divergence,
    )
    read_parts = []
    for ci, g in enumerate(chroms):
        rd, _ = simulate_reads(
            g, read_len=read_len, coverage=coverage, error_rate=err,
            seed=100 + ci,
        )
        read_parts.append(rd)
    reads = np.concatenate(read_parts)
    del read_parts
    n_reads = reads.shape[0]
    log(f"input: {n_reads} reads x {read_len} bp from "
        f"{len(chroms)} chromosomes ({genome_len} bp total, "
        f"{coverage}x, err {err}, repeat divergence {divergence}) "
        f"[simulated in {time.perf_counter()-t0:.1f}s]")

    cfg = AssemblyConfig(
        k=25, min_overlap=40, max_device_reads=chunk,
        spill_dir=os.environ.get("SAGE2_CPLX_SPILL_DIR") or None,
    )
    stage_secs = {}
    extra = {}

    class _Spy(MetricsLog):
        def log(self, event, **fields):
            super().log(event, **fields)
            if "seconds" in fields:
                stage_secs[event] = stage_secs.get(event, 0.0) + fields[
                    "seconds"]
            if event == "flow_traversal":
                extra.update(fields)

    t0 = time.perf_counter()
    contigs, stats = assemble(
        reads, cfg, outdir=outdir, resume_from=resume, metrics=_Spy(),
    )
    wall = time.perf_counter() - t0

    genome_cat = np.concatenate(chroms)
    t0 = time.perf_counter()
    gf = genome_fraction(contigs, genome_cat)
    mis = count_misassembled(contigs, genome_cat)
    per_chrom = [genome_fraction(contigs, g) for g in chroms]
    val_s = time.perf_counter() - t0
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024

    log(f"stages (s): " + ", ".join(
        f"{k} {v:.1f}" for k, v in stage_secs.items()))
    log(f"flow: {extra}")
    log(f"validation ({val_s:.0f}s): genome_fraction={gf:.4f} "
        f"per-chrom={['%.4f' % p for p in per_chrom]} "
        f"misassembled={mis}/{len(contigs)}")
    log(f"peak host RSS: {rss} MB")
    print(json.dumps({
        "metric": "complex_rehearsal_wall_clock_s",
        "value": round(wall, 1),
        "unit": "s",
        "detail": {
            "n_reads": n_reads, "genome_len": genome_len,
            "stages_s": {k: round(v, 1) for k, v in stage_secs.items()},
            "stats": stats, "flow": extra,
            "genome_fraction": round(gf, 4),
            "misassembled": mis,
            "n_contigs": len(contigs),
            "peak_rss_mb": rss,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
