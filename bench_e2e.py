"""End-to-end assembly wall-clock benchmark (BASELINE.json `metric`:
"E. coli assembly wall-clock").

Assembles a synthetic E. coli-scale input (default 4.6 Mbp x 50x,
100 bp reads, 0.5% error) through the full pipeline on the current
device and prints ONE JSON line:
  {"metric": "e2e_assembly_wall_clock_s", "value": S, "unit": "s", ...}
with the per-stage breakdown, assembly stats (N50, contigs, genome
fraction) and peak host RSS on stderr.

Env knobs: SAGE2_E2E_GENOME (4600000), SAGE2_E2E_COVERAGE (50),
SAGE2_E2E_READLEN (100), SAGE2_E2E_ERR (0.005),
SAGE2_E2E_MAX_DEVICE_READS (0 = in-core), SAGE2_E2E_OUTDIR (save stage
artifacts there for resumable reruns), SAGE2_E2E_RESUME (stage name to
resume from; wall-clock then covers only the remaining stages).
"""

from __future__ import annotations

import json
import os
import resource
import sys
import time

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    genome_len = int(os.environ.get("SAGE2_E2E_GENOME", 4_600_000))
    coverage = float(os.environ.get("SAGE2_E2E_COVERAGE", 50))
    read_len = int(os.environ.get("SAGE2_E2E_READLEN", 100))
    err = float(os.environ.get("SAGE2_E2E_ERR", 0.005))
    max_dev = int(os.environ.get("SAGE2_E2E_MAX_DEVICE_READS", 0))
    outdir = os.environ.get("SAGE2_E2E_OUTDIR") or None
    resume = os.environ.get("SAGE2_E2E_RESUME") or None

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             ".jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        log("compilation cache unavailable:", e)

    from sage2_tpu.utils.platform import ensure_backend

    ensure_backend()
    from sage2_tpu.utils.platform import warmup_compile

    # absorb the unpredictable per-process first-compile cost
    # (280-1500 s on the relay) before any stage timer starts
    warmup_compile()

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.pipeline import assemble
    from sage2_tpu.utils.metrics import MetricsLog

    log(f"device: {jax.devices()[0]}")
    t0 = time.perf_counter()
    genome = simulate_genome(genome_len, seed=7)
    reads, _ = simulate_reads(
        genome, read_len=read_len, coverage=coverage, error_rate=err, seed=8
    )
    n_reads = reads.shape[0]
    log(f"input: {n_reads} reads x {read_len} bp "
        f"({genome_len} bp genome, {coverage}x, err {err}) "
        f"[simulated in {time.perf_counter()-t0:.1f}s]")

    cfg = AssemblyConfig(
        k=25, min_overlap=40,
        max_device_reads=max_dev or None,
        spill_dir=os.environ.get("SAGE2_E2E_SPILL_DIR") or None,
    )
    stage_secs = {}

    class _Spy(MetricsLog):
        def log(self, event, **fields):
            if "seconds" in fields:
                stage_secs[event] = stage_secs.get(event, 0.0) + (
                    fields["seconds"]
                )
            super().log(event, **fields)

    t0 = time.perf_counter()
    contigs, stats = assemble(
        reads, cfg, metrics=_Spy(None), outdir=outdir, resume_from=resume,
    )
    wall = time.perf_counter() - t0

    # reference-recovery metric: aligned genome fraction (tolerates the
    # residual errors real assemblies carry)
    from sage2_tpu.utils.stats import genome_fraction

    gf = genome_fraction(contigs, genome)
    peak_rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6
    log(f"stages (s): " + ", ".join(
        f"{k}={v:.1f}" for k, v in stage_secs.items()))
    log(f"stats: {stats}; genome_fraction={gf:.4f}; "
        f"peak_host_rss={peak_rss:.2f} GB")
    print(json.dumps({
        "metric": "e2e_assembly_wall_clock_s",
        "value": round(wall, 2),
        "unit": "s",
        "vs_baseline": None,
        "detail": {
            "n_reads": n_reads, "genome_len": genome_len,
            "stages_s": {k: round(v, 2) for k, v in stage_secs.items()},
            "n50": stats.get("n50"), "n_contigs": stats.get("n_contigs"),
            "genome_fraction": round(gf, 4),
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
