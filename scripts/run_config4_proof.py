"""Config-#4-shape COMPLETION PROOF: streamed + sharded + spilled
assembly of ~2 M reads on the virtual 8-device CPU mesh (VERDICT r4
#6 — round 3's attempt never completed; this is a correctness/
completion demonstration, NOT a perf claim: 8 virtual devices share 2
physical cores here).

Records: completion, assembly stats, per-stage seconds, peak RSS, and
the collective-volume ledger (parallel.comm) — the config-#4
communication model — into BASELINE.md-ready JSON.

Env: SAGE2_C4_READS (2_000_000), SAGE2_C4_CHUNK (250_000),
SAGE2_C4_NDEV (8), SAGE2_C4_SPILL_DIR, SAGE2_C4_OUTDIR.
"""
from __future__ import annotations

import json
import os
import resource
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# virtual mesh BEFORE jax init; generous collective timeouts (8 virtual
# devices share 2 cores — the default 20/40 s rendezvous watchdog killed
# the round-3 attempt under host load)
ndev = int(os.environ.get("SAGE2_C4_NDEV", 8))
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    _flags += f" --xla_force_host_platform_device_count={ndev}"
if "collective_timeout" not in _flags:
    _flags += (" --xla_cpu_collective_timeout_seconds=1200"
               " --xla_cpu_collective_call_terminate_timeout_seconds=2400")
os.environ["XLA_FLAGS"] = _flags.strip()

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main() -> int:
    n_reads = int(os.environ.get("SAGE2_C4_READS", 2_000_000))
    chunk = int(os.environ.get("SAGE2_C4_CHUNK", 250_000))
    spill = os.environ.get("SAGE2_C4_SPILL_DIR") or None
    outdir = os.environ.get("SAGE2_C4_OUTDIR") or None
    read_len, cov, err = 100, 50.0, 0.005

    import jax

    jax.config.update("jax_platforms", "cpu")
    assert len(jax.devices()) >= ndev, jax.devices()

    from sage2_tpu.utils import watchdog

    wd = float(os.environ.get("SAGE2_WATCHDOG_SECS", 3600))
    if wd > 0:
        watchdog.start(wd)

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.parallel import comm
    from sage2_tpu.pipeline import assemble
    from sage2_tpu.utils.metrics import MetricsLog
    from sage2_tpu.utils.stats import count_misassembled, genome_fraction

    genome_len = int(n_reads * read_len / cov)
    genome = simulate_genome(genome_len, seed=7)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=cov,
                              error_rate=err, seed=8)
    reads = reads[:n_reads]
    log(f"config-#4 proof: {reads.shape[0]} reads x {read_len} bp "
        f"({genome_len} bp, {cov}x) on {ndev} virtual devices, "
        f"chunk={chunk}, spill={spill}")

    cfg = AssemblyConfig(
        k=25, min_overlap=40, mesh_shape=(ndev,),
        max_device_reads=chunk, spill_dir=spill,
    )
    stage_secs = {}

    class _Spy(MetricsLog):
        def log(self, event, **fields):
            super().log(event, **fields)
            if "seconds" in fields:
                stage_secs[event] = stage_secs.get(event, 0.0) + fields[
                    "seconds"]

    comm.reset()
    t0 = time.perf_counter()
    contigs, stats = assemble(reads, cfg, outdir=outdir, metrics=_Spy())
    wall = time.perf_counter() - t0
    gf = genome_fraction(contigs, genome)
    mis = count_misassembled(contigs, genome)
    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss // 1024
    cs = comm.summary()

    log(f"stages (s): " + ", ".join(
        f"{k} {v:.1f}" for k, v in stage_secs.items()))
    log(f"comm model: {json.dumps(cs)}")
    log(f"genome_fraction={gf:.4f} misassembled={mis}/{len(contigs)} "
        f"peak RSS {rss} MB")
    print(json.dumps({
        "metric": "config4_proof_wall_clock_s",
        "value": round(wall, 1),
        "unit": "s",
        "detail": {
            "n_reads": int(reads.shape[0]), "ndev": ndev,
            "stages_s": {k: round(v, 1) for k, v in stage_secs.items()},
            "stats": stats, "genome_fraction": round(gf, 4),
            "misassembled": mis, "peak_rss_mb": rss,
            "comm_model": cs,
        },
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
