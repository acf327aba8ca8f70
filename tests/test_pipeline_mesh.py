"""End-to-end assembly on a virtual 8-device mesh must equal single-device."""

from dataclasses import replace

import numpy as np
import pytest

from sage2_tpu import AssemblyConfig
from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.pipeline import assemble

pytestmark = pytest.mark.slow  # multi-second e2e/chunked/sharded cases

CFG = AssemblyConfig(
    k=15, min_overlap=25, min_contig_len=150,
)


def test_assemble_on_mesh_matches_single_device():
    genome = simulate_genome(2000, seed=501)
    # 501 reads: deliberately NOT divisible by 8 (exercises padding)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=12.5, error_rate=0.01, seed=502
    )
    single, s_stats = assemble(reads, CFG)
    meshed, m_stats = assemble(reads, replace(CFG, mesh_shape=(8,)))
    assert s_stats == m_stats
    assert len(single) == len(meshed)
    for a, b in zip(single, meshed):
        np.testing.assert_array_equal(a, b)


def test_assemble_on_mesh_with_artifacts_and_resume(tmp_path):
    """Meshed run with an outdir still writes stage artifacts (the host
    edge gather is optional but must work), and resume-from re-enters the
    meshed pipeline through the host-partition fallback."""
    genome = simulate_genome(1500, seed=511)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=12, error_rate=0.01, seed=512
    )
    cfg = replace(CFG, mesh_shape=(8,))
    out = str(tmp_path / "mesh_out")
    meshed, m_stats = assemble(reads, cfg, outdir=out)
    import os

    for artifact in ("corrected.npz", "edges.npz", "reduced.npz",
                     "labels.npz", "contigs.fasta", "stats.json"):
        assert os.path.exists(os.path.join(out, artifact)), artifact
    resumed, r_stats = assemble(reads, cfg, outdir=out,
                                resume_from="reduce")
    assert m_stats == r_stats
    for a, b in zip(meshed, resumed):
        np.testing.assert_array_equal(a, b)


def test_assemble_streamed_and_meshed_matches_single_device():
    """BOTH scaling mechanisms at once (BASELINE.json config #4 shape):
    streaming chunks through the mesh is bit-identical to in-core."""
    genome = simulate_genome(2000, seed=501)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=12.5, error_rate=0.01, seed=502
    )
    single, s_stats = assemble(reads, CFG)
    both, b_stats = assemble(
        reads, replace(CFG, mesh_shape=(8,), max_device_reads=100)
    )
    assert s_stats == b_stats
    for a, b in zip(single, both):
        np.testing.assert_array_equal(a, b)
