"""End-to-end assembly tests: the minimum slice of SURVEY.md §7 step 6."""

from dataclasses import replace as dataclasses_replace

import numpy as np
import pytest

from sage2_tpu import AssemblyConfig
from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.pipeline import assemble
from sage2_tpu.utils.stats import assembly_stats

pytestmark = pytest.mark.slow  # multi-second e2e/chunked/sharded cases


CFG = AssemblyConfig(
    k=15, min_overlap=25, solid_threshold=2, min_contig_len=150,
    candidate_capacity=1 << 17, reduce_capacity=1 << 18,
)


def test_assemble_clean_reads_recovers_genome():
    genome = simulate_genome(3000, seed=101)
    reads, _ = simulate_reads(genome, read_len=50, coverage=25, seed=102)
    contigs, stats = assemble(reads, CFG)
    assert stats["n_contigs"] >= 1
    s = assembly_stats(contigs, genome)
    assert s["genome_fraction"] > 0.95
    # near-complete reconstruction: the largest contig spans most of it
    assert s["max_contig"] > 0.9 * len(genome)


def test_assemble_noisy_reads():
    from sage2_tpu.utils.stats import count_misassembled

    genome = simulate_genome(3000, seed=111)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=30, error_rate=0.01, seed=112
    )
    contigs, stats = assemble(reads, CFG)
    s = assembly_stats(contigs, genome)
    assert s["genome_fraction"] > 0.9
    assert s["n50"] > 1000
    assert count_misassembled(contigs, genome) == 0


def test_assemble_mincost_resolves_error_branches():
    """Coverage-cost pruning should reassemble a noisy genome into few
    contigs without misassembling (SURVEY.md §2 cost model)."""
    from sage2_tpu.utils.stats import count_misassembled

    genome = simulate_genome(8000, seed=115)
    reads, _ = simulate_reads(
        genome, read_len=60, coverage=35, error_rate=0.008, seed=116
    )
    uni, _ = assemble(reads, dataclasses_replace(CFG, traversal="unitig"))
    mc, _ = assemble(reads, dataclasses_replace(CFG, traversal="mincost"))
    assert count_misassembled(mc, genome) == 0
    assert len(mc) <= len(uni)
    s = assembly_stats(mc, genome)
    assert s["genome_fraction"] > 0.98
    assert s["n50"] >= assembly_stats(uni, genome)["n50"]


def test_assemble_repeats_no_misassembly():
    """Exact repeats must break contigs, not join them incorrectly."""
    from sage2_tpu.utils.stats import count_misassembled

    genome = simulate_genome(6000, seed=117, repeat_fraction=0.1,
                             repeat_len=300)
    reads, _ = simulate_reads(genome, read_len=50, coverage=30, seed=118)
    contigs, stats = assemble(reads, CFG)
    assert count_misassembled(contigs, genome) == 0
    s = assembly_stats(contigs, genome)
    assert s["genome_fraction"] > 0.9


def test_assemble_deterministic():
    genome = simulate_genome(1500, seed=121)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=20, error_rate=0.005, seed=122
    )
    c1, _ = assemble(reads, CFG)
    c2, _ = assemble(reads, CFG)
    assert len(c1) == len(c2)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)
    # permutation invariance: shuffled input reads, same contigs
    perm = np.random.default_rng(0).permutation(reads.shape[0])
    c3, _ = assemble(reads[perm], CFG)
    assert len(c1) == len(c3)
    for a, b in zip(c1, c3):
        np.testing.assert_array_equal(a, b)


def test_assemble_artifacts_and_resume(tmp_path):
    genome = simulate_genome(1200, seed=131)
    reads, _ = simulate_reads(genome, read_len=50, coverage=20, seed=132)
    out = str(tmp_path / "asm")
    c1, s1 = assemble(reads, CFG, outdir=out)
    import os

    for f in ["corrected.npz", "edges.npz", "reduced.npz", "labels.npz",
              "contigs.fasta", "stats.json", "manifest.json"]:
        assert os.path.exists(os.path.join(out, f)), f
    # resume from the reduce stage reuses artifacts and reproduces output
    c2, s2 = assemble(reads, CFG, outdir=out, resume_from="reduce")
    assert s1 == s2
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_assemble_circular_genome():
    genome = simulate_genome(2000, seed=141)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=25, seed=142, circular=True
    )
    contigs, stats = assemble(reads, CFG)
    # circular genome -> one cycle, broken deterministically into one contig
    assert stats["n_contigs"] >= 1
    assert stats["max_contig"] > 0.9 * len(genome)
