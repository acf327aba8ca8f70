"""Assembly QUALITY under repeat stress, in-suite (VERDICT r4 #7).

Config #5's risk is misassembly across repeat copies: a dispersed
family whose copies diverge ~1% plus tandem satellite arrays — the
structures that tangle an overlap graph. Until now this was only
checked by the (long-running) rehearsal script; these tests red-line
misassembly regressions on small instances of the same genome class
for the in-core, streamed, and streamed+spilled paths.
"""

import numpy as np
import pytest

from sage2_tpu.config import AssemblyConfig
from sage2_tpu.data import simulate_complex_genome, simulate_reads
from sage2_tpu.pipeline import assemble
from sage2_tpu.utils.stats import count_misassembled, genome_fraction

pytestmark = pytest.mark.slow


def _complex_input(total=200_000, seed=71, divergence=0.01):
    chroms = simulate_complex_genome(
        total, seed=seed, n_chromosomes=2,
        dispersed_families=2, dispersed_copies=12, dispersed_len=600,
        tandem_loci=3, tandem_unit=150, tandem_copies=5,
        divergence=divergence,
    )
    parts = []
    for ci, g in enumerate(chroms):
        rd, _ = simulate_reads(g, read_len=100, coverage=40,
                               error_rate=0.005, seed=seed + 10 + ci)
        parts.append(rd)
    return chroms, np.concatenate(parts)


_CFG = AssemblyConfig(k=25, min_overlap=40)


def _check_quality(contigs, chroms, min_gf=0.95):
    genome = np.concatenate(chroms)
    mis = count_misassembled(contigs, genome)
    gf = genome_fraction(contigs, genome)
    assert mis == 0, f"{mis}/{len(contigs)} misassembled contigs"
    assert gf >= min_gf, f"genome_fraction {gf:.4f} < {min_gf}"
    return gf


def test_repeat_quality_incore():
    chroms, reads = _complex_input()
    contigs, stats = assemble(reads, _CFG)
    # this 200 kbp instance is deliberately repeat-dense (~7% repeat
    # content vs config #5's ~3%): baseline gf measured 0.9346 with 0
    # misassemblies — the threshold red-lines regressions, misassembly
    # is the hard gate
    gf = _check_quality(contigs, chroms, min_gf=0.92)
    # the flow traversal must actually run (not fall back wholesale)
    assert stats.get("flow_fallbacks", 0) <= stats.get(
        "flow_components", 1
    ) // 2, stats


def test_repeat_quality_streamed_spilled(tmp_path):
    from dataclasses import replace

    chroms, reads = _complex_input(seed=73)
    cfg = replace(_CFG, max_device_reads=20_000,
                  spill_dir=str(tmp_path / "spill"))
    contigs, stats = assemble(reads, cfg)
    _check_quality(contigs, chroms, min_gf=0.92)
    # streamed+spilled == in-core bit-identity on the same input
    base, bstats = assemble(reads, _CFG)
    assert len(base) == len(contigs)
    for a, b in zip(base, contigs):
        np.testing.assert_array_equal(a, b)


def test_repeat_quality_divergence_zero():
    """EXACT repeat copies (divergence=0) — the information-theoretic
    worst case: 100 bp reads cannot span a 600 bp identical repeat, so
    flank pairing through a repeat hub is fundamentally ambiguous and
    the min-cost Euler decomposition (the SAGE method, SURVEY.md §3.5)
    picks ONE valid-under-the-flow-model pairing. Measured baseline: 1
    of 27 contigs misassembled (a wrong-flank join through an exact
    hub); divergent copies (the realistic config-#5 class) assemble
    with ZERO misassemblies — see the other tests. This red-lines the
    ambiguity cost so a regression (mass chimerism) is caught."""
    chroms, reads = _complex_input(seed=75, divergence=0.0)
    contigs, _ = assemble(reads, _CFG)
    genome = np.concatenate(chroms)
    mis = count_misassembled(contigs, genome)
    gf = genome_fraction(contigs, genome)
    assert mis <= 2, f"{mis}/{len(contigs)} misassembled (baseline 1)"
    assert gf >= 0.90, f"genome_fraction {gf:.4f}"


def test_repeat_quality_blocked_join():
    """The block-nested streamed join (entry side streamed in small
    forced blocks via config.entry_block_reads) preserves assembly
    quality and is bit-identical to in-core on repeat-rich data."""
    from dataclasses import replace

    chroms, reads = _complex_input(seed=77, total=150_000)
    base, _ = assemble(reads, _CFG)

    cfg = replace(_CFG, max_device_reads=20_000,
                  entry_block_reads=30_000)
    contigs, _ = assemble(reads, cfg)
    # bit-identity with in-core IS the quality statement: the blocked
    # join changes placement, never results (this 150 kbp seed carries
    # ~9.6% repeat content and shows 1 ambiguous-hub misassembly in
    # EVERY path including in-core — same method-level caveat as
    # test_repeat_quality_divergence_zero)
    assert len(base) == len(contigs)
    for a, b in zip(base, contigs):
        np.testing.assert_array_equal(a, b)
    genome = np.concatenate(chroms)
    assert count_misassembled(contigs, genome) <= 1
