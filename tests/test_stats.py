"""Alignment-based validation metrics: parity with exact matching on
exact assemblies, graceful behavior under injected errors, misassembly
detection on chimeric joins (VERDICT round-1 item 7)."""

import numpy as np

from sage2_tpu.data import simulate_genome
from sage2_tpu.utils.stats import count_misassembled, genome_fraction


def _rc(c):
    return (3 - c)[::-1]


def test_exact_contigs_full_fraction():
    g = simulate_genome(20_000, seed=3)
    contigs = [g[:8000], g[7000:15000], _rc(g[14000:20000])]
    assert genome_fraction(contigs, g) == 1.0
    assert count_misassembled(contigs, g) == 0


def test_fraction_matches_exact_on_partial_cover():
    g = simulate_genome(10_000, seed=4)
    contigs = [g[1000:4000]]
    assert abs(genome_fraction(contigs, g) - 3000 / 10000) < 1e-9


def test_errors_degrade_gracefully():
    g = simulate_genome(10_000, seed=5)
    c = g[:9000].copy()
    rng = np.random.default_rng(0)
    pos = rng.choice(9000, 9, replace=False)       # 0.1% error
    c[pos] = (c[pos] + 1) % 4
    gf = genome_fraction([c], g)
    # round-1 exact matching would report 0 here
    assert 0.88 < gf <= 0.9
    assert count_misassembled([c], g) == 0


def test_chimeric_join_detected():
    g = simulate_genome(20_000, seed=6)
    chimera = np.concatenate([g[:3000], g[12_000:15_000]])
    assert count_misassembled([chimera], g) == 1
    assert count_misassembled([g[:6000]], g) == 0


def test_low_identity_blocks_do_not_cover():
    g = simulate_genome(5_000, seed=7)
    junk = (g[:3000] + 1) % 4      # wrong everywhere
    assert genome_fraction([junk], g) < 0.05
