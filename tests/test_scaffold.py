"""Mate-pair scaffolding tests (graph.scaffold + paired simulation).

BASELINE.json config #1 is paired-end; the scaffolder consumes the vertex
mate pairs that survive dedup and the exact vertex placements from contig
emission. These tests cover the simulator's FR geometry, the link
orientation/gap algebra on hand-built inputs, ambiguity conservatism, and
an end-to-end coverage-gap join with order/orientation verified against
the genome.
"""

import numpy as np
import pytest

from sage2_tpu.config import AssemblyConfig
from sage2_tpu.data import simulate_genome, simulate_read_pairs
from sage2_tpu.graph.scaffold import (
    GAP_CODE,
    chain_scaffolds,
    collect_links,
    emit_scaffolds,
    estimate_insert_size,
    resolve_pair_placements,
    scaffold_contigs,
    select_links,
)


def rc(seq):
    return (3 - np.asarray(seq))[::-1].astype(np.int8)


# --------------------------------------------------------------------------
# simulator geometry
# --------------------------------------------------------------------------


def test_simulate_pairs_fr_geometry():
    g = simulate_genome(3000, seed=3)
    reads, mate_of, starts = simulate_read_pairs(
        g, read_len=50, coverage=10, insert_mean=300, insert_sd=0,
        error_rate=0.0, seed=4, both_strands=False,
    )
    n = reads.shape[0] // 2
    assert (mate_of[:n] == np.arange(n, 2 * n)).all()
    assert (mate_of[n:] == np.arange(n)).all()
    for i in range(min(n, 20)):
        p = starts[i]
        assert (reads[i] == g[p : p + 50]).all()          # R1 forward
        r2_fwd = g[p + 300 - 50 : p + 300]
        assert (reads[n + i] == rc(r2_fwd)).all()         # R2 = RC of right end


def test_simulate_pairs_exclude_window():
    g = simulate_genome(4000, seed=5)
    lo, hi = 1900, 2100
    reads, mate_of, starts = simulate_read_pairs(
        g, read_len=60, coverage=20, insert_mean=500, insert_sd=10,
        seed=6, exclude=(lo, hi), both_strands=False,
    )
    n = reads.shape[0] // 2
    # no read overlaps the window, but some fragments span it
    for i in range(n):
        p = int(starts[i])
        assert not (p < hi and p + 60 > lo)
    assert any(starts < lo) and any(starts + 500 > hi)


# --------------------------------------------------------------------------
# link algebra on hand-built placements
# --------------------------------------------------------------------------

CAP = 1000
RLEN = np.full(2 * CAP, 100, np.int64)


def _pairs(*pairs):
    return np.asarray(pairs, np.int32)


def test_insert_estimation_same_contig():
    # + mate at 50, - mate ending at 50+400: outer span 400
    placements = {1: (0, 50, 1), 2: (0, 350, -1)}
    resolved = resolve_pair_placements(
        _pairs((1, 2)), placements, RLEN, CAP
    )
    insert, n = estimate_insert_size(resolved)
    assert n == 1 and insert == 400


def test_rc_vertex_lookup():
    # only the RC twin of vertex 7 was emitted: v=7 resolves with dir
    # flipped at the same span
    placements = {7 + CAP: (0, 20, 1)}
    resolved = resolve_pair_placements(
        _pairs((7, 7)), placements, RLEN, CAP
    )
    assert resolved[0][0] == (0, 20, -1, 100)


def test_single_link_join_geometry():
    # c0 (len 400): mate dir +1 at s=280 -> tail1 = 120
    # c1 (len 500): mate dir -1 at s=30  -> o2 = +1, head2 = 130
    # insert 400 -> gap = 400 - 120 - 130 = 150
    contigs = [np.zeros(400, np.int8), np.ones(500, np.int8)]
    placements = {1: (0, 280, 1), 2: (1, 30, -1)}
    mate_pairs = _pairs((1, 2), (1, 2), (1, 2))
    scaffolds, report = scaffold_contigs(
        contigs, placements, mate_pairs, RLEN, CAP,
        min_links=3, insert_size=400,
    )
    assert report["n_joins"] == 1
    assert report["n_scaffolds"] == 1
    sc = scaffolds[0]
    assert len(sc) == 400 + 150 + 500
    gap = sc[400:550]
    assert (gap == GAP_CODE).all()
    assert (sc[:400] == 0).all() and (sc[550:] == 1).all()


def test_below_min_links_no_join():
    contigs = [np.zeros(400, np.int8), np.ones(500, np.int8)]
    placements = {1: (0, 280, 1), 2: (1, 30, -1)}
    scaffolds, report = scaffold_contigs(
        contigs, placements, _pairs((1, 2), (1, 2)), RLEN, CAP,
        min_links=3, insert_size=400,
    )
    assert report["n_joins"] == 0 and len(scaffolds) == 2


def test_ambiguous_end_no_join():
    # c0's right end links equally to c1 and c2: conservative no-join
    contigs = [np.zeros(400, np.int8), np.ones(500, np.int8),
               np.full(450, 2, np.int8)]
    placements = {
        1: (0, 280, 1), 2: (1, 30, -1),
        3: (0, 290, 1), 4: (2, 40, -1),
    }
    mate_pairs = _pairs(*([(1, 2)] * 3 + [(3, 4)] * 3))
    scaffolds, report = scaffold_contigs(
        contigs, placements, mate_pairs, RLEN, CAP,
        min_links=3, insert_size=400,
    )
    assert report["n_joins"] == 0 and len(scaffolds) == 3


def test_dominant_link_beats_weak_rival():
    # 8 pairs support c0->c1, only 1 supports c0->c2 (< half): join c0-c1
    contigs = [np.zeros(400, np.int8), np.ones(500, np.int8),
               np.full(450, 2, np.int8)]
    placements = {
        1: (0, 280, 1), 2: (1, 30, -1),
        3: (0, 290, 1), 4: (2, 40, -1),
    }
    mate_pairs = _pairs(*([(1, 2)] * 8 + [(3, 4)] * 1))
    _sc, report = scaffold_contigs(
        contigs, placements, mate_pairs, RLEN, CAP,
        min_links=3, insert_size=400,
    )
    assert report["n_joins"] == 1


def test_orientation_flip_join():
    # mate 2 sits dir=+1 in c1, so c1 must be FLIPPED in the scaffold
    contigs = [np.zeros(400, np.int8),
               np.arange(500, dtype=np.int8) % 4]
    placements = {1: (0, 280, 1), 2: (1, 370, 1)}
    # o2 = -d2 = -1: head2 = (500 - 370 - 100) + 100 = 130; gap = 150
    mate_pairs = _pairs((1, 2), (1, 2), (1, 2))
    scaffolds, report = scaffold_contigs(
        contigs, placements, mate_pairs, RLEN, CAP,
        min_links=3, insert_size=400,
    )
    assert report["n_joins"] == 1
    sc = scaffolds[0]
    assert len(sc) == 400 + 150 + 500
    assert (sc[550:] == rc(contigs[1])).all()


def test_chain_three_contigs():
    accepted = {(0, 1, 1, 1): 10, (1, 1, 2, 1): 20}
    chains = chain_scaffolds(3, accepted)
    assert len(chains) == 1
    assert [c for c, _o, _g in chains[0]] == [0, 1, 2]
    seqs = emit_scaffolds(
        [np.zeros(300, np.int8), np.ones(300, np.int8),
         np.full(300, 2, np.int8)], chains,
    )
    assert len(seqs) == 1 and len(seqs[0]) == 900 + 30


# --------------------------------------------------------------------------
# end to end: coverage gap joined by mate pairs
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_e2e_gap_scaffold():
    from sage2_tpu.pipeline import assemble

    G = 6000
    genome = simulate_genome(G, seed=11)
    lo, hi = 2900, 3060
    reads, mate_of, _ = simulate_read_pairs(
        genome, read_len=100, coverage=30, insert_mean=400, insert_sd=20,
        error_rate=0.0, seed=12, exclude=(lo, hi),
    )
    cfg = AssemblyConfig(k=17, min_overlap=40, min_contig_len=300)
    seqs, stats = assemble(reads, cfg, mate_of=mate_of)
    assert stats.get("scaffold_joins", 0) >= 1
    assert stats["n_scaffolds"] < stats["n_contigs"]
    assert stats["scaffold_n50"] > stats["n50"]

    # order/orientation check: the joined scaffold's non-N pieces must
    # align to the genome on one strand with increasing coordinates
    joined = [s for s in seqs if (np.asarray(s) == GAP_CODE).any()]
    assert joined
    gstr = genome.tobytes()
    grc = rc(genome).tobytes()
    for sc in joined:
        sc = np.asarray(sc, np.int8)
        isgap = sc == GAP_CODE
        bounds = np.flatnonzero(np.diff(isgap.astype(np.int8)) != 0) + 1
        pieces = [
            p for p in np.split(sc, bounds) if not (p == GAP_CODE).any()
        ]
        assert len(pieces) >= 2
        for strand in (gstr, grc):
            pos = [strand.find(p.tobytes()) for p in pieces]
            if all(q >= 0 for q in pos) and pos == sorted(pos):
                break
        else:
            raise AssertionError(
                "scaffold pieces not collinear on either genome strand"
            )
        # gap size sanity: estimated N-run within insert-size slack
        n_gap = int(isgap.sum())
        assert 1 <= n_gap <= 400


@pytest.mark.slow
def test_scaffold_survives_resume(tmp_path):
    """mate_pairs ride the edges artifact: resume_from='finish'
    reproduces the scaffolds byte for byte."""
    from sage2_tpu.pipeline import assemble

    genome = simulate_genome(5000, seed=15)
    lo, hi = 2400, 2550
    reads, mate_of, _ = simulate_read_pairs(
        genome, read_len=100, coverage=30, insert_mean=400, insert_sd=20,
        error_rate=0.0, seed=16, exclude=(lo, hi),
    )
    cfg = AssemblyConfig(k=17, min_overlap=40, min_contig_len=300)
    out = str(tmp_path / "run")
    seqs, stats = assemble(reads, cfg, mate_of=mate_of, outdir=out)
    seqs2, stats2 = assemble(reads, cfg, outdir=out, resume_from="finish")
    assert stats == stats2
    assert len(seqs) == len(seqs2)
    for a, b in zip(seqs, seqs2):
        assert np.array_equal(a, b)


@pytest.mark.slow
def test_scaffold_disabled_returns_contigs():
    from sage2_tpu.pipeline import assemble

    genome = simulate_genome(3000, seed=13)
    reads, mate_of, _ = simulate_read_pairs(
        genome, read_len=100, coverage=25, insert_mean=350,
        error_rate=0.0, seed=14,
    )
    cfg = AssemblyConfig(k=17, min_overlap=40, scaffold=False)
    seqs, stats = assemble(reads, cfg, mate_of=mate_of)
    assert "n_scaffolds" not in stats
    assert all(not (np.asarray(s) == GAP_CODE).any() for s in seqs)
