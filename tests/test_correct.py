"""Spectrum corrector vs pure-Python oracle, and end-to-end error recovery."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.kmer import correct_reads
from sage2_tpu.refmodel.oracle import oracle_correct


@pytest.mark.parametrize("k,rounds", [(7, 1), (7, 2), (11, 2)])
def test_correct_matches_oracle(k, rounds):
    genome = simulate_genome(400, seed=3)
    reads, _ = simulate_reads(
        genome, read_len=30, coverage=20, error_rate=0.02, seed=4
    )
    reads = reads.astype(np.int32)
    got = np.asarray(correct_reads(jnp.asarray(reads), k, threshold=3, rounds=rounds))
    expect = oracle_correct(reads, k, threshold=3, rounds=rounds)
    np.testing.assert_array_equal(got, expect)


def test_correction_fixes_most_errors():
    genome = simulate_genome(2000, seed=5)
    reads, starts = simulate_reads(
        genome, read_len=60, coverage=30, error_rate=0.01, seed=6, both_strands=False
    )
    truth = genome[starts[:, None] + np.arange(60)[None, :]].astype(np.int32)
    noisy = reads.astype(np.int32)
    errs_before = int((noisy != truth).sum())
    corrected = np.asarray(
        correct_reads(jnp.asarray(noisy), k=15, threshold=3, rounds=2)
    )
    errs_after = int((corrected != truth).sum())
    assert errs_before > 0
    assert errs_after < 0.15 * errs_before


def test_correct_clean_reads_unchanged():
    genome = simulate_genome(1500, seed=7)
    reads, _ = simulate_reads(genome, read_len=50, coverage=25, error_rate=0.0, seed=8)
    reads = reads.astype(np.int32)
    out = np.asarray(correct_reads(jnp.asarray(reads), k=15, threshold=2, rounds=2))
    np.testing.assert_array_equal(out, reads)


# --------------------------------------------------------------------------
# RACER-style covering-window voting rule (config parity alternative)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("k,rounds", [(7, 1), (7, 2), (11, 2)])
def test_voting_matches_oracle(k, rounds):
    from sage2_tpu.refmodel.oracle import oracle_correct_voting

    genome = simulate_genome(400, seed=3)
    reads, _ = simulate_reads(
        genome, read_len=30, coverage=20, error_rate=0.02, seed=4
    )
    reads = reads.astype(np.int32)
    got = np.asarray(correct_reads(
        jnp.asarray(reads), k, threshold=3, rounds=rounds,
        rule="vote_all_windows",
    ))
    expect = oracle_correct_voting(reads, k, threshold=3, rounds=rounds)
    np.testing.assert_array_equal(got, expect)


def test_voting_fixes_most_errors():
    genome = simulate_genome(1500, seed=9)
    reads, starts = simulate_reads(
        genome, read_len=60, coverage=30, error_rate=0.01, seed=10,
        both_strands=False,
    )
    truth = genome[starts[:, None] + np.arange(60)[None, :]].astype(np.int32)
    noisy = reads.astype(np.int32)
    errs_before = int((noisy != truth).sum())
    corrected = np.asarray(correct_reads(
        jnp.asarray(noisy), k=15, threshold=3, rounds=2,
        rule="vote_all_windows",
    ))
    errs_after = int((corrected != truth).sum())
    assert errs_before > 0
    assert errs_after < 0.15 * errs_before


def test_voting_clean_reads_unchanged():
    genome = simulate_genome(1200, seed=11)
    reads, _ = simulate_reads(genome, read_len=50, coverage=25,
                              error_rate=0.0, seed=12)
    reads = reads.astype(np.int32)
    out = np.asarray(correct_reads(jnp.asarray(reads), k=15, threshold=2,
                                   rounds=2, rule="vote_all_windows"))
    np.testing.assert_array_equal(out, reads)


def test_voting_chunked_matches_incore():
    from sage2_tpu.stream import correct_reads_chunked

    genome = simulate_genome(600, seed=13)
    reads, _ = simulate_reads(genome, read_len=40, coverage=15,
                              error_rate=0.02, seed=14)
    reads = reads.astype(np.int32)
    a = correct_reads_chunked(reads, 9, 3, 2, chunk_reads=64,
                              rule="vote_all_windows")
    b = np.asarray(correct_reads(jnp.asarray(reads), 9, 3, 2,
                                 rule="vote_all_windows"), np.int8)
    np.testing.assert_array_equal(a, b)


# --------------------------------------------------------------------------
# Two-phase weak-window fast path (round-4 performance corrector)
# --------------------------------------------------------------------------


@pytest.mark.parametrize("k,rounds,thr", [(7, 1, 3), (7, 2, 3), (11, 2, 2)])
def test_twophase_matches_dense(k, rounds, thr):
    from sage2_tpu.kmer.correct import correct_reads_twophase

    genome = simulate_genome(400, seed=13)
    reads, _ = simulate_reads(
        genome, read_len=30, coverage=20, error_rate=0.02, seed=14
    )
    reads = reads.astype(np.int32)
    dense = np.asarray(
        correct_reads(jnp.asarray(reads), k, threshold=thr, rounds=rounds)
    )
    fast = np.asarray(
        correct_reads_twophase(
            jnp.asarray(reads), k, threshold=thr, rounds=rounds
        )
    )
    np.testing.assert_array_equal(fast, dense)


def test_twophase_matches_dense_ragged():
    from sage2_tpu.kmer.correct import correct_reads_twophase

    genome = simulate_genome(500, seed=15)
    reads, _ = simulate_reads(
        genome, read_len=36, coverage=22, error_rate=0.02, seed=16
    )
    rng = np.random.default_rng(17)
    lens = rng.integers(24, 37, size=reads.shape[0]).astype(np.int32)
    reads = np.where(
        np.arange(reads.shape[1])[None, :] < lens[:, None], reads, 0
    ).astype(np.int32)
    dense = np.asarray(
        correct_reads(
            jnp.asarray(reads), 9, threshold=3, rounds=2,
            lengths=jnp.asarray(lens),
        )
    )
    fast = np.asarray(
        correct_reads_twophase(
            jnp.asarray(reads), 9, threshold=3, rounds=2,
            lengths=jnp.asarray(lens),
        )
    )
    np.testing.assert_array_equal(fast, dense)


def test_prune_table_verdict_invariant():
    """Dropping sub-threshold table entries must not change any verdict,
    including on reads engineered to contain singleton k-mers."""
    from sage2_tpu.kmer import count_kmers
    from sage2_tpu.kmer.correct import (
        correct_reads_twophase,
        prune_table_for_correction,
    )

    genome = simulate_genome(300, seed=18)
    reads, _ = simulate_reads(
        genome, read_len=28, coverage=12, error_rate=0.05, seed=19
    )
    reads = reads.astype(np.int32)
    k, thr = 9, 3
    table = count_kmers(jnp.asarray(reads), k)
    pruned = prune_table_for_correction(table, thr)
    assert int(pruned.n_unique) < int(table.n_unique)  # singletons exist
    dense = np.asarray(
        correct_reads(jnp.asarray(reads), k, threshold=thr, rounds=1)
    )
    fast = np.asarray(
        correct_reads_twophase(
            jnp.asarray(reads), k, threshold=thr, rounds=1, table=table
        )
    )
    np.testing.assert_array_equal(fast, dense)
