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
