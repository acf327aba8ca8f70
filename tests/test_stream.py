"""Chunked/streaming stage variants must match in-core results exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.kmer import correct_reads, count_kmers
from sage2_tpu.stream import correct_reads_chunked, count_kmers_chunked


def _table_dict(t):
    n = int(t.n_unique)
    return {
        (int(h), int(l)): int(c)
        for h, l, c in zip(
            np.asarray(t.hi)[:n], np.asarray(t.lo)[:n], np.asarray(t.count)[:n]
        )
    }


@pytest.mark.parametrize("chunk", [7, 64, 1000])
def test_chunked_count_matches_incore(chunk):
    genome = simulate_genome(1000, seed=401)
    reads, _ = simulate_reads(genome, read_len=40, coverage=12,
                              error_rate=0.01, seed=402)
    reads = reads.astype(np.int32)
    incore = count_kmers(jnp.asarray(reads), 15)
    chunked = count_kmers_chunked(reads, 15, chunk)
    assert _table_dict(chunked) == _table_dict(incore)


@pytest.mark.parametrize("chunk", [16, 128])
def test_chunked_correct_matches_incore(chunk):
    genome = simulate_genome(800, seed=411)
    reads, _ = simulate_reads(genome, read_len=36, coverage=20,
                              error_rate=0.02, seed=412)
    reads = reads.astype(np.int32)
    incore = np.asarray(correct_reads(jnp.asarray(reads), 11, 3, 2))
    chunked = correct_reads_chunked(reads, 11, 3, 2, chunk)
    np.testing.assert_array_equal(chunked, incore)
