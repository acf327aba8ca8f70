"""k-mer counter vs collections.Counter oracle (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.kmer import count_kmers, lookup_counts
from sage2_tpu.ops import bitpack
from sage2_tpu.refmodel import oracle_kmer_counts


def _table_to_dict(table):
    n = int(table.n_unique)
    hi = np.asarray(table.hi)[:n]
    lo = np.asarray(table.lo)[:n]
    cnt = np.asarray(table.count)[:n]
    k = table.k
    out = {}
    for h, l, c in zip(hi, lo, cnt):
        v = (int(h) << 32) | int(l)
        codes = tuple((v >> (2 * (k - 1 - j))) & 3 for j in range(k))
        out[codes] = int(c)
    return out


@pytest.mark.parametrize("k", [5, 16, 25])
def test_counts_match_oracle(rng, k):
    reads = rng.integers(0, 4, size=(30, 50)).astype(np.int32)
    table = count_kmers(jnp.asarray(reads), k)
    got = _table_to_dict(table)
    expect = dict(oracle_kmer_counts(reads, k))
    assert got == expect


def test_counts_with_duplicates(rng):
    k = 7
    base = rng.integers(0, 4, size=(1, 30)).astype(np.int32)
    reads = np.repeat(base, 5, axis=0)
    table = count_kmers(jnp.asarray(reads), k)
    expect = dict(oracle_kmer_counts(reads, k))
    assert _table_to_dict(table) == expect


def test_lookup_counts(rng):
    k = 25
    reads = rng.integers(0, 4, size=(20, 60)).astype(np.int32)
    table = count_kmers(jnp.asarray(reads), k)
    ch, cl = bitpack.canonical_kmer_keys(jnp.asarray(reads), k)
    got = np.asarray(lookup_counts(table, ch, cl))
    oracle = oracle_kmer_counts(reads, k)
    for i in range(reads.shape[0]):
        for w in range(reads.shape[1] - k + 1):
            from sage2_tpu.refmodel.oracle import canonical

            assert got[i, w] == oracle[canonical(reads[i, w : w + k])]


def test_lookup_absent_returns_zero(rng):
    k = 25
    reads = rng.integers(0, 4, size=(2, 30)).astype(np.int32)
    table = count_kmers(jnp.asarray(reads), k)
    # query a key built from a different random read: almost surely absent
    other = rng.integers(0, 4, size=(1, 30)).astype(np.int32)
    qh, ql = bitpack.canonical_kmer_keys(jnp.asarray(other), k)
    got = np.asarray(lookup_counts(table, qh, ql))
    oracle = oracle_kmer_counts(reads, k)
    from sage2_tpu.refmodel.oracle import canonical

    for w in range(30 - k + 1):
        assert got[0, w] == oracle[canonical(other[0, w : w + k])]
