"""Unit tests for 2-bit packing and k-mer key arithmetic (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.ops import bitpack


def _key_to_int(hi, lo):
    return (np.uint64(hi) << np.uint64(32)) | np.uint64(lo)


def _oracle_kmer_value(codes):
    v = 0
    for c in codes:
        v = v * 4 + int(c)
    return v


def test_encode_decode_roundtrip(rng):
    seq = rng.integers(0, 4, size=200).astype(np.uint8)
    ascii_ = bitpack.decode_to_ascii(seq)
    back = bitpack.encode_ascii(ascii_)
    np.testing.assert_array_equal(seq, back)


def test_encode_n_maps_to_a():
    codes = bitpack.encode_ascii(np.frombuffer(b"NnACGT", dtype=np.uint8))
    np.testing.assert_array_equal(codes, [0, 0, 0, 1, 2, 3])


@pytest.mark.parametrize("k", [2, 5, 16, 17, 25, 31])
def test_kmer_keys_match_oracle(rng, k):
    L = 40
    reads = rng.integers(0, 4, size=(3, L)).astype(np.int32)
    hi, lo = bitpack.kmer_keys(jnp.asarray(reads), k)
    hi, lo = np.asarray(hi), np.asarray(lo)
    for i in range(reads.shape[0]):
        for w in range(L - k + 1):
            expect = _oracle_kmer_value(reads[i, w : w + k])
            got = int(_key_to_int(hi[i, w], lo[i, w]))
            assert got == expect, (i, w)


@pytest.mark.parametrize("k", [5, 16, 25])
def test_revcomp_keys(rng, k):
    L = 30
    reads = rng.integers(0, 4, size=(2, L)).astype(np.int32)
    rh, rl = bitpack.revcomp_kmer_keys(jnp.asarray(reads), k)
    rh, rl = np.asarray(rh), np.asarray(rl)
    for i in range(2):
        for w in range(L - k + 1):
            rc = (3 - reads[i, w : w + k])[::-1]
            assert int(_key_to_int(rh[i, w], rl[i, w])) == _oracle_kmer_value(rc)


def test_canonical_is_min(rng):
    k = 25
    reads = rng.integers(0, 4, size=(4, 60)).astype(np.int32)
    fh, fl = bitpack.kmer_keys(jnp.asarray(reads), k)
    rh, rl = bitpack.revcomp_kmer_keys(jnp.asarray(reads), k)
    ch, cl = bitpack.canonical_kmer_keys(jnp.asarray(reads), k)
    f = _key_to_int(np.asarray(fh), np.asarray(fl))
    r = _key_to_int(np.asarray(rh), np.asarray(rl))
    c = _key_to_int(np.asarray(ch), np.asarray(cl))
    np.testing.assert_array_equal(c, np.minimum(f, r))


@pytest.mark.parametrize("k,pos", [(25, 0), (25, 7), (25, 12), (25, 24), (16, 3)])
def test_set_base(rng, k, pos):
    codes = rng.integers(0, 4, size=(1, k)).astype(np.int32)
    hi, lo = bitpack.kmer_keys(jnp.asarray(codes), k)
    old = codes[0, pos]
    new = (old + 2) % 4
    nh, nl = bitpack.set_base(
        hi, lo, k, pos, jnp.asarray(old), jnp.asarray(new)
    )
    mod = codes.copy()
    mod[0, pos] = new
    eh, el = bitpack.kmer_keys(jnp.asarray(mod), k)
    assert int(np.asarray(nh)[0, 0]) == int(np.asarray(eh)[0, 0])
    assert int(np.asarray(nl)[0, 0]) == int(np.asarray(el)[0, 0])


def test_pack_words_lexicographic(rng):
    L = 100
    reads = rng.integers(0, 4, size=(20, L)).astype(np.int32)
    words = np.asarray(bitpack.pack_read_words(jnp.asarray(reads)))
    # word-wise lexicographic order == base-wise lexicographic order
    order_words = sorted(range(20), key=lambda i: tuple(words[i]))
    order_bases = sorted(range(20), key=lambda i: tuple(reads[i]))
    assert order_words == order_bases
    back = bitpack.unpack_read_words(words, L)
    np.testing.assert_array_equal(back, reads)


def test_revcomp_codes():
    r = jnp.asarray([[0, 1, 2, 3]])
    rc = bitpack.revcomp_codes(r)
    np.testing.assert_array_equal(np.asarray(rc), [[0, 1, 2, 3]])  # ACGT is palindromic
    r2 = jnp.asarray([[0, 0, 1]])  # AAC -> GTT
    np.testing.assert_array_equal(np.asarray(bitpack.revcomp_codes(r2)), [[2, 3, 3]])
