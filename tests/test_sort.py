"""Unit tests for sort/search/segment primitives."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.ops.sort import (
    expand_by_counts,
    lex_searchsorted,
    sort_by_keys,
    unique_sorted_pairs,
)


def _as_u64(hi, lo):
    return (np.uint64(hi) << np.uint64(32)) | np.uint64(lo)


def test_sort_by_keys_lexicographic(rng):
    n = 500
    hi = rng.integers(0, 5, size=n).astype(np.uint32)
    lo = rng.integers(0, 1 << 32, size=n, dtype=np.uint64).astype(np.uint32)
    val = np.arange(n, dtype=np.int32)
    sh, sl, sv = sort_by_keys([jnp.asarray(hi), jnp.asarray(lo)], [jnp.asarray(val)])
    combined = _as_u64(np.asarray(sh), np.asarray(sl))
    assert np.all(combined[:-1] <= combined[1:])
    # values follow their keys
    np.testing.assert_array_equal(
        _as_u64(hi, lo)[np.asarray(sv)], combined
    )


@pytest.mark.parametrize("side", ["left", "right"])
def test_lex_searchsorted_matches_numpy(rng, side):
    n = 300
    hi = np.sort(rng.integers(0, 4, size=n).astype(np.uint32))
    lo = rng.integers(0, 100, size=n).astype(np.uint32)
    order = np.lexsort((lo, hi))
    hi, lo = hi[order], lo[order]
    # queries: mix of present and absent keys
    qh = rng.integers(0, 5, size=200).astype(np.uint32)
    ql = rng.integers(0, 110, size=200).astype(np.uint32)
    got = np.asarray(
        lex_searchsorted(
            jnp.asarray(hi), jnp.asarray(lo), jnp.asarray(qh), jnp.asarray(ql), side
        )
    )
    table = _as_u64(hi, lo)
    expect = np.searchsorted(table, _as_u64(qh, ql), side=side)
    np.testing.assert_array_equal(got, expect)


def test_lex_searchsorted_empty():
    out = lex_searchsorted(
        jnp.zeros(0, jnp.uint32), jnp.zeros(0, jnp.uint32),
        jnp.asarray([1], jnp.uint32), jnp.asarray([2], jnp.uint32),
    )
    np.testing.assert_array_equal(np.asarray(out), [0])


def test_unique_sorted_pairs():
    hi = jnp.asarray([0, 0, 0, 1, 1, 9], jnp.uint32)
    lo = jnp.asarray([5, 5, 7, 0, 0, 9], jnp.uint32)
    valid = jnp.asarray([True, True, True, True, True, False])
    is_head, gid = unique_sorted_pairs(hi, lo, valid)
    np.testing.assert_array_equal(
        np.asarray(is_head), [True, False, True, True, False, False]
    )
    np.testing.assert_array_equal(np.asarray(gid)[:5], [0, 0, 1, 2, 2])


def test_expand_by_counts():
    counts = jnp.asarray([2, 0, 3, 1], jnp.int32)
    group, rank, valid = expand_by_counts(counts, capacity=8)
    g, r, v = np.asarray(group), np.asarray(rank), np.asarray(valid)
    assert v.sum() == 6
    np.testing.assert_array_equal(g[:6], [0, 0, 2, 2, 2, 3])
    np.testing.assert_array_equal(r[:6], [0, 1, 0, 1, 2, 0])
    assert not v[6] and not v[7]


def test_expand_by_counts_overflow_detectable():
    counts = jnp.asarray([5, 5], jnp.int32)
    group, rank, valid = expand_by_counts(counts, capacity=4)
    # capacity < total: all slots valid, caller detects overflow via sum
    assert np.asarray(valid).all()
    assert int(jnp.sum(counts)) > 4
