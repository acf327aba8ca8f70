"""Native C++ transitive-reduction backend (csrc/reduce_host.cpp) vs the
device kernels — bit-identical output arrays, identical expansion totals."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.graph import reduce_native
from sage2_tpu.graph.reduce import (
    transitive_reduction,
    transitive_reduction_auto,
    transitive_reduction_native,
)
from sage2_tpu.overlap import find_overlaps, prepare_reads

pytestmark = pytest.mark.skipif(
    not reduce_native.available(), reason="no C++ toolchain"
)

_I32_MAX = 2**31 - 1


def _graph(seed=51, glen=2000, L=60, cov=15, min_ovl=30):
    genome = simulate_genome(glen, seed=seed)
    reads, _ = simulate_reads(genome, read_len=L, coverage=cov,
                              error_rate=0.0, seed=seed + 1)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    res = find_overlaps(rs.reads2, rs.valid2, min_ovl, capacity=1 << 17)
    assert not bool(res.overflow)
    return rs, res, L


def _assert_same(a, b):
    assert int(a.n_edges) == int(b.n_edges)
    assert int(a.n_expansions) == int(b.n_expansions)
    np.testing.assert_array_equal(np.asarray(a.src), np.asarray(b.src))
    np.testing.assert_array_equal(np.asarray(a.dst), np.asarray(b.dst))
    np.testing.assert_array_equal(np.asarray(a.ovl), np.asarray(b.ovl))


@pytest.mark.parametrize("seed", [51, 61, 71])
def test_native_matches_incore_fixed(seed):
    rs, res, L = _graph(seed=seed)
    V = rs.reads2.shape[0]
    a = transitive_reduction(res.src, res.dst, res.ovl, V, L,
                             capacity=1 << 18)
    assert not bool(a.overflow)
    b = transitive_reduction_native(
        np.asarray(res.src), np.asarray(res.dst), np.asarray(res.ovl),
        V, L,
    )
    assert b is not None
    _assert_same(a, b)
    assert int(a.n_edges) < int(np.sum(np.asarray(res.src) != _I32_MAX))


def test_native_matches_incore_ragged():
    rng = np.random.default_rng(7)
    genome = simulate_genome(500, seed=51)
    raw = []
    for _ in range(50):
        ln = int(rng.integers(40, 70))
        start = int(rng.integers(0, len(genome) - ln))
        raw.append(np.array(genome[start : start + ln], np.int32))
    both = raw + [(3 - r)[::-1] for r in raw]
    Lmax = max(len(r) for r in both)
    reads = np.zeros((len(both), Lmax), np.int32)
    lens = np.zeros(len(both), np.int32)
    for i, r in enumerate(both):
        reads[i, : len(r)] = r
        lens[i] = len(r)
    res = find_overlaps(jnp.asarray(reads), jnp.ones(len(both), bool),
                        30, capacity=1 << 15, lengths=jnp.asarray(lens))
    assert not bool(res.overflow)
    V = len(both)
    a = transitive_reduction(res.src, res.dst, res.ovl, V,
                             jnp.asarray(lens), capacity=1 << 17)
    assert not bool(a.overflow)
    b = transitive_reduction_native(
        np.asarray(res.src), np.asarray(res.dst), np.asarray(res.ovl),
        V, lens,
    )
    assert b is not None
    _assert_same(a, b)


def test_native_single_thread_matches_multi():
    rs, res, L = _graph(seed=81)
    V = rs.reads2.shape[0]
    src = np.asarray(res.src)
    dst = np.asarray(res.dst)
    ovl = np.asarray(res.ovl)
    a = transitive_reduction_native(src, dst, ovl, V, L, n_threads=1)
    b = transitive_reduction_native(src, dst, ovl, V, L, n_threads=4)
    _assert_same(a, b)


def test_native_empty_graph():
    src = np.full(8, _I32_MAX, np.int32)
    dst = np.full(8, _I32_MAX, np.int32)
    ovl = np.zeros(8, np.int32)
    red = transitive_reduction_native(src, dst, ovl, 10, 100)
    assert int(red.n_edges) == 0
    assert int(red.n_expansions) == 0


def test_native_rejects_malformed():
    # dst out of range must fail loudly, not read out of bounds
    src = np.array([0, 1, _I32_MAX], np.int32)
    dst = np.array([1, 99, _I32_MAX], np.int32)
    ovl = np.array([10, 10, 0], np.int32)
    with pytest.raises(ValueError):
        transitive_reduction_native(src, dst, ovl, 3, 50)


def test_auto_dispatch():
    """auto keeps device arrays on the device path and host arrays below
    the size threshold on the device path too; backend='native' forces."""
    rs, res, L = _graph(seed=91)
    V = rs.reads2.shape[0]
    a = transitive_reduction_auto(res.src, res.dst, res.ovl, V, L)
    b = transitive_reduction_auto(
        np.asarray(res.src), np.asarray(res.dst), np.asarray(res.ovl),
        V, L, backend="native",
    )
    _assert_same(a, b)
