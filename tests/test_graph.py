"""Graph engine vs oracle: transitive reduction and unitig labeling."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.graph import contract_unitigs, transitive_reduction
from sage2_tpu.overlap import find_overlaps, prepare_reads
from sage2_tpu.refmodel.oracle import (
    oracle_transitive_reduction,
    oracle_unitigs,
)

_I32_MAX = 2**31 - 1


def _make_graph(seed=51, glen=600, L=40, cov=15, min_ovl=20):
    genome = simulate_genome(glen, seed=seed)
    reads, _ = simulate_reads(genome, read_len=L, coverage=cov, seed=seed + 1)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    res = find_overlaps(rs.reads2, rs.valid2, min_ovl, capacity=1 << 17)
    assert not bool(res.overflow)
    return rs, res, L


def _edges_dict(src, dst, ovl):
    return {
        (int(a), int(b)): int(o)
        for a, b, o in zip(src, dst, ovl)
        if int(a) != _I32_MAX
    }


@pytest.mark.slow
def test_transitive_reduction_matches_oracle():
    rs, res, L = _make_graph()
    V = rs.reads2.shape[0]
    red = transitive_reduction(res.src, res.dst, res.ovl, V, L, capacity=1 << 18)
    assert not bool(red.overflow)
    got = _edges_dict(np.asarray(red.src), np.asarray(red.dst), np.asarray(red.ovl))
    full = _edges_dict(np.asarray(res.src), np.asarray(res.dst), np.asarray(res.ovl))
    expect = oracle_transitive_reduction(full, L)
    assert got == expect
    assert len(got) < len(full)  # reduction actually removed something


def test_reduction_keeps_graph_connected_along_genome():
    rs, res, L = _make_graph(seed=61)
    V = rs.reads2.shape[0]
    red = transitive_reduction(res.src, res.dst, res.ovl, V, L, capacity=1 << 18)
    n = int(red.n_edges)
    src = np.asarray(red.src)[:n]
    outdeg = np.bincount(src, minlength=V)
    # most vertices should have out-degree exactly 1 after reduction
    valid = np.asarray(rs.valid2)
    frac_linear = (outdeg[valid[: len(outdeg)]] == 1).mean()
    assert frac_linear > 0.9


def test_unitig_labels_match_oracle():
    rs, res, L = _make_graph(seed=71)
    V = rs.reads2.shape[0]
    red = transitive_reduction(res.src, res.dst, res.ovl, V, L, capacity=1 << 18)
    labels = contract_unitigs(red.src, red.dst, red.ovl, V)
    head = np.asarray(labels.head)
    dist = np.asarray(labels.dist)

    edges = _edges_dict(np.asarray(red.src), np.asarray(red.dst), np.asarray(red.ovl))
    chains = oracle_unitigs(edges, V)
    valid = np.asarray(rs.valid2)
    for chain in chains:
        if not valid[chain[0]]:
            continue
        h = chain[0]
        for pos, v in enumerate(chain):
            assert head[v] == h, (chain, v)
            assert dist[v] == pos, (chain, v)


def test_unitig_cycle_breaking():
    # hand-built 4-cycle: 0->1->2->3->0, all unambiguous
    src = jnp.asarray([0, 1, 2, 3], jnp.int32)
    dst = jnp.asarray([1, 2, 3, 0], jnp.int32)
    ovl = jnp.asarray([30, 30, 30, 30], jnp.int32)
    labels = contract_unitigs(src, dst, ovl, 4)
    head = np.asarray(labels.head)
    dist = np.asarray(labels.dist)
    nxt = np.asarray(labels.nxt)
    np.testing.assert_array_equal(head, [0, 0, 0, 0])
    np.testing.assert_array_equal(dist, [0, 1, 2, 3])
    assert nxt[3] == -1  # broken at min vertex: edge 3->0 dissolved


@pytest.mark.slow
@pytest.mark.parametrize("host_prep", [False, True])
def test_chunked_reduction_matches_incore(host_prep):
    """transitive_reduction_chunked (beyond-device-memory path) is
    bit-identical to the in-core pass, with device or host prep."""
    from sage2_tpu.graph.reduce import (
        transitive_reduction,
        transitive_reduction_chunked,
    )

    genome = simulate_genome(2000, seed=9)
    reads, _ = simulate_reads(genome, read_len=60, coverage=15,
                              error_rate=0.0, seed=10)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    res = find_overlaps(rs.reads2, rs.valid2, 30, capacity=1 << 16)
    V, L = rs.reads2.shape
    a = transitive_reduction(res.src, res.dst, res.ovl, V, L,
                             capacity=1 << 18)
    assert not bool(a.overflow)
    b = transitive_reduction_chunked(res.src, res.dst, res.ovl, V, L,
                                     chunk_cap=1 << 12,
                                     host_prep=host_prep)
    assert int(a.n_edges) == int(b.n_edges)
    assert int(a.n_expansions) == int(b.n_expansions)
    n = int(a.n_edges)
    np.testing.assert_array_equal(np.asarray(a.src)[:n], np.asarray(b.src)[:n])
    np.testing.assert_array_equal(np.asarray(a.dst)[:n], np.asarray(b.dst)[:n])
    np.testing.assert_array_equal(np.asarray(a.ovl)[:n], np.asarray(b.ovl)[:n])
