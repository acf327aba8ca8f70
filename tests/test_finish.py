"""Unit tests for host-side unitig graph cleaning (hand-built graphs)."""

import numpy as np
import pytest

from sage2_tpu.graph.finish import (
    Unitig,
    UnitigGraph,
    annotate_copy_counts,
    estimate_single_copy_coverage,
    join_paths,
    prune_weak_branches,
    prune_zero_copy_branches,
    remove_tips,
)


def _graph(unitigs, edges):
    g = UnitigGraph(
        unitigs={u.uid: u for u in unitigs},
        out_edges={u.uid: [] for u in unitigs},
        in_edges={u.uid: [] for u in unitigs},
        uid_of_head={}, uid_of_tail={},
    )
    for i, u in enumerate(unitigs):
        g.uid_of_head[u.vertices[0]] = u.uid
        g.uid_of_tail[u.vertices[-1]] = u.uid
    for (a, b, o) in edges:
        g.out_edges[a].append((b, o))
        g.in_edges[b].append((a, o))
    return g


def _u(uid, cov, length=300, n_reads=5, verts=None):
    verts = verts or [uid * 10]
    return Unitig(uid, verts, [], length, n_reads, cov)


def test_single_copy_coverage_weighted_median():
    g = _graph([_u(0, 30.0, 1000), _u(1, 31.0, 1000), _u(2, 90.0, 100),
                _u(3, 29.0, 1000)], [])
    c1 = estimate_single_copy_coverage(g, read_len=100)
    assert 29.0 <= c1 <= 31.0
    annotate_copy_counts(g, c1)
    assert g.unitigs[2].copy_count == 3
    assert g.unitigs[0].copy_count == 1


def test_prune_zero_copy_branch():
    # junction 0 -> {1 (cov 30), 2 (cov 2)}; c1 ~ 30
    g = _graph(
        [_u(0, 30.0, 1000), _u(1, 30.0, 1000), _u(2, 2.0, 150)],
        [(0, 1, 40), (0, 2, 40)],
    )
    c1 = estimate_single_copy_coverage(g, read_len=100)
    n = prune_zero_copy_branches(g, c1)
    assert n == 1
    assert g.out_edges[0] == [(1, 40)]


def test_prune_weak_branches_dominance():
    g = _graph(
        [_u(0, 30.0), _u(1, 28.0), _u(2, 3.0)],
        [(0, 1, 40), (0, 2, 40)],
    )
    n = prune_weak_branches(g, dominance=4.0)
    assert n == 1
    assert g.out_edges[0] == [(1, 40)]


def test_prune_keeps_balanced_branches():
    # genuine repeat fork: similar coverages must survive
    g = _graph(
        [_u(0, 30.0), _u(1, 28.0), _u(2, 25.0)],
        [(0, 1, 40), (0, 2, 40)],
    )
    assert prune_weak_branches(g, dominance=4.0) == 0
    c1 = estimate_single_copy_coverage(g, read_len=100)
    assert prune_zero_copy_branches(g, c1) == 0
    assert len(g.out_edges[0]) == 2


def test_tips_and_join():
    # 0 -> 1 -> 2 with a short dead-end 3 off 0
    g = _graph(
        [_u(0, 30.0), _u(1, 30.0), _u(2, 30.0), _u(3, 4.0, 120, n_reads=2)],
        [(0, 1, 40), (1, 2, 40), (0, 3, 40)],
    )
    n = remove_tips(g, cap=1000, max_reads=3)
    assert n == 1 and 3 not in g.unitigs
    paths = join_paths(g)
    assert [0, 1, 2] in paths


def test_mincost_paths_through_repeat():
    from sage2_tpu.graph.finish import mincost_paths

    # A -> R -> B and C -> R -> D with R a 2-copy repeat: join_paths
    # cannot cross the junction; mincost walks R twice.
    g = _graph(
        [_u(0, 30.0, 1000, verts=[0]), _u(1, 60.0, 400, verts=[10]),
         _u(2, 30.0, 1000, verts=[20]), _u(3, 30.0, 1000, verts=[30]),
         _u(4, 30.0, 1000, verts=[40])],
        [(0, 1, 40), (3, 1, 40), (1, 2, 40), (1, 4, 40)],
    )
    c1 = estimate_single_copy_coverage(g, read_len=100)
    annotate_copy_counts(g, c1)
    assert g.unitigs[1].copy_count == 2
    paths = mincost_paths(g, cap=1000)
    # both sources traverse the repeat; every path has 3 unitigs
    starts = sorted(p[0] for p in paths)
    assert starts == [0, 3]
    for p in paths:
        assert len(p) == 3 and p[1] == 1 and p[2] in (2, 4)
    # conservative join cannot cross it
    assert all(len(p) == 1 for p in join_paths(g))


def test_mincost_paths_linear_and_cycle():
    from sage2_tpu.graph.finish import mincost_paths

    g = _graph(
        [_u(0, 30.0, verts=[0]), _u(1, 30.0, verts=[10]),
         _u(2, 30.0, verts=[20]),
         _u(5, 30.0, verts=[50]), _u(6, 30.0, verts=[60])],
        [(0, 1, 40), (1, 2, 40), (5, 6, 40), (6, 5, 40)],
    )
    annotate_copy_counts(g, 30.0)
    paths = mincost_paths(g, cap=1000)
    assert [0, 1, 2] in paths
    # the cycle is emitted once, starting at its minimum uid
    cyc = [p for p in paths if p[0] in (5, 6)]
    assert cyc == [[5, 6]]


def test_mincost_paths_budget_terminates():
    from sage2_tpu.graph.finish import mincost_paths

    # high-copy self-loop must terminate and respect budget
    g = _graph([_u(0, 90.0, verts=[0])], [(0, 0, 40)])
    annotate_copy_counts(g, 30.0)
    paths = mincost_paths(g, cap=1000)
    total_uses = sum(len(p) for p in paths)
    assert total_uses == 3
