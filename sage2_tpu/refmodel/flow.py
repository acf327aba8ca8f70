"""Brute-force oracle for the min-cost contig-flow objective.

Pins the exact objective that graph.flowpaths.mincost_flow_paths must
minimize (SURVEY.md §2 "Copy-count / cost model"; the reference mount is
empty so the model is pinned here, SURVEY.md §0):

  minimize   sum_u len_u * |f_u - c_u|  +  path_penalty * (#opened paths)

over integer unitig flows 0 <= f_u <= c_u + max_extra with conservation
(flow enters a unitig either from an in-edge or by opening a path there;
leaves by an out-edge or by ending the path). Cyclic flow (a circular
contig) costs no opening. Exponential enumeration — tiny graphs only.
"""

from __future__ import annotations

import itertools
from typing import Dict, List, Sequence, Tuple


def oracle_min_flow_cost(
    nodes: Dict[int, Tuple[int, int]],
    edges: Sequence[Tuple[int, int]],
    path_penalty: int,
    max_extra: int = 2,
) -> int:
    """Minimum objective value. ``nodes``: uid -> (copies, length)."""
    uids = sorted(nodes)
    caps = [nodes[u][0] + max_extra for u in uids]
    best = None
    for f in itertools.product(*(range(c + 1) for c in caps)):
        fl = dict(zip(uids, f))
        base = sum(
            nodes[u][1] * abs(fl[u] - nodes[u][0]) for u in uids
        )
        # max total edge flow subject to per-node in/out capacity = f
        e_best = 0
        ebounds = [range(min(fl[a], fl[b]) + 1) for (a, b) in edges]
        for ev in itertools.product(*ebounds):
            out_used: Dict[int, int] = {u: 0 for u in uids}
            in_used: Dict[int, int] = {u: 0 for u in uids}
            ok = True
            for (a, b), e in zip(edges, ev):
                out_used[a] += e
                in_used[b] += e
            for u in uids:
                if out_used[u] > fl[u] or in_used[u] > fl[u]:
                    ok = False
                    break
            if ok:
                e_best = max(e_best, sum(ev))
        opens = sum(f) - e_best
        cost = base + path_penalty * opens
        if best is None or cost < best:
            best = cost
    assert best is not None
    return best


def path_set_cost(
    nodes: Dict[int, Tuple[int, int]],
    paths: Sequence[Sequence[int]],
    path_penalty: int,
) -> int:
    """Objective value achieved by a concrete LINEAR path set (DAG
    graphs: every returned path is a trail, none is a cycle).

    Singleton paths of zero-copy unitigs are excluded: they are the
    traversal's no-sequence-loss fallback (every unitig is emitted at
    least once), not flow paths, and the objective the flow minimizes
    does not include them.
    """
    flow_paths = [
        p for p in paths if not (len(p) == 1 and nodes[p[0]][0] == 0)
    ]
    fl: Dict[int, int] = {u: 0 for u in nodes}
    for p in flow_paths:
        for u in p:
            fl[u] += 1
    base = sum(nodes[u][1] * abs(fl[u] - nodes[u][0]) for u in nodes)
    return base + path_penalty * len(flow_paths)
