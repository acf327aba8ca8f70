"""Min-cost flow traversal: oracle cost parity, repeat resolution, and
the e2e case where the greedy walk demonstrably misroutes."""

import numpy as np
import pytest

from sage2_tpu.graph.finish import (
    Unitig,
    UnitigGraph,
    greedy_budget_paths,
    mincost_paths,
)
from sage2_tpu.refmodel.flow import oracle_min_flow_cost, path_set_cost

LAM = 150


def make_graph(nodes, edges):
    """nodes: {uid: (copies, length)}; edges: [(a, b)] with overlap 10."""
    unitigs = {}
    v = 0
    uid_of_head, uid_of_tail = {}, {}
    for uid, (c, ln) in nodes.items():
        unitigs[uid] = Unitig(
            uid, [v], [], ln, 1, coverage=float(c), copy_count=c
        )
        uid_of_head[v] = uid
        uid_of_tail[v] = uid
        v += 1
    out_edges = {u: [] for u in unitigs}
    in_edges = {u: [] for u in unitigs}
    for (a, b) in edges:
        out_edges[a].append((b, 10))
        in_edges[b].append((a, 10))
    return UnitigGraph(unitigs, out_edges, in_edges, uid_of_head, uid_of_tail)


CASES = [
    # linear chain, all single copy
    ({0: (1, 300), 1: (1, 400), 2: (1, 500)}, [(0, 1), (1, 2)]),
    # two-copy repeat between two flanks: X->R->Y, X2->R->Y2
    ({0: (1, 400), 1: (2, 300), 2: (1, 400), 3: (1, 350), 4: (1, 450)},
     [(0, 1), (3, 1), (1, 2), (1, 4)]),
    # junction with a zero-copy artifact branch
    ({0: (1, 500), 1: (1, 400), 2: (0, 250)}, [(0, 1), (0, 2)]),
    # diamond
    ({0: (1, 300), 1: (1, 200), 2: (1, 250), 3: (1, 300)},
     [(0, 1), (0, 2), (1, 3), (2, 3)]),
    # isolated singletons
    ({0: (1, 300), 1: (1, 250)}, []),
]


@pytest.mark.parametrize("nodes,edges", CASES)
def test_flow_cost_matches_bruteforce(nodes, edges):
    g = make_graph(nodes, edges)
    paths = mincost_paths(g, cap=10**6, path_penalty=LAM)
    got = path_set_cost(nodes, paths, LAM)
    want = oracle_min_flow_cost(nodes, edges, LAM)
    assert got == want, (paths, got, want)


def test_repeat_traversed_in_both_contexts():
    # genome X R Y R Z: flow routes one path X R Y R Z (Euler splice);
    # greedy misroutes (X R Z + Y R fragments or similar)
    nodes = {0: (1, 400), 1: (2, 300), 2: (1, 350), 3: (1, 450)}
    # X=0 -> R=1 -> {Y=2, Z=3}, Y -> R
    edges = [(0, 1), (1, 2), (2, 1), (1, 3)]
    g = make_graph(nodes, edges)
    paths = mincost_paths(g, cap=10**6, path_penalty=LAM)
    assert [0, 1, 2, 1, 3] in paths
    # and it is the ONLY path (no fragments)
    assert len(paths) == 1

    g2 = make_graph(nodes, edges)
    greedy = greedy_budget_paths(g2, cap=10**6)
    assert [0, 1, 2, 1, 3] not in greedy  # the motivating failure


def test_cycle_emitted_once():
    # circular genome: single 2-chain cycle, copy 1 each
    nodes = {0: (1, 500), 1: (1, 400)}
    edges = [(0, 1), (1, 0)]
    g = make_graph(nodes, edges)
    paths = mincost_paths(g, cap=10**6, path_penalty=LAM)
    assert paths == [[0, 1]]


def test_no_sequence_loss():
    # zero-copy artifact still emitted (as singleton) if flow skips it
    nodes = {0: (1, 500), 1: (0, 80)}
    edges = [(0, 1)]
    g = make_graph(nodes, edges)
    paths = mincost_paths(g, cap=10**6, path_penalty=LAM)
    covered = {u for p in paths for u in p}
    assert covered == {0, 1}


def test_determinism():
    nodes, edges = CASES[1]
    g1 = make_graph(nodes, edges)
    g2 = make_graph(nodes, edges)
    assert mincost_paths(g1, 10**6, LAM) == mincost_paths(g2, 10**6, LAM)


@pytest.mark.slow
def test_e2e_repeat_genome_mincost_beats_greedy():
    """Simulated genome with an exact interior repeat longer than the
    read length: min-cost flow reconstructs one contig spanning both
    repeat copies; exact-substring check proves no misjoin."""
    import jax.numpy as jnp

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.pipeline import assemble

    rng = np.random.default_rng(5)
    x = rng.integers(0, 4, 900)
    r = rng.integers(0, 4, 160)      # repeat, > read_len
    y = rng.integers(0, 4, 700)
    z = rng.integers(0, 4, 900)
    genome = np.concatenate([x, r, y, r, z]).astype(np.int8)
    reads, _ = simulate_reads(
        genome, read_len=80, coverage=30, error_rate=0.0, seed=11
    )
    cfg = AssemblyConfig(k=17, min_overlap=40, traversal="mincost",
                         min_contig_len=150)
    contigs, stats = assemble(reads, cfg)
    gs = "".join("ACGT"[c] for c in genome)

    def as_str(c):
        return "".join("ACGT"[int(x)] for x in c)

    # every contig must be an exact substring of the genome (either
    # strand): no misjoins
    for c in contigs:
        fwd = as_str(c)
        rev = as_str((3 - c)[::-1])
        assert fwd in gs or rev in gs, "misassembled contig"
    # and the repeat must be spanned: some contig longer than x+r prefix
    # region forces traversal through both repeat contexts
    assert stats["max_contig"] > len(x) + len(r) + 50


def test_native_solver_bit_identical_to_python():
    """The C++ circulation solver is an exact port: flows (not just
    costs) must equal the Python loops bit for bit on random instances
    (same arc order, same comparisons, same cycle walks)."""
    import numpy as np

    from sage2_tpu.graph import flow_native
    from sage2_tpu.graph.flowpaths import Circulation

    if not flow_native.available():
        import pytest

        pytest.skip("no native toolchain")

    rng = np.random.default_rng(991)
    for trial in range(20):
        n = int(rng.integers(4, 40))
        net_py = Circulation(n)
        arcs = []
        for _ in range(int(rng.integers(n, 4 * n))):
            u, v = rng.integers(0, n, 2)
            cap = int(rng.integers(0, 8))
            cost = int(rng.integers(-10, 11))
            arcs.append((int(u), int(v), cap, cost))
            net_py.add_arc(int(u), int(v), cap, cost)
        # python reference (force the fallback path)
        to = np.fromiter((a.to for a in net_py.arcs), np.int32)
        cap_a = np.fromiter((a.cap for a in net_py.arcs), np.int64)
        cost_a = np.fromiter((a.cost for a in net_py.arcs), np.int64)
        # run pure python by temporarily disabling the native route
        import sage2_tpu.graph.flow_native as fn

        orig = fn.solve_circulation
        fn.solve_circulation = lambda *a, **k: None
        try:
            cost_py = net_py.solve()
        finally:
            fn.solve_circulation = orig
        flows_py = [a.flow for a in net_py.arcs]

        flow_nat = flow_native.solve_circulation(
            n, to, cap_a, cost_a, 1_000_000
        )
        assert flow_nat is not None
        assert flow_nat.tolist() == flows_py, f"trial {trial}"
        cost_nat = int(sum(
            int(f) * int(c) for f, c in
            zip(flow_nat.tolist()[::2], cost_a.tolist()[::2])
        ))
        assert cost_nat == cost_py, f"trial {trial}"
