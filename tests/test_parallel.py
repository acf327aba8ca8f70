"""Sharded stages on a virtual 8-device CPU mesh vs single-device results
(SURVEY.md §4 "Distributed tests without a cluster")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.kmer import correct_reads, count_kmers
from sage2_tpu.overlap import find_overlaps, prepare_reads
from sage2_tpu.parallel import (
    make_mesh,
    sharded_correct_reads,
    sharded_count_kmers,
    sharded_find_overlaps,
)

pytestmark = pytest.mark.slow  # multi-second e2e/chunked/sharded cases

_I32_MAX = 2**31 - 1


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8)


def _reads(seed=201, n=128, L=40, err=0.01):
    genome = simulate_genome(800, seed=seed)
    reads, _ = simulate_reads(
        genome, read_len=L, coverage=n * L / 800, error_rate=err, seed=seed + 1
    )
    return reads[:n].astype(np.int32)


def _table_dict(table):
    out = {}
    hi = np.asarray(table.hi).reshape(-1)
    lo = np.asarray(table.lo).reshape(-1)
    ct = np.asarray(table.count).reshape(-1)
    for h, l, c in zip(hi, lo, ct):
        if c > 0:
            out[(int(h), int(l))] = out.get((int(h), int(l)), 0) + int(c)
    return out


def test_sharded_count_matches_single(mesh):
    reads = _reads()
    k = 15
    single = count_kmers(jnp.asarray(reads), k)
    table, overflow = sharded_count_kmers(
        mesh, jnp.asarray(reads), k, route_cap=4096
    )
    assert not bool(overflow)
    assert _table_dict(table) == _table_dict(single)
    # per-device tables partition the key space (no key on two devices)
    hi = np.asarray(table.hi)
    lo = np.asarray(table.lo)
    ct = np.asarray(table.count)
    seen = set()
    for d in range(hi.shape[0]):
        for h, l, c in zip(hi[d], lo[d], ct[d]):
            if c > 0:
                assert (h, l) not in seen
                seen.add((h, l))


def test_sharded_count_overflow(mesh):
    reads = _reads()
    _, overflow = sharded_count_kmers(mesh, jnp.asarray(reads), 15, route_cap=8)
    assert bool(overflow)


def test_sharded_correct_matches_single(mesh):
    reads = _reads(seed=211, err=0.02)
    k, thr, rounds = 11, 3, 2
    single = np.asarray(correct_reads(jnp.asarray(reads), k, thr, rounds))
    out, overflow = sharded_correct_reads(
        mesh, jnp.asarray(reads), k, thr, rounds,
        route_cap=4096, query_cap=4096,
    )
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(out), single)


def _edge_set(src, dst, ovl):
    return {
        (int(a), int(b), int(o))
        for a, b, o in zip(src, dst, ovl)
        if int(a) != _I32_MAX
    }


def test_sharded_overlaps_match_single(mesh):
    from sage2_tpu.parallel.sharded import gather_edge_shards

    reads = _reads(seed=221, err=0.0)
    rs = prepare_reads(jnp.asarray(reads))
    single = find_overlaps(rs.reads2, rs.valid2, 20, capacity=1 << 15)
    assert not bool(single.overflow)
    src, dst, ovl, n_edges, overflow = sharded_find_overlaps(
        mesh, rs.reads2, rs.valid2, 20, seed_len=32,
        row_cap=1 << 12, join_cap=1 << 13,
    )
    assert not bool(overflow)
    got = _edge_set(
        np.asarray(src).reshape(-1), np.asarray(dst).reshape(-1),
        np.asarray(ovl).reshape(-1),
    )
    expect = _edge_set(
        np.asarray(single.src), np.asarray(single.dst), np.asarray(single.ovl)
    )
    assert got == expect
    assert int(n_edges) == int(single.n_edges)
    # host concatenation of the per-device shards is bit-identical to
    # the single-device sorted edge list
    g_src, g_dst, g_ovl = gather_edge_shards(src, dst, ovl, n_edges)
    n = int(n_edges)
    np.testing.assert_array_equal(g_src[:n], np.asarray(single.src)[:n])
    np.testing.assert_array_equal(g_dst[:n], np.asarray(single.dst)[:n])
    np.testing.assert_array_equal(g_ovl[:n], np.asarray(single.ovl)[:n])


def test_sharded_reduction_matches_single(mesh):
    from sage2_tpu.graph.reduce import transitive_reduction
    from sage2_tpu.parallel import sharded_transitive_reduction
    from sage2_tpu.parallel.sharded import partition_edges_by_src

    reads = _reads(seed=231, err=0.0)
    rs = prepare_reads(jnp.asarray(reads))
    res = find_overlaps(rs.reads2, rs.valid2, 16, capacity=1 << 15)
    assert not bool(res.overflow)
    V = rs.reads2.shape[0]
    L = rs.reads2.shape[1]
    single = transitive_reduction(
        res.src, res.dst, res.ovl, V, L, capacity=1 << 15
    )
    assert not bool(single.overflow)

    s_sh, d_sh, o_sh, _vd = partition_edges_by_src(
        res.src, res.dst, res.ovl, V, 8, pad_multiple=256
    )
    src, dst, ovl, n_edges, n_exp, overflow = sharded_transitive_reduction(
        mesh, jnp.asarray(s_sh), jnp.asarray(d_sh), jnp.asarray(o_sh),
        V, L, req_cap=1 << 11, cand_cap=1 << 12,
    )
    assert not bool(overflow)
    assert int(n_exp) == int(single.n_expansions)
    assert int(n_edges) == int(single.n_edges)
    got = _edge_set(
        np.asarray(src).reshape(-1), np.asarray(dst).reshape(-1),
        np.asarray(ovl).reshape(-1),
    )
    expect = _edge_set(
        np.asarray(single.src), np.asarray(single.dst), np.asarray(single.ovl)
    )
    assert got == expect


def test_sharded_reduction_overflow_flag(mesh):
    from sage2_tpu.parallel import sharded_transitive_reduction
    from sage2_tpu.parallel.sharded import partition_edges_by_src

    reads = _reads(seed=231, err=0.0)
    rs = prepare_reads(jnp.asarray(reads))
    res = find_overlaps(rs.reads2, rs.valid2, 16, capacity=1 << 15)
    V, L = rs.reads2.shape
    s_sh, d_sh, o_sh, _vd = partition_edges_by_src(
        res.src, res.dst, res.ovl, V, 8, pad_multiple=256
    )
    *_, overflow = sharded_transitive_reduction(
        mesh, jnp.asarray(s_sh), jnp.asarray(d_sh), jnp.asarray(o_sh),
        V, L, req_cap=1 << 11, cand_cap=8,
    )
    assert bool(overflow)


def test_sharded_unitig_labels_match_single(mesh):
    from sage2_tpu.graph.reduce import transitive_reduction
    from sage2_tpu.graph.traverse import contract_unitigs
    from sage2_tpu.parallel import (
        gather_cyclic_shards,
        partition_edges_by_src,
        sharded_contract_unitigs,
    )

    reads = _reads(seed=241, err=0.0)
    rs = prepare_reads(jnp.asarray(reads))
    res = find_overlaps(rs.reads2, rs.valid2, 16, capacity=1 << 15)
    V, L = rs.reads2.shape
    red = transitive_reduction(res.src, res.dst, res.ovl, V, L,
                               capacity=1 << 15)
    single = contract_unitigs(red.src, red.dst, red.ovl, V)

    s_sh, d_sh, o_sh, _vd = partition_edges_by_src(
        red.src, red.dst, red.ovl, V, 8, pad_multiple=256
    )
    shards, overflow = sharded_contract_unitigs(
        mesh, jnp.asarray(s_sh), jnp.asarray(d_sh), jnp.asarray(o_sh),
        V, route_cap=1 << 11,
    )
    assert not bool(overflow)
    names = ["head", "dist", "nxt", "ovl_next", "outdeg", "indeg"]
    for name, sh, ref in zip(names, shards, single):
        got = gather_cyclic_shards(sh, V)
        np.testing.assert_array_equal(got, np.asarray(ref), err_msg=name)


# --------------------------------------------------------------------------
# streaming x mesh composition (parallel.sharded_stream)
# --------------------------------------------------------------------------


@pytest.mark.slow
def test_sharded_chunked_count_matches_incore(mesh):
    import jax.numpy as jnp

    from sage2_tpu.kmer import count_kmers
    from sage2_tpu.parallel import sharded_count_kmers_chunked

    genome = simulate_genome(1200, seed=61)
    reads, _ = simulate_reads(genome, read_len=40, coverage=15,
                              error_rate=0.02, seed=62)
    reads = reads.astype(np.int32)
    K = 13
    t_ref = count_kmers(jnp.asarray(reads), K)
    nref = int(t_ref.n_unique)
    tbl, ovf = sharded_count_kmers_chunked(
        mesh, reads, K, chunk_reads=100, route_cap=4096, table_cap=4096
    )
    assert not ovf
    hi, lo, ct = (np.asarray(a) for a in (tbl.hi, tbl.lo, tbl.count))
    nu = np.asarray(tbl.n_unique)
    rows = [np.stack([hi[d, : nu[d]], lo[d, : nu[d]], ct[d, : nu[d]]],
                     axis=1) for d in range(hi.shape[0])]
    allr = np.concatenate(rows)
    allr = allr[np.lexsort((allr[:, 1], allr[:, 0]))]
    ref = np.stack([np.asarray(t_ref.hi[:nref]), np.asarray(t_ref.lo[:nref]),
                    np.asarray(t_ref.count[:nref])], axis=1)
    np.testing.assert_array_equal(allr, ref)


@pytest.mark.slow
def test_sharded_chunked_correct_and_overlap_match_incore(mesh):
    import jax.numpy as jnp

    from sage2_tpu.kmer import correct_reads
    from sage2_tpu.overlap import find_overlaps_auto, prepare_reads
    from sage2_tpu.parallel import (
        gather_edge_shards,
        sharded_correct_reads_chunked,
        sharded_find_overlaps_chunked,
    )

    genome = simulate_genome(1200, seed=61)
    reads, _ = simulate_reads(genome, read_len=40, coverage=15,
                              error_rate=0.02, seed=62)
    reads = reads.astype(np.int32)
    K = 13
    corr_ref = np.asarray(correct_reads(jnp.asarray(reads), K, 3, 2),
                          np.int8)
    corr, ovf = sharded_correct_reads_chunked(
        mesh, reads, K, 3, 2, chunk_reads=100,
        route_cap=8192, query_cap=8192, table_cap=4096,
    )
    assert not ovf
    np.testing.assert_array_equal(corr, corr_ref)

    rs = prepare_reads(jnp.asarray(corr_ref.astype(np.int32)))
    res = find_overlaps_auto(rs.reads2, rs.valid2, 20, seed_len=32)
    assert not bool(res.overflow)
    n_ref = int(res.n_edges)
    src_sh, dst_sh, ovl_sh, n_edges, ovf = sharded_find_overlaps_chunked(
        mesh, np.asarray(rs.reads2), np.asarray(rs.valid2), 20, 32,
        chunk_reads=160, row_cap=4096, q_cap=4096, join_cap=1 << 16,
        edge_chunk_cap=4096, edge_cap=1 << 16,
    )
    assert not ovf
    assert n_edges == n_ref
    g_src, g_dst, g_ovl = gather_edge_shards(src_sh, dst_sh, ovl_sh,
                                             n_edges)
    np.testing.assert_array_equal(g_src[:n_edges],
                                  np.asarray(res.src)[:n_edges])
    np.testing.assert_array_equal(g_dst[:n_edges],
                                  np.asarray(res.dst)[:n_edges])
    np.testing.assert_array_equal(g_ovl[:n_edges],
                                  np.asarray(res.ovl)[:n_edges])


def test_sharded_correct_voting_matches_single(mesh):
    reads = _reads(seed=311, err=0.02)
    k, thr, rounds = 11, 3, 2
    single = np.asarray(correct_reads(
        jnp.asarray(reads), k, thr, rounds, rule="vote_all_windows"
    ))
    out, overflow = sharded_correct_reads(
        mesh, jnp.asarray(reads), k, thr, rounds,
        route_cap=8192, query_cap=8192, rule="vote_all_windows",
    )
    assert not bool(overflow)
    np.testing.assert_array_equal(np.asarray(out), single)


def test_sharded_correct_voting_chunked_matches_single(mesh):
    from sage2_tpu.parallel.sharded_stream import (
        sharded_correct_reads_chunked,
    )

    reads = _reads(seed=313, err=0.02)
    k, thr, rounds = 11, 3, 2
    single = np.asarray(correct_reads(
        jnp.asarray(reads), k, thr, rounds, rule="vote_all_windows"
    ))
    out, overflow = sharded_correct_reads_chunked(
        mesh, reads.astype(np.int8), k, thr, rounds,
        chunk_reads=reads.shape[0] // 2 + 8,
        route_cap=8192, query_cap=8192, table_cap=1 << 14,
        rule="vote_all_windows",
    )
    assert not overflow
    np.testing.assert_array_equal(out.astype(np.int32), single)


def test_partition_edges_by_src_matches_bruteforce():
    from sage2_tpu.parallel.sharded import (
        gather_cyclic_shards,
        partition_edges_by_src,
        partition_vertex_range,
    )

    rng = np.random.default_rng(77)
    V, ndev = 103, 8
    E = 400
    src = np.sort(rng.integers(0, V, size=E).astype(np.int32))
    dst = rng.integers(0, V, size=E).astype(np.int32)
    ovl = rng.integers(1, 50, size=E).astype(np.int32)
    # (src, dst)-sort + pad tail
    order = np.lexsort((dst, src))
    src, dst, ovl = src[order], dst[order], ovl[order]
    pad = 37
    src = np.concatenate([src, np.full(pad, 2**31 - 1, np.int32)])
    dst = np.concatenate([dst, np.full(pad, 2**31 - 1, np.int32)])
    ovl = np.concatenate([ovl, np.zeros(pad, np.int32)])

    o_src, o_dst, o_ovl, v_d = partition_edges_by_src(
        src, dst, ovl, V, ndev, pad_multiple=16
    )
    for d in range(ndev):
        m = (src != 2**31 - 1) & (src >= d * v_d) & (src < (d + 1) * v_d)
        n = int(m.sum())
        np.testing.assert_array_equal(o_src[d, :n], src[m])
        np.testing.assert_array_equal(o_dst[d, :n], dst[m])
        np.testing.assert_array_equal(o_ovl[d, :n], ovl[m])
        assert (o_src[d, n:] == 2**31 - 1).all()

    vals = rng.integers(0, 99, size=V).astype(np.int32)
    parts = partition_vertex_range(vals, V, ndev)
    for d in range(ndev):
        seg = vals[d * v_d : (d + 1) * v_d]
        np.testing.assert_array_equal(parts[d, : seg.shape[0]], seg)
        assert (parts[d, seg.shape[0]:] == 0).all()

    # cyclic gather: global[v] = shard[v % ndev, v // ndev]
    v_c = -(-V // ndev)
    sh = rng.integers(0, 9, size=(ndev, v_c)).astype(np.int32)
    out = gather_cyclic_shards(sh, V)
    for v in range(V):
        assert out[v] == sh[v % ndev, v // ndev]


def test_comm_ledger_records_collectives():
    """The collective-volume ledger (config #4 communication model)
    records per-program dispatch counts and operand bytes for the
    sharded stages, and the meshed pipeline logs them."""
    import jax.numpy as jnp

    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.parallel import comm, make_mesh, sharded_count_kmers

    comm.reset()
    mesh = make_mesh(8)
    genome = simulate_genome(600, seed=481)
    reads, _ = simulate_reads(genome, read_len=40, coverage=10,
                              error_rate=0.01, seed=482)
    n = reads.shape[0] - reads.shape[0] % 8
    table, ovf = sharded_count_kmers(
        mesh, jnp.asarray(reads[:n].astype(np.int32)), 13,
        route_cap=1 << 15,
    )
    assert not bool(ovf)
    s = comm.summary()
    assert "sharded_count_kmers" in s
    e = s["sharded_count_kmers"]
    assert e["dispatches"] == 1
    assert e["bytes_per_dispatch"].get("all_to_all", 0) > 0
    assert e["bytes_per_dispatch"].get("psum", 0) > 0
    # second dispatch bumps the counter without re-recording shapes
    sharded_count_kmers(mesh, jnp.asarray(reads[:n].astype(np.int32)),
                        13, route_cap=1 << 15)
    s2 = comm.summary()
    assert s2["sharded_count_kmers"]["dispatches"] == 2
    assert (s2["sharded_count_kmers"]["bytes_per_dispatch"]
            == e["bytes_per_dispatch"])
    comm.reset()
