"""Overlap detection vs brute-force O(n^2) oracle (SURVEY.md §4)."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.overlap import find_overlaps, prepare_reads
from sage2_tpu.refmodel.oracle import oracle_overlaps, revcomp


def _canonical_set(reads):
    out = set()
    for r in reads:
        f = tuple(int(c) for c in r)
        rc = tuple(int(c) for c in revcomp(np.asarray(r)))
        out.add(min(f, rc))
    return out


def _edges_to_dict(res):
    n = int(res.n_edges)
    src = np.asarray(res.src)[:n]
    dst = np.asarray(res.dst)[:n]
    ovl = np.asarray(res.ovl)[:n]
    return {(int(a), int(b)): int(l) for a, b, l in zip(src, dst, ovl)}


def test_prepare_reads_dedup(rng):
    genome = simulate_genome(300, seed=11)
    reads, _ = simulate_reads(genome, read_len=40, coverage=10, seed=12)
    reads = reads.astype(np.int32)
    # inject exact and RC duplicates
    reads = np.concatenate(
        [reads, reads[:3], (3 - reads[:2])[:, ::-1]], axis=0
    )
    rs = prepare_reads(jnp.asarray(reads))
    n_u = int(rs.n_unique)
    assert n_u == len(_canonical_set(reads))
    mult = np.asarray(rs.multiplicity)
    assert mult[:n_u].sum() == reads.shape[0]
    # RC rows mirror forward rows
    r2 = np.asarray(rs.reads2)
    cap = rs.capacity
    for i in range(n_u):
        np.testing.assert_array_equal(r2[i + cap], revcomp(r2[i]))
    # forward rows are canonical (<= their RC)
    for i in range(n_u):
        f = tuple(r2[i])
        assert f <= tuple(revcomp(r2[i]))


@pytest.mark.parametrize("min_overlap,err", [(20, 0.0), (25, 0.01)])
@pytest.mark.slow
def test_overlaps_match_oracle(min_overlap, err):
    genome = simulate_genome(500, seed=21)
    reads, _ = simulate_reads(
        genome, read_len=40, coverage=12, error_rate=err, seed=22
    )
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    res = find_overlaps(
        rs.reads2, rs.valid2, min_overlap, seed_len=32, capacity=1 << 16
    )
    assert not bool(res.overflow)
    got = _edges_to_dict(res)

    n_u = int(rs.n_unique)
    cap = rs.capacity
    r2 = np.asarray(rs.reads2)
    valid_rows = np.concatenate([r2[:n_u], r2[cap : cap + n_u]], axis=0)
    expect_raw = oracle_overlaps(valid_rows, min_overlap)
    # remap oracle indices (compacted) back to vertex ids (capacity space)
    remap = lambda i: i if i < n_u else cap + (i - n_u)
    expect = {(remap(a), remap(b)): l for (a, b), l in expect_raw.items()}
    assert got == expect


@pytest.mark.slow
def test_overlap_edges_symmetric_under_rc():
    genome = simulate_genome(400, seed=31)
    reads, _ = simulate_reads(genome, read_len=36, coverage=10, seed=32)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    res = find_overlaps(rs.reads2, rs.valid2, 18, capacity=1 << 16)
    edges = _edges_to_dict(res)
    cap = rs.capacity
    rc = lambda v: (v + cap) % (2 * cap)
    for (a, b), l in edges.items():
        assert edges.get((rc(b), rc(a))) == l, (a, b)


def test_overflow_flag():
    genome = simulate_genome(400, seed=31)
    reads, _ = simulate_reads(genome, read_len=36, coverage=10, seed=32)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    big = find_overlaps(rs.reads2, rs.valid2, 18, capacity=1 << 16)
    n_cand = int(big.n_candidates)
    assert n_cand > 4
    small = find_overlaps(rs.reads2, rs.valid2, 18, capacity=4)
    assert bool(small.overflow)
    assert int(small.n_candidates) == n_cand  # count is exact even on overflow


@pytest.mark.parametrize("stride", [1, 2, 3, 5, 8])
@pytest.mark.slow
def test_strided_probe_matches_oracle(stride):
    # min_overlap > seed_len leaves stride headroom (g <= min_ovl - s + 1)
    genome = simulate_genome(700, seed=41)
    reads, _ = simulate_reads(
        genome, read_len=60, coverage=12, error_rate=0.005, seed=42
    )
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    res = find_overlaps(
        rs.reads2, rs.valid2, 40, seed_len=32, capacity=1 << 16,
        stride=stride,
    )
    assert not bool(res.overflow)
    got = _edges_to_dict(res)

    n_u = int(rs.n_unique)
    cap = rs.capacity
    r2 = np.asarray(rs.reads2)
    valid_rows = np.concatenate([r2[:n_u], r2[cap : cap + n_u]], axis=0)
    expect_raw = oracle_overlaps(valid_rows, 40)
    remap = lambda i: i if i < n_u else cap + (i - n_u)
    expect = {(remap(a), remap(b)): l for (a, b), l in expect_raw.items()}
    assert got == expect


def test_auto_stride_bounds():
    from sage2_tpu.overlap.detect import auto_stride

    assert auto_stride(40, 32, 60) == 8
    assert auto_stride(33, 32, 60) == 2
    assert auto_stride(32, 32, 60) == 1
    assert auto_stride(20, 32, 20) == 1   # s clamps to min_overlap
    assert auto_stride(90, 32, 4) == 4    # pa-limited


def _pad_ragged(read_list, Lmax):
    n = len(read_list)
    reads = np.zeros((n, Lmax), np.int32)
    lens = np.zeros(n, np.int32)
    for i, r in enumerate(read_list):
        reads[i, : len(r)] = r
        lens[i] = len(r)
    return reads, lens


def _rc_list(read_list):
    return [(3 - r)[::-1] for r in read_list]


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.slow
def test_ragged_overlaps_match_oracle(seed):
    """Variable-length reads: dovetail edges AND containment marks match
    the ragged oracle (VERDICT round-1 item 6)."""
    from sage2_tpu.refmodel.oracle import oracle_overlaps_ragged

    rng = np.random.default_rng(100 + seed)
    genome = simulate_genome(600, seed=300 + seed)
    raw = []
    for _ in range(60):
        ln = int(rng.integers(36, 72))
        start = int(rng.integers(0, len(genome) - ln))
        r = np.array(genome[start : start + ln], np.int32)
        if rng.random() < 0.5:
            r = (3 - r)[::-1]
        raw.append(r)
    # a couple of exact contained reads
    raw.append(np.array(raw[0][5:45], np.int32))
    raw.append((3 - np.array(raw[1][2:50], np.int32))[::-1])
    both = raw + _rc_list(raw)                     # RC-closed vertex set
    n2 = len(both)
    Lmax = max(len(r) for r in both)
    reads, lens = _pad_ragged(both, Lmax)

    res = find_overlaps(
        jnp.asarray(reads), jnp.ones(n2, bool), 30,
        capacity=1 << 16, lengths=jnp.asarray(lens),
    )
    assert not bool(res.overflow)
    got_edges = _edges_to_dict(res)
    got_cont = set(np.nonzero(np.asarray(res.contained))[0])
    # RC symmetrization (prefix-aligned containments appear on the
    # mirror strand; the pipeline applies the same closure)
    got_cont |= {(v + len(raw)) % n2 for v in got_cont}

    expect_edges, expect_cont = oracle_overlaps_ragged(both, 30)
    assert got_edges == expect_edges
    assert got_cont == expect_cont
    assert len(expect_cont) >= 4  # the planted containments + mirrors


def test_words0_seed_keys_and_verify_match_shifted(rng):
    """The unshifted-packing primitives (seed_keys_from_words0,
    verify_candidates_words0 — used by the streamed path to avoid the
    16x shifted-pack blowup) are bit-identical to the shifted-pack
    originals, including on planted true overlaps."""
    import jax.numpy as jnp

    from sage2_tpu.ops import bitpack
    from sage2_tpu.overlap import detect

    M, L = 300, 100
    reads = rng.integers(0, 4, size=(M, L), dtype=np.int32)
    planted = []
    for _ in range(80):
        a, b = rng.integers(0, M, 2)
        if a == b:
            continue
        l = int(rng.integers(40, L))
        reads[b, :l] = reads[a, L - l:]
        planted.append((int(a), L - l, int(b)))
    r = jnp.asarray(reads)
    shifted = bitpack.shifted_word_packs(r)
    words0 = bitpack.pack_read_words(r)

    for s in (32, 24, 16, 12):
        positions = [0, 1, 7, 8, 15, 16, 17, 31, 40, L - s]
        h1, l1 = detect.seed_keys_at_positions(shifted, s, positions, L)
        h2, l2 = detect.seed_keys_from_words0(words0, s, positions, L)
        np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
        np.testing.assert_array_equal(np.asarray(l1), np.asarray(l2))

    C = 5000
    ca = rng.integers(0, M, C).astype(np.int32)
    cb = rng.integers(0, M, C).astype(np.int32)
    cp = rng.integers(1, L - 1, C).astype(np.int32)
    for i, (a, p, b) in enumerate(planted[: C // 2]):
        ca[i], cp[i], cb[i] = a, p, b
    bw = np.asarray(words0)[cb]
    ok_ref = detect.verify_candidates(
        r, jnp.asarray(ca), jnp.asarray(cp), jnp.asarray(cb),
        shifted=shifted, words0=words0, b_words=jnp.asarray(bw),
    )
    ok_new = detect.verify_candidates_words0(
        words0, jnp.asarray(ca), jnp.asarray(cp), jnp.asarray(bw), L,
    )
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_new))
    assert int(np.asarray(ok_new)[: len(planted[: C // 2])].sum()) >= 1
    ok_chunked = detect.verify_candidates_words0(
        words0, jnp.asarray(ca), jnp.asarray(cp), jnp.asarray(bw), L,
        chunk=1024,
    )
    np.testing.assert_array_equal(np.asarray(ok_ref), np.asarray(ok_chunked))


def test_stacked_matches_per_shard():
    """find_overlaps_stacked (K shards, one jit call) is bit-identical to
    find_overlaps per shard (the amortized-dispatch production shape)."""
    from sage2_tpu.overlap import find_overlaps_stacked

    K = 3
    shards = []
    for k in range(K):
        genome = simulate_genome(400, seed=31 + k)
        reads, _ = simulate_reads(
            genome, read_len=40, coverage=10, error_rate=0.005, seed=41 + k
        )
        rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
        shards.append((np.asarray(rs.reads2), np.asarray(rs.valid2)))
    M = max(r.shape[0] for r, _ in shards)
    reads3 = np.zeros((K, M, shards[0][0].shape[1]), np.int32)
    valid3 = np.zeros((K, M), bool)
    for k, (r, v) in enumerate(shards):
        reads3[k, : r.shape[0]] = r
        valid3[k, : v.shape[0]] = v
    cap = 1 << 14
    out = find_overlaps_stacked(
        jnp.asarray(reads3), jnp.asarray(valid3), 20, capacity=cap
    )
    src3, dst3, ovl3, n3, _nc3, nv3, ovf3, dups3 = (
        np.asarray(a) for a in out
    )
    assert not ovf3.any()
    # duplicate compaction is deferred out of the scan; fix up any
    # flagged shard exactly as a production caller would
    from sage2_tpu.overlap.detect import compact_stacked_result

    if dups3.any():
        src3, dst3, ovl3 = compact_stacked_result(out, reads3.shape[2])
    for k in range(K):
        ref = find_overlaps(
            jnp.asarray(reads3[k]), jnp.asarray(valid3[k]), 20, capacity=cap
        )
        assert int(ref.n_edges) == int(n3[k])
        assert int(ref.n_verified) == int(nv3[k])
        np.testing.assert_array_equal(np.asarray(ref.src), src3[k])
        np.testing.assert_array_equal(np.asarray(ref.dst), dst3[k])
        np.testing.assert_array_equal(np.asarray(ref.ovl), ovl3[k])


def test_overlap_polyT_seeds_exact():
    """Reads whose 32-base seeds are all-T carry the all-ones seed key —
    the key the kernel also uses to mark invalid rows. The round-4
    full-key sort distinguishes them by the packed-id sentinel; their
    overlaps must match the oracle exactly (regression for the
    hash-clamp removal)."""
    rng = np.random.default_rng(51)
    genome = np.asarray(rng.integers(0, 4, size=400), np.int8)
    genome[100:180] = 3          # 80-base poly-T stretch
    L, min_ovl = 60, 30
    starts = np.arange(0, 400 - L, 7)
    reads = np.stack([genome[s : s + L] for s in starts]).astype(np.int32)
    res = find_overlaps(
        jnp.asarray(reads), jnp.ones(reads.shape[0], bool), min_ovl,
        seed_len=32, capacity=1 << 14,
    )
    assert not bool(res.overflow)
    got = _edges_to_dict(res)
    expect = oracle_overlaps(reads, min_ovl)
    assert got == expect


def test_stacked_dup_compaction_periodic():
    """Periodic reads create a (src,dst) pair verifying at two overlap
    lengths; the stacked path defers compaction and flags n_dups, and
    compact_stacked_result must reproduce the cond-path output."""
    from sage2_tpu.overlap.detect import compact_stacked_result
    from sage2_tpu.overlap import find_overlaps_stacked

    rng = np.random.default_rng(61)
    unit = np.array([0, 1, 2], np.int32)
    L, min_ovl = 24, 6
    A = np.concatenate([rng.integers(0, 4, 15), np.tile(unit, 3)])
    B = np.tile(unit, 8)
    reads = np.stack([A, B]).astype(np.int32)
    ref = find_overlaps(
        jnp.asarray(reads), jnp.ones(2, bool), min_ovl, capacity=256
    )
    out = find_overlaps_stacked(
        jnp.asarray(reads[None]), jnp.ones((1, 2), bool), min_ovl,
        capacity=256,
    )
    dups = np.asarray(out[7])
    assert dups[0] > 0, "test setup should produce a duplicate pair"
    src3, dst3, ovl3 = compact_stacked_result(out, L)
    assert int(np.asarray(out[3])[0]) == int(ref.n_edges)
    np.testing.assert_array_equal(src3[0], np.asarray(ref.src))
    np.testing.assert_array_equal(dst3[0], np.asarray(ref.dst))
    np.testing.assert_array_equal(ovl3[0], np.asarray(ref.ovl))


def test_build_seed_rows_w0_equality():
    """The words0-based seed-row build is bit-identical to the
    shifted-packs build, for fixed-length and ragged inputs (round-5
    seed-row-build lever; BASELINE.md round-4 floor ledger)."""
    import jax.numpy as jnp

    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.overlap.detect import (
        build_seed_rows,
        build_seed_rows_w0,
        join_geometry,
    )

    genome = simulate_genome(900, seed=461)
    reads, _ = simulate_reads(genome, read_len=100, coverage=8,
                              error_rate=0.01, seed=462)
    r = jnp.asarray(reads.astype(np.int32))
    M, L = r.shape
    valid = jnp.ones(M, bool)
    for min_ovl, s in ((40, 32), (30, 20), (55, 32)):
        geo = join_geometry(L, min_ovl, min(s, min_ovl, 32))
        a = build_seed_rows(r, valid, min(s, min_ovl, 32), geo)
        b = build_seed_rows_w0(r, valid, min(s, min_ovl, 32), geo)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    # ragged (with id_base, as the sharded path uses)
    rng = np.random.default_rng(463)
    lens = rng.integers(60, L + 1, M).astype(np.int32)
    rr = np.where(np.arange(L)[None, :] < lens[:, None], reads, 0)
    r2 = jnp.asarray(rr.astype(np.int32))
    geo = join_geometry(L, 40, 32)
    a = build_seed_rows(r2, valid, 32, geo, id_base=37,
                        lengths=jnp.asarray(lens))
    b = build_seed_rows_w0(r2, valid, 32, geo, id_base=37,
                           lengths=jnp.asarray(lens))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
