"""Chunked/streaming stage variants must match in-core results exactly."""

import jax.numpy as jnp
import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.kmer import correct_reads, count_kmers
from sage2_tpu.stream import correct_reads_chunked, count_kmers_chunked

pytestmark = pytest.mark.slow  # multi-second e2e/chunked/sharded cases


def _table_dict(t):
    n = int(t.n_unique)
    return {
        (int(h), int(l)): int(c)
        for h, l, c in zip(
            np.asarray(t.hi)[:n], np.asarray(t.lo)[:n], np.asarray(t.count)[:n]
        )
    }


@pytest.mark.parametrize("chunk", [7, 64, 1000])
def test_chunked_count_matches_incore(chunk):
    genome = simulate_genome(1000, seed=401)
    reads, _ = simulate_reads(genome, read_len=40, coverage=12,
                              error_rate=0.01, seed=402)
    reads = reads.astype(np.int32)
    incore = count_kmers(jnp.asarray(reads), 15)
    chunked = count_kmers_chunked(reads, 15, chunk)
    assert _table_dict(chunked) == _table_dict(incore)


@pytest.mark.parametrize("chunk", [16, 128])
def test_chunked_correct_matches_incore(chunk):
    genome = simulate_genome(800, seed=411)
    reads, _ = simulate_reads(genome, read_len=36, coverage=20,
                              error_rate=0.02, seed=412)
    reads = reads.astype(np.int32)
    incore = np.asarray(correct_reads(jnp.asarray(reads), 11, 3, 2))
    chunked = correct_reads_chunked(reads, 11, 3, 2, chunk)
    np.testing.assert_array_equal(chunked, incore)


@pytest.mark.parametrize("chunk,stride", [(64, None), (300, None), (128, 4)])
def test_chunked_overlaps_match_incore(chunk, stride):
    from sage2_tpu.overlap import find_overlaps, prepare_reads
    from sage2_tpu.stream import find_overlaps_chunked

    genome = simulate_genome(700, seed=421)
    reads, _ = simulate_reads(genome, read_len=60, coverage=12,
                              error_rate=0.005, seed=422)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    incore = find_overlaps(rs.reads2, rs.valid2, 40, capacity=1 << 16,
                           stride=stride)
    assert not bool(incore.overflow)
    n = int(incore.n_edges)
    expect = list(zip(np.asarray(incore.src)[:n].tolist(),
                      np.asarray(incore.dst)[:n].tolist(),
                      np.asarray(incore.ovl)[:n].tolist()))

    src, dst, ovl, n_edges, overflow = find_overlaps_chunked(
        np.asarray(rs.reads2), np.asarray(rs.valid2), 40,
        chunk_reads=chunk, capacity_per_chunk=1 << 15, stride=stride,
    )
    assert not overflow
    assert n_edges == n
    got = list(zip(src.tolist(), dst.tolist(), ovl.tolist()))
    assert got == expect  # identical AND identically ordered


def test_chunked_overlaps_overflow_flag():
    from sage2_tpu.overlap import prepare_reads
    from sage2_tpu.stream import find_overlaps_chunked

    genome = simulate_genome(500, seed=431)
    reads, _ = simulate_reads(genome, read_len=60, coverage=10, seed=432)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    *_, overflow = find_overlaps_chunked(
        np.asarray(rs.reads2), np.asarray(rs.valid2), 40,
        chunk_reads=64, capacity_per_chunk=8,
    )
    assert overflow


def test_streamed_assemble_bit_identical():
    """Pipeline with max_device_reads smaller than the input produces
    contigs bit-identical to the in-core run (SURVEY.md §7 'datasets
    larger than HBM' wired into the product, not just stream.py)."""
    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.pipeline import assemble

    genome = simulate_genome(4000, seed=77)
    reads, _ = simulate_reads(
        genome, read_len=70, coverage=25, error_rate=0.008, seed=78
    )
    cfg_core = AssemblyConfig(k=15, min_overlap=28, min_contig_len=120)
    cfg_stream = AssemblyConfig(
        k=15, min_overlap=28, min_contig_len=120,
        max_device_reads=reads.shape[0] // 4,
    )
    c1, s1 = assemble(reads, cfg_core)
    c2, s2 = assemble(reads, cfg_stream)
    assert s1 == s2
    assert len(c1) == len(c2)
    for a, b in zip(c1, c2):
        np.testing.assert_array_equal(a, b)


def test_prepare_reads_chunked_matches_device():
    from sage2_tpu.overlap import prepare_reads
    from sage2_tpu.stream import prepare_reads_chunked

    genome = simulate_genome(900, seed=91)
    reads, _ = simulate_reads(
        genome, read_len=50, coverage=20, error_rate=0.0, seed=92
    )
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    r2, v2, m2, n_u, vread, _l2 = prepare_reads_chunked(reads.astype(np.int8), 37)
    assert n_u == int(rs.n_unique)
    np.testing.assert_array_equal(v2, np.asarray(rs.valid2))
    np.testing.assert_array_equal(m2, np.asarray(rs.multiplicity))
    np.testing.assert_array_equal(
        r2[v2], np.asarray(rs.reads2, dtype=np.int8)[np.asarray(rs.valid2)]
    )
    np.testing.assert_array_equal(vread, np.asarray(rs.vertex_of_read))
    # each input read's vertex row carries its own sequence
    for i in range(0, reads.shape[0], 17):
        np.testing.assert_array_equal(r2[vread[i]], reads[i].astype(np.int8))


@pytest.mark.parametrize("block,chunk", [(50, 64), (97, 300), (64, 64)])
def test_blocked_overlaps_match_incore(block, chunk):
    """Block-nested entry chunking (entry side streamed too) is
    bit-identical — same edges, same order — to the in-core join
    (VERDICT r4 #3: lifts the single-device streamed HBM ceiling)."""
    from sage2_tpu.overlap import find_overlaps, prepare_reads
    from sage2_tpu.stream import find_overlaps_chunked

    genome = simulate_genome(700, seed=441)
    reads, _ = simulate_reads(genome, read_len=60, coverage=12,
                              error_rate=0.005, seed=442)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    incore = find_overlaps(rs.reads2, rs.valid2, 40, capacity=1 << 16)
    assert not bool(incore.overflow)
    n = int(incore.n_edges)
    expect = list(zip(np.asarray(incore.src)[:n].tolist(),
                      np.asarray(incore.dst)[:n].tolist(),
                      np.asarray(incore.ovl)[:n].tolist()))

    src, dst, ovl, n_edges, overflow = find_overlaps_chunked(
        np.asarray(rs.reads2), np.asarray(rs.valid2), 40,
        chunk_reads=chunk, capacity_per_chunk=1 << 15,
        entry_block_reads=block,
    )
    assert not overflow
    assert n_edges == n
    got = list(zip(src.tolist(), dst.tolist(), ovl.tolist()))
    assert got == expect


def test_blocked_overlaps_spill_store(tmp_path):
    """Blocked join with a spill store: fragments merge into the same
    padded edges_* memmaps the single-slab path writes; transient
    fragment files are removed."""
    from sage2_tpu.overlap import prepare_reads
    from sage2_tpu.stream import find_overlaps_chunked
    from sage2_tpu.utils.spill import SpillStore

    genome = simulate_genome(700, seed=443)
    reads, _ = simulate_reads(genome, read_len=60, coverage=12,
                              error_rate=0.005, seed=444)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    r2 = np.asarray(rs.reads2)
    v2 = np.asarray(rs.valid2)
    plain = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                  capacity_per_chunk=1 << 16)
    st = SpillStore(str(tmp_path))
    blk = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                capacity_per_chunk=1 << 16,
                                entry_block_reads=70, store=st)
    assert blk[3] == plain[3] and not blk[4]
    n = plain[3]
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(blk[i])[:n], plain[i][:n])
    # padded to the 2^14 grain with the sentinel, like the base path
    assert blk[0].shape[0] % (1 << 14) == 0
    assert (np.asarray(blk[0][n:]) == 2**31 - 1).all()
    assert not st.exists("efrag0_src")


def test_blocked_overlaps_overflow_fail_fast():
    from sage2_tpu.overlap import prepare_reads
    from sage2_tpu.stream import find_overlaps_chunked

    genome = simulate_genome(500, seed=445)
    reads, _ = simulate_reads(genome, read_len=60, coverage=10, seed=446)
    rs = prepare_reads(jnp.asarray(reads.astype(np.int32)))
    *_, overflow = find_overlaps_chunked(
        np.asarray(rs.reads2), np.asarray(rs.valid2), 40,
        chunk_reads=64, capacity_per_chunk=8, entry_block_reads=50,
    )
    assert overflow
