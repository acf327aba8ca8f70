"""Host-side spill (memmap) path: bit-identical to the in-RAM streamed
path (VERDICT round-3 #4 — o(global) host memory for configs #4/#5)."""

import numpy as np
import pytest

from sage2_tpu.data import simulate_genome, simulate_reads
from sage2_tpu.utils.spill import SpillStore

pytestmark = pytest.mark.slow


def _reads(n_genome=900, read_len=60, cov=14, err=0.01, seed=501):
    genome = simulate_genome(n_genome, seed=seed)
    reads, _ = simulate_reads(genome, read_len=read_len, coverage=cov,
                              error_rate=err, seed=seed + 1)
    return genome, reads


def test_spill_store_roundtrip(tmp_path):
    st = SpillStore(str(tmp_path))
    a = st.empty("a", np.int8, (5, 3))
    a[:] = np.arange(15, dtype=np.int8).reshape(5, 3)
    a.flush()
    b = st.load("a")
    np.testing.assert_array_equal(np.asarray(b),
                                  np.arange(15).reshape(5, 3))
    w = st.writer("w", np.int32)
    w.append(np.arange(4, dtype=np.int32))
    w.append(np.arange(4, 7, dtype=np.int32))
    out = w.close(pad_to=10, fill=-1)
    np.testing.assert_array_equal(
        np.asarray(out), [0, 1, 2, 3, 4, 5, 6, -1, -1, -1]
    )
    # a second store over the same dir sees the manifest
    st2 = SpillStore(str(tmp_path))
    assert st2.exists("w") and st2.load("w").shape == (10,)


def test_correct_chunked_out_memmap(tmp_path):
    from sage2_tpu.stream import correct_reads_chunked

    _, reads = _reads(n_genome=600, read_len=36, cov=20, err=0.02,
                      seed=511)
    plain = correct_reads_chunked(reads, 11, 3, 2, chunk_reads=64)
    st = SpillStore(str(tmp_path))
    mm = st.empty("corrected", np.int8, reads.shape)
    out = correct_reads_chunked(reads, 11, 3, 2, chunk_reads=64, out=mm)
    assert isinstance(out, np.memmap)
    np.testing.assert_array_equal(np.asarray(out), plain)


@pytest.mark.parametrize("ragged", [False, True])
def test_prepare_chunked_store(tmp_path, ragged):
    from sage2_tpu.stream import prepare_reads_chunked

    _, reads = _reads(seed=521)
    lengths = None
    if ragged:
        rng = np.random.default_rng(522)
        lengths = rng.integers(45, reads.shape[1] + 1,
                               reads.shape[0]).astype(np.int32)
        reads = np.where(
            np.arange(reads.shape[1])[None, :] < lengths[:, None],
            reads, 0,
        ).astype(reads.dtype)
    plain = prepare_reads_chunked(reads, 100, lengths=lengths)
    st = SpillStore(str(tmp_path))
    spill = prepare_reads_chunked(reads, 100, lengths=lengths, store=st)
    np.testing.assert_array_equal(np.asarray(spill[0]), plain[0])  # reads2
    for i in (1, 2, 4):  # valid2, mult, vertex_of_read
        np.testing.assert_array_equal(spill[i], plain[i])
    assert spill[3] == plain[3]
    if ragged:
        np.testing.assert_array_equal(spill[5], plain[5])


def test_overlaps_chunked_store(tmp_path):
    from sage2_tpu.stream import find_overlaps_chunked, prepare_reads_chunked

    _, reads = _reads(n_genome=700, seed=531)
    r2, v2, _, _, _, _ = prepare_reads_chunked(reads, 200)
    plain = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                  capacity_per_chunk=1 << 16)
    st = SpillStore(str(tmp_path))
    spill = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                  capacity_per_chunk=1 << 16, store=st)
    assert spill[3] == plain[3] and not spill[4]
    n = plain[3]
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(spill[i])[:n], plain[i][:n]
        )
    # spilled output is sentinel-padded to the pipeline's 2^14 grain
    assert spill[0].shape[0] % (1 << 14) == 0
    assert (np.asarray(spill[0][n:]) == 2**31 - 1).all()


def _assemble(reads, tmp, spill, outdir=None, resume=None, lengths=None):
    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.pipeline import assemble

    cfg = AssemblyConfig(
        k=15, min_overlap=30, max_device_reads=400,
        spill_dir=str(tmp / "spill") if spill else None,
    )
    return assemble(reads, cfg, outdir=outdir, resume_from=resume,
                    lengths=lengths)


def test_assemble_spill_identical(tmp_path):
    genome, reads = _reads(n_genome=1500, read_len=50, cov=15,
                           err=0.005, seed=541)
    contigs_a, stats_a = _assemble(reads, tmp_path, spill=False)
    contigs_b, stats_b = _assemble(reads, tmp_path, spill=True)
    assert stats_a == stats_b
    assert len(contigs_a) == len(contigs_b)
    for a, b in zip(contigs_a, contigs_b):
        np.testing.assert_array_equal(a, b)


def test_assemble_spill_ragged_identical(tmp_path):
    genome, reads = _reads(n_genome=1200, read_len=50, cov=16,
                           err=0.005, seed=551)
    rng = np.random.default_rng(552)
    lengths = rng.integers(42, reads.shape[1] + 1,
                           reads.shape[0]).astype(np.int32)
    reads = np.where(
        np.arange(reads.shape[1])[None, :] < lengths[:, None], reads, 0
    ).astype(reads.dtype)
    a = _assemble(reads, tmp_path, spill=False, lengths=lengths)
    b = _assemble(reads, tmp_path, spill=True, lengths=lengths)
    assert a[1] == b[1]
    for x, y in zip(a[0], b[0]):
        np.testing.assert_array_equal(x, y)


def test_assemble_spill_resume(tmp_path):
    _, reads = _reads(n_genome=1000, read_len=50, cov=15, err=0.005,
                      seed=561)
    outdir = str(tmp_path / "out")
    full = _assemble(reads, tmp_path, spill=True, outdir=outdir)
    resumed = _assemble(reads, tmp_path, spill=True, outdir=outdir,
                        resume="reduce")
    assert full[1] == resumed[1]
    for a, b in zip(full[0], resumed[0]):
        np.testing.assert_array_equal(a, b)


def test_assemble_spill_streamed_meshed(tmp_path):
    """Spill composes with streaming x mesh (config #4 shape): corrected
    reads + dedup'd store + gathered edge artifact live in memmaps,
    output bit-identical, and resume re-enters from the spill files."""
    from dataclasses import replace

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.pipeline import assemble

    _, reads = _reads(n_genome=1500, read_len=50, cov=13, err=0.01,
                      seed=571)
    cfg = AssemblyConfig(k=15, min_overlap=25, min_contig_len=150)
    single, s_stats = assemble(reads, cfg)
    out = str(tmp_path / "out")
    both = replace(cfg, mesh_shape=(8,), max_device_reads=128,
                   spill_dir=str(tmp_path / "spill"))
    spilled, sp_stats = assemble(reads, both, outdir=out)
    assert s_stats == sp_stats
    for a, b in zip(single, spilled):
        np.testing.assert_array_equal(a, b)
    st = SpillStore(str(tmp_path / "spill"))
    assert st.exists("corrected") and st.exists("reads2")
    assert st.exists("edges_src")
    resumed, r_stats = assemble(reads, both, outdir=out,
                                resume_from="reduce")
    assert r_stats == sp_stats
    for a, b in zip(spilled, resumed):
        np.testing.assert_array_equal(a, b)
