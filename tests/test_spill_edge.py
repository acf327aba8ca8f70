"""Spill-store edge cases from the round-4 advisor findings: empty
appenders (first-chunk overflow / zero-edge runs), abort(), store
metadata, and resume validation against stale/missing spill dirs."""

import numpy as np
import pytest

from sage2_tpu.utils.spill import SpillStore


def test_empty_appender_close(tmp_path):
    # ADVICE r4 high: close() with n=0 and no pad_to used to mmap a
    # zero-length file and crash with "cannot mmap an empty file"
    st = SpillStore(str(tmp_path))
    w = st.writer("w", np.int32)
    out = w.close()
    assert out.shape == (0,) and out.dtype == np.int32
    # the registered zero-length entry loads fine too (fresh store)
    st2 = SpillStore(str(tmp_path))
    assert st2.exists("w") is True or st2.load("w").shape == (0,)
    assert st2.load("w").shape == (0,)


def test_appender_abort(tmp_path):
    st = SpillStore(str(tmp_path))
    w = st.writer("w", np.int32)
    w.append(np.arange(4, dtype=np.int32))
    w.abort()
    assert not st.exists("w")
    import os

    assert not os.path.exists(st.path("w"))


def test_first_chunk_overflow_fail_fast_with_store(tmp_path):
    """Overflow on the FIRST chunk with a spill store attached must
    return overflow=True (capacity-retry contract), not crash in
    close() on the empty appender."""
    from sage2_tpu.data import simulate_genome, simulate_reads
    from sage2_tpu.stream import find_overlaps_chunked, prepare_reads_chunked

    genome = simulate_genome(700, seed=601)
    reads, _ = simulate_reads(genome, read_len=60, coverage=14,
                              error_rate=0.01, seed=602)
    r2, v2, _, _, _, _ = prepare_reads_chunked(reads, 200)
    st = SpillStore(str(tmp_path))
    out = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                capacity_per_chunk=16, store=st)
    assert out[4] is True or out[4]  # overflow flagged
    assert out[3] == 0
    # a retry at real capacity over the same store works
    plain = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                  capacity_per_chunk=1 << 16)
    retry = find_overlaps_chunked(r2, v2, 40, chunk_reads=256,
                                  capacity_per_chunk=1 << 16, store=st)
    assert retry[3] == plain[3] and not retry[4]
    n = plain[3]
    for i in range(3):
        np.testing.assert_array_equal(
            np.asarray(retry[i])[:n], plain[i][:n]
        )


def test_store_meta_roundtrip(tmp_path):
    st = SpillStore(str(tmp_path))
    assert st.get_meta("config_digest") is None
    st.set_meta("config_digest", "abc123")
    st2 = SpillStore(str(tmp_path))
    assert st2.get_meta("config_digest") == "abc123"
    # meta does not collide with arrays
    a = st2.empty("x", np.int8, (3,))
    a[:] = 1
    assert st2.get_meta("config_digest") == "abc123"


def _tiny_reads():
    from sage2_tpu.data import simulate_genome, simulate_reads

    genome = simulate_genome(800, seed=611)
    reads, _ = simulate_reads(genome, read_len=50, coverage=12,
                              error_rate=0.005, seed=612)
    return reads


def test_resume_wrong_spill_config_raises(tmp_path):
    from dataclasses import replace

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.pipeline import assemble

    reads = _tiny_reads()
    outdir = str(tmp_path / "out")
    cfg = AssemblyConfig(k=15, min_overlap=30, max_device_reads=100,
                         spill_dir=str(tmp_path / "spill"))
    assemble(reads, cfg, outdir=outdir)
    # resuming with a different config against the same spill dir fails
    # loudly instead of silently mixing mismatched arrays
    bad = replace(cfg, min_overlap=28)
    with pytest.raises(ValueError, match="different config"):
        assemble(reads, bad, outdir=outdir, resume_from="reduce")


def test_resume_spilled_outdir_without_spill_dir_raises(tmp_path):
    from dataclasses import replace

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.pipeline import assemble

    reads = _tiny_reads()
    outdir = str(tmp_path / "out")
    cfg = AssemblyConfig(k=15, min_overlap=30, max_device_reads=100,
                         spill_dir=str(tmp_path / "spill"))
    assemble(reads, cfg, outdir=outdir)
    no_spill = replace(cfg, spill_dir=None)
    with pytest.raises(ValueError, match="spill"):
        assemble(reads, no_spill, outdir=outdir, resume_from="reduce")
