"""CLI subcommands and native/python parser parity."""

import json
import os

import numpy as np
import pytest

from sage2_tpu.cli import main
from sage2_tpu.data import simulate_genome, simulate_reads, write_fastq
from sage2_tpu.io import fastq, load_reads
from sage2_tpu.io import native


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    d = tmp_path_factory.mktemp("data")
    genome = simulate_genome(2000, seed=301)
    reads, _ = simulate_reads(genome, read_len=60, coverage=15,
                              error_rate=0.01, seed=302)
    fq = str(d / "reads.fastq.gz")
    write_fastq(fq, reads)
    return d, fq, reads, genome


def test_native_parser_matches_python(dataset):
    d, fq, reads, _ = dataset
    if not native.available():
        pytest.skip("no native toolchain")
    a = native.parse_fastq(fq)
    with fastq._open(fq) as f:
        b = fastq._to_array(fastq._parse_fastq_py(f.read()))
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(a, reads)


def test_native_parser_error_message(tmp_path):
    bad = tmp_path / "bad.fastq"
    bad.write_text("not a fastq\nACGT\n+\nIIII\n")
    if not native.available():
        pytest.skip("no native toolchain")
    with pytest.raises(ValueError, match="malformed"):
        native.parse_fastq(str(bad))


def test_load_reads_mixed_lengths(tmp_path):
    p = tmp_path / "mixed.fastq"
    p.write_text(
        "@a\nACGTACGT\n+\nIIIIIIII\n"
        "@b\nACGTAC\n+\nIIIIII\n"
        "@c\nACGTACGT\n+\nIIIIIIII\n"
    )
    with pytest.raises(ValueError, match="mixed"):
        load_reads([str(p)])
    arr = load_reads([str(p)], length_policy="filter")
    assert arr.shape == (2, 8)
    arr = load_reads([str(p)], length_policy="trim")
    # trim keeps reads >= dominant length (8): a and c
    assert arr.shape == (2, 8)


def test_cli_simulate_and_stats(tmp_path, capsys):
    fq = str(tmp_path / "r.fastq")
    ga = str(tmp_path / "g.fasta")
    rc = main(["simulate", "-o", fq, "--genome-out", ga,
               "--genome-len", "1000", "--read-len", "50",
               "--coverage", "10", "--seed", "5"])
    assert rc == 0
    assert os.path.exists(fq) and os.path.exists(ga)
    rc = main(["stats", ga])
    assert rc == 0
    out = json.loads(capsys.readouterr().out)
    assert out["total_bases"] == 1000


@pytest.mark.slow
def test_cli_assemble_end_to_end(tmp_path, capsys):
    fq = str(tmp_path / "r.fastq.gz")
    genome = simulate_genome(1500, seed=311)
    reads, _ = simulate_reads(genome, read_len=50, coverage=20, seed=312)
    write_fastq(fq, reads)
    outdir = str(tmp_path / "asm")
    rc = main([
        "assemble", "-o", outdir, "--k", "15", "--min-overlap", "25",
        "--min-contig-len", "150",
        "--candidate-capacity", str(1 << 17),
        "--reduce-capacity", str(1 << 18), fq,
    ])
    assert rc == 0
    stats = json.loads(capsys.readouterr().out)
    assert stats["n_contigs"] >= 1
    assert os.path.exists(os.path.join(outdir, "contigs.fasta"))


@pytest.mark.slow
def test_cli_correct_and_overlap(tmp_path, capsys):
    fq = str(tmp_path / "r.fastq")
    genome = simulate_genome(800, seed=321)
    reads, _ = simulate_reads(genome, read_len=40, coverage=15, seed=322)
    write_fastq(fq, reads)
    cor = str(tmp_path / "corrected.fasta")
    rc = main(["correct", "-o", cor, "--k", "15", "--min-overlap", "20", fq])
    assert rc == 0
    assert os.path.exists(cor)
    edges = str(tmp_path / "edges.tsv")
    rc = main([
        "overlap", "-o", edges, "--k", "15", "--min-overlap", "20",
        "--no-correct", "--candidate-capacity", str(1 << 16), fq,
    ])
    assert rc == 0
    lines = open(edges).read().strip().splitlines()
    assert lines[0].startswith("#src")
    assert len(lines) > 1


def test_paired_ingest_and_artifact(tmp_path):
    """R1/R2 pairing survives ingest and dedup: mate vertex pairs land
    in the edges artifact and reference each mate's own sequence
    (BASELINE.json config #1 'paired'; VERDICT round-1 item 10)."""
    import jax

    from sage2_tpu.config import AssemblyConfig
    from sage2_tpu.data import simulate_genome, simulate_reads, write_fastq
    from sage2_tpu.io.fastq import load_read_pairs
    from sage2_tpu.pipeline import assemble

    genome = simulate_genome(3000, seed=55)
    fwd, _ = simulate_reads(genome, read_len=60, coverage=12,
                            error_rate=0.0, seed=56)
    n = fwd.shape[0] // 2
    r1 = fwd[:n]
    r2 = np.ascontiguousarray((3 - fwd[n : 2 * n])[:, ::-1])  # mates RC'd
    f1 = str(tmp_path / "r1.fastq")
    f2 = str(tmp_path / "r2.fastq")
    write_fastq(f1, r1)
    write_fastq(f2, r2)

    reads, mate_of = load_read_pairs([f1, f2])
    assert reads.shape[0] == 2 * n
    np.testing.assert_array_equal(mate_of[mate_of], np.arange(2 * n))

    outdir = str(tmp_path / "asm")
    cfg = AssemblyConfig(k=15, min_overlap=30, min_contig_len=100)
    assemble(reads, cfg, outdir=outdir, mate_of=mate_of)
    z = np.load(outdir + "/edges.npz")
    assert "mate_pairs" in z
    pairs = z["mate_pairs"]
    assert pairs.shape == (n, 2)
    reads2 = z["reads2"]
    # every mate pair references vertices carrying the mates' sequences
    for j in range(0, n, max(1, n // 7)):
        np.testing.assert_array_equal(
            reads2[pairs[j, 0]], r1[j].astype(np.int8))
        np.testing.assert_array_equal(
            reads2[pairs[j, 1]], r2[j].astype(np.int8))


def test_format_detection_by_content(tmp_path):
    """FASTQ content under a .fasta name (and vice versa) parses by
    CONTENT: extension-only detection glued quality lines into one
    giant record."""
    genome = simulate_genome(500, seed=321)
    reads, _ = simulate_reads(genome, read_len=50, coverage=6,
                              error_rate=0.0, seed=322)
    misnamed_fq = str(tmp_path / "actually_fastq.fasta")
    write_fastq(misnamed_fq, reads)
    got = load_reads([misnamed_fq])
    np.testing.assert_array_equal(got, reads.astype(np.int8))

    from sage2_tpu.io.writer import write_fasta

    misnamed_fa = str(tmp_path / "actually_fasta.fastq")
    write_fasta(misnamed_fa, [r.astype(np.int8) for r in reads],
                prefix="read")
    got = load_reads([misnamed_fa])
    np.testing.assert_array_equal(got, reads.astype(np.int8))

    ragged, lens = fastq.load_reads_ragged([misnamed_fq])
    assert (lens == 50).all() and ragged.shape[0] == reads.shape[0]


def test_cli_simulate_fasta_extension(tmp_path, capsys):
    out = str(tmp_path / "reads.fasta")
    main(["simulate", "--genome-len", "400", "--read-len", "40",
          "--coverage", "4", "--out", out])
    with open(out) as f:
        head = f.read(1)
    assert head == ">"
    reads = load_reads([out])
    assert reads.shape[1] == 40 and reads.shape[0] >= 30


def test_legacy_fasta_comments_and_sniffing(tmp_path):
    """Legacy FASTA: leading ';' comment lines and blank lines before
    the first record — content sniffing and both parsers handle them
    (ADVICE r4 low: a 64-byte head + lstrip missed these)."""
    p = tmp_path / "legacy.txt"  # neutral extension: sniffing must win
    p.write_text(
        "\n\n; legacy comment describing the file\n"
        "; another comment\n"
        ">r1\nACGTACGTAC\n"
        "; inline comment between records\n"
        ">r2\nACGT\nACGTAC\n"
    )
    assert fastq._is_fasta(str(p))
    arr, lens = fastq.load_reads_ragged([str(p)])
    assert arr.shape[0] == 2
    np.testing.assert_array_equal(lens, [10, 10])

    # FASTQ behind blank lines still sniffs as FASTQ
    q = tmp_path / "blanky.txt"
    q.write_text("\n\n@a\nACGTACGT\n+\nIIIIIIII\n")
    assert not fastq._is_fasta(str(q))
    got = load_reads([str(q)])
    assert got.shape == (1, 8)


def test_native_fasta_skips_comment_lines(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    p = tmp_path / "c.fasta"
    p.write_text("; comment\n>r1\nACGTACGT\n; mid\n>r2\nACGTACGT\n")
    arr = native.parse_fasta(str(p))
    with open(p, "rb") as f:
        b = fastq._to_array(fastq._parse_fasta_py(f.read()))
    np.testing.assert_array_equal(arr, b)
    assert arr.shape == (2, 8)
