"""Synthetic genome / Illumina-read simulation.

The environment has no network and the reference mount is empty
(SURVEY.md §0), so the acceptance datasets (E. coli, S. aureus GAGE-B,
...) cannot be downloaded. This module generates reproducible stand-ins:
random (optionally repeat-seeded) genomes and uniform-coverage error-prone
fixed-length reads from both strands, written as arrays or FASTQ.
"""

from __future__ import annotations

import gzip
from typing import Optional, Tuple

import numpy as np


def simulate_genome(
    length: int,
    seed: int = 0,
    repeat_fraction: float = 0.0,
    repeat_len: int = 500,
) -> np.ndarray:
    """Random genome as 2-bit codes, with optional exact repeats.

    ``repeat_fraction`` of the genome is covered by copies of a single
    repeat unit, emulating the repetitive structure that stresses the
    overlap graph (bubbles / tangles).
    """
    rng = np.random.default_rng(seed)
    g = rng.integers(0, 4, size=length, dtype=np.int8)
    if repeat_fraction > 0:
        unit = rng.integers(0, 4, size=repeat_len, dtype=np.int8)
        n_copies = max(1, int(length * repeat_fraction / repeat_len))
        for _ in range(n_copies):
            pos = int(rng.integers(0, max(1, length - repeat_len)))
            g[pos : pos + repeat_len] = unit[: max(0, min(repeat_len, length - pos))]
    return g.astype(np.int8)


def simulate_reads(
    genome: np.ndarray,
    read_len: int = 100,
    coverage: float = 30.0,
    error_rate: float = 0.0,
    seed: int = 1,
    both_strands: bool = True,
    circular: bool = False,
) -> Tuple[np.ndarray, np.ndarray]:
    """Uniform-coverage fixed-length reads with substitution errors.

    Returns (reads (N, read_len) int8 codes, true_positions (N,) int64).
    Positions of reverse-strand reads refer to the forward genome
    coordinate of the read's first sampled base.
    """
    rng = np.random.default_rng(seed)
    G = len(genome)
    if circular:
        n_reads = int(np.ceil(coverage * G / read_len))
        starts = rng.integers(0, G, size=n_reads)
        idx = (starts[:, None] + np.arange(read_len)[None, :]) % G
        reads = genome[idx].astype(np.int8)
    else:
        span = G - read_len + 1
        if span <= 0:
            raise ValueError("genome shorter than read length")
        n_reads = int(np.ceil(coverage * G / read_len))
        starts = rng.integers(0, span, size=n_reads)
        idx = starts[:, None] + np.arange(read_len)[None, :]
        reads = genome[idx].astype(np.int8)
    if both_strands:
        flip = rng.random(n_reads) < 0.5
        reads[flip] = (3 - reads[flip])[:, ::-1]
    if error_rate > 0:
        err = rng.random(reads.shape) < error_rate
        shift = rng.integers(1, 4, size=reads.shape)
        reads = np.where(err, (reads + shift) % 4, reads).astype(np.int8)
    return reads, starts.astype(np.int64)


def write_fastq(
    path: str, reads: np.ndarray, quality: int = 40, name_prefix: str = "sim"
) -> None:
    """Write code-array reads as (optionally gzipped) FASTQ."""
    from sage2_tpu.ops.bitpack import decode_to_ascii

    opener = gzip.open if path.endswith(".gz") else open
    q = chr(quality + 33) * reads.shape[1]
    with opener(path, "wt") as f:
        for i, r in enumerate(reads):
            f.write(
                f"@{name_prefix}_{i}\n{decode_to_ascii(r).tobytes().decode()}\n+\n{q}\n"
            )
