"""Assembly statistics (contig counts, N50/L50, genome fraction).

Matches the reference's final reporting stage (SURVEY.md §2
"Output/stats": contig FASTA, N50, counts).
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np


def nx_metric(lengths: List[int], x: float = 0.5) -> int:
    """Nx: largest l such that contigs >= l cover >= x of total bases."""
    if not lengths:
        return 0
    arr = np.sort(np.asarray(lengths))[::-1]
    csum = np.cumsum(arr)
    target = x * csum[-1]
    idx = int(np.searchsorted(csum, target))
    return int(arr[min(idx, len(arr) - 1)])


def assembly_stats(contigs: List[np.ndarray],
                   genome: Optional[np.ndarray] = None) -> Dict[str, float]:
    lengths = [len(c) for c in contigs]
    total = int(sum(lengths))
    out: Dict[str, float] = {
        "n_contigs": len(contigs),
        "total_bases": total,
        "max_contig": max(lengths) if lengths else 0,
        "n50": nx_metric(lengths, 0.5),
        "n90": nx_metric(lengths, 0.9),
    }
    if genome is not None:
        out["genome_len"] = int(len(genome))
        out["genome_fraction"] = _genome_fraction(contigs, genome)
    return out


def count_misassembled(
    contigs: List[np.ndarray], genome: np.ndarray
) -> int:
    """Contigs with no exact alignment to the genome (either strand).

    The pipeline is exact end-to-end, so on error-free-by-construction
    truth a correct contig must occur verbatim; any contig that doesn't
    is a misassembly (join across repeats, chimera). Stand-in for QUAST
    misassembly counting (SURVEY.md §4).
    """
    gbytes = genome.astype(np.uint8).tobytes()
    bad = 0
    for c in contigs:
        rc = (3 - c)[::-1]
        if (gbytes.find(c.astype(np.uint8).tobytes()) < 0
                and gbytes.find(rc.astype(np.uint8).tobytes()) < 0):
            bad += 1
    return bad


def _genome_fraction(contigs: List[np.ndarray], genome: np.ndarray) -> float:
    """Fraction of genome positions covered by some exactly-aligned contig.

    Exact substring matching only (the pipeline is integer-exact): each
    contig (or its reverse complement) is located in the genome; covered
    positions are counted. Contigs that don't align exactly contribute
    nothing — a conservative stand-in for QUAST-style genome fraction
    (SURVEY.md §4: reference validation is metric-based).
    """
    gbytes = genome.astype(np.uint8).tobytes()
    covered = np.zeros(len(genome), bool)
    for c in contigs:
        for seq in (c, (3 - c)[::-1]):
            sbytes = seq.astype(np.uint8).tobytes()
            start = gbytes.find(sbytes)
            while start >= 0:
                covered[start : start + len(seq)] = True
                start = gbytes.find(sbytes, start + 1)
    return float(covered.mean()) if len(genome) else 0.0
