"""Overlap layer: read dedup + all-pairs exact suffix-prefix detection
(SURVEY.md §2 "Overlap detector", §3.3 — the performance north star)."""

from sage2_tpu.overlap.prepare import ReadSet, prepare_reads
from sage2_tpu.overlap.detect import (
    OverlapResult,
    find_overlaps,
    find_overlaps_auto,
    find_overlaps_stacked,
)

__all__ = [
    "ReadSet",
    "prepare_reads",
    "OverlapResult",
    "find_overlaps",
    "find_overlaps_auto",
    "find_overlaps_stacked",
]
