"""Pure-Python reference model (the parity oracle).

The reference mount was empty (SURVEY.md §0), so no golden outputs from
the C++ SAGE2 binary exist. Per SURVEY.md §4, this module is the interim
oracle: a slow, obviously-correct NumPy/Python implementation of the
documented SAGE2 method. The device pipeline must match it exactly
(integer-exact semantics); true SAGE2 goldens can be swapped in later
without changing any test structure.
"""

from sage2_tpu.refmodel.oracle import (
    oracle_correct,
    oracle_kmer_counts,
    oracle_overlaps,
    oracle_transitive_reduction,
)

__all__ = [
    "oracle_kmer_counts",
    "oracle_correct",
    "oracle_overlaps",
    "oracle_transitive_reduction",
]
