"""k-mer layer: exact counting and spectrum error correction (SURVEY.md §2, L2)."""

from sage2_tpu.kmer.count import KmerTable, count_kmers, lookup_counts
from sage2_tpu.kmer.correct import correct_reads

__all__ = ["KmerTable", "count_kmers", "lookup_counts", "correct_reads"]
