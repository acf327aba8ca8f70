"""I/O layer: FASTA/FASTQ(.gz) ingest and output (SURVEY.md §2 L1)."""

from sage2_tpu.io.fastq import read_fasta, read_fastq, load_reads
from sage2_tpu.io.writer import write_fasta

__all__ = ["read_fastq", "read_fasta", "load_reads", "write_fasta"]
