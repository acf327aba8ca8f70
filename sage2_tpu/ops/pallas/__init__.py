"""Pallas TPU kernels for the hot ops (SURVEY.md §2 native checklist).

Each kernel has an XLA fallback (`*_xla`) with identical semantics; the
dispatchers pick Pallas on TPU backends and fall back elsewhere (the
axon sim is experimental — SURVEY.md §7 "keep a CPU fallback path for
every kernel").
"""

from sage2_tpu.ops.pallas.kmer_extract import canonical_kmer_keys_pallas

__all__ = ["canonical_kmer_keys_pallas"]
