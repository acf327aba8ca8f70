"""sage2_tpu — a TPU-native de novo genome assembler.

A from-scratch reimplementation of the capabilities of SAGE2
(lucian-ilie/SAGE2: overlap-graph assembly of short Illumina reads with
spectrum error correction, exact suffix-prefix overlap detection,
string-graph transitive reduction, and coverage-cost contig traversal),
redesigned for TPUs: integer-exact, sort-based device algorithms in
JAX/XLA with Pallas kernels for the hot loops and `shard_map` collectives
for multi-chip scaling.

Reference provenance: the reference mount (/root/reference) was empty at
build time; the method is reconstructed from the driver spec
(BASELINE.json) and the published SAGE / SAGE2 / RACER papers — see
SURVEY.md sections 0 and 8. File:line citations to the C++ reference are
therefore not possible; each module instead cites the survey section and
paper that defines its behavior.
"""

from sage2_tpu.config import AssemblyConfig

__version__ = "0.1.0"

__all__ = ["AssemblyConfig", "__version__"]
