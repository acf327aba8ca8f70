"""Graph engine: string-graph reduction, cleaning, contig traversal, and
mate-pair scaffolding (SURVEY.md §2 L4/L5)."""

from sage2_tpu.graph.reduce import transitive_reduction
from sage2_tpu.graph.scaffold import scaffold_contigs
from sage2_tpu.graph.traverse import contract_unitigs

__all__ = ["transitive_reduction", "contract_unitigs", "scaffold_contigs"]
