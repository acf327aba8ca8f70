"""Multi-device parallelism: mesh construction and sharded pipeline stages
(SURVEY.md §2 parallelism table, §5 "Distributed communication backend")."""

from sage2_tpu.parallel.mesh import init_distributed, make_mesh
from sage2_tpu.parallel.sharded import (
    gather_cyclic_shards,
    gather_edge_shards,
    partition_edges_by_src,
    sharded_contract_unitigs,
    sharded_count_kmers,
    sharded_correct_reads,
    sharded_find_overlaps,
    sharded_transitive_reduction,
)
from sage2_tpu.parallel.sharded_stream import (
    sharded_correct_reads_chunked,
    sharded_count_kmers_chunked,
    sharded_find_overlaps_chunked,
)

__all__ = [
    "init_distributed",
    "make_mesh",
    "gather_cyclic_shards",
    "gather_edge_shards",
    "partition_edges_by_src",
    "sharded_contract_unitigs",
    "sharded_count_kmers",
    "sharded_correct_reads",
    "sharded_correct_reads_chunked",
    "sharded_count_kmers_chunked",
    "sharded_find_overlaps",
    "sharded_find_overlaps_chunked",
    "sharded_transitive_reduction",
]
