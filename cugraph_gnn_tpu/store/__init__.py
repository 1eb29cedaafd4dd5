from cugraph_gnn_tpu.store.dist_array import DistArray, alltoallv
from cugraph_gnn_tpu.store.dist_matrix import DistMatrix
from cugraph_gnn_tpu.store.hierarchical import HierarchicalDistArray
from cugraph_gnn_tpu.store.partition import (
    PartitionBook,
    RoundRobinBook,
    even_shard_size,
)

__all__ = [
    "DistArray",
    "DistMatrix",
    "HierarchicalDistArray",
    "PartitionBook",
    "RoundRobinBook",
    "alltoallv",
    "even_shard_size",
]
