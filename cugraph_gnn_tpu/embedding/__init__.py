from cugraph_gnn_tpu.embedding.embedding import (
    DistEmbedding,
    EmbeddingOptimizer,
    dedup_ids_grads,
)
from cugraph_gnn_tpu.embedding.optimizers import SPECS, UPDATE_FNS

__all__ = [
    "DistEmbedding",
    "EmbeddingOptimizer",
    "SPECS",
    "UPDATE_FNS",
    "dedup_ids_grads",
]
