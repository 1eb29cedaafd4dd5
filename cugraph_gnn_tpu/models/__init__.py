from cugraph_gnn_tpu.models.builder import create_gnn_model, model_from_args
from cugraph_gnn_tpu.models.conv import (
    GATConv,
    GCNConv,
    GINConv,
    RGCNConv,
    SAGEConv,
)
from cugraph_gnn_tpu.models.zoo import (
    GAT,
    GCN,
    GIN,
    GraphSAGE,
    MultihopModel,
    RGCN,
)

__all__ = [
    "GAT",
    "GCN",
    "GIN",
    "GATConv",
    "GCNConv",
    "GINConv",
    "GraphSAGE",
    "MultihopModel",
    "RGCN",
    "RGCNConv",
    "SAGEConv",
    "create_gnn_model",
    "model_from_args",
]
