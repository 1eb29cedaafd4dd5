from cugraph_gnn_tpu.models.conv import GATConv, GCNConv, RGCNConv, SAGEConv
from cugraph_gnn_tpu.models.zoo import GAT, GCN, GraphSAGE, MultihopModel, RGCN

__all__ = [
    "GAT",
    "GCN",
    "GATConv",
    "GCNConv",
    "GraphSAGE",
    "MultihopModel",
    "RGCN",
    "RGCNConv",
    "SAGEConv",
]
