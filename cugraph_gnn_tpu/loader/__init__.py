from cugraph_gnn_tpu.loader.link_loader import LinkBatch, LinkLoader, LinkNeighborLoader
from cugraph_gnn_tpu.loader.node_loader import NeighborLoader, NodeBatch, NodeLoader

__all__ = [
    "LinkBatch",
    "LinkLoader",
    "LinkNeighborLoader",
    "NeighborLoader",
    "NodeBatch",
    "NodeLoader",
]
