from cugraph_gnn_tpu.loader.dist_loader import DistNeighborLoader
from cugraph_gnn_tpu.loader.link_loader import LinkBatch, LinkLoader, LinkNeighborLoader
from cugraph_gnn_tpu.loader.node_loader import NeighborLoader, NodeBatch, NodeLoader

__all__ = [
    "DistNeighborLoader",
    "LinkBatch",
    "LinkLoader",
    "LinkNeighborLoader",
    "NeighborLoader",
    "NodeBatch",
    "NodeLoader",
]
