from cugraph_gnn_tpu.loader.dist_loader import (
    auto_mesh,
    DistLinkNeighborLoader,
    DistNeighborLoader,
)
from cugraph_gnn_tpu.loader.link_loader import LinkBatch, LinkLoader, LinkNeighborLoader
from cugraph_gnn_tpu.loader.node_loader import NeighborLoader, NodeBatch, NodeLoader

__all__ = [
    "DistLinkNeighborLoader",
    "DistNeighborLoader",
    "auto_mesh",
    "LinkBatch",
    "LinkLoader",
    "LinkNeighborLoader",
    "NeighborLoader",
    "NodeBatch",
    "NodeLoader",
]
