from cugraph_gnn_tpu.utils.datasets import Graph, load_karate, random_graph, symmetrize
from cugraph_gnn_tpu.utils import profiling

__all__ = ["Graph", "load_karate", "random_graph", "symmetrize", "profiling"]
