from cugraph_gnn_tpu.utils.datasets import Graph, load_karate, random_graph, symmetrize

__all__ = ["Graph", "load_karate", "random_graph", "symmetrize"]
