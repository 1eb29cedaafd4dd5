from cugraph_gnn_tpu.data.feature_store import FeatureStore
from cugraph_gnn_tpu.data.graph_store import GraphStore, SamplingGraph

__all__ = ["FeatureStore", "GraphStore", "SamplingGraph"]
