from cugraph_gnn_tpu.sampler.neighbor_sampler import (
    NeighborSampler,
    level_capacities,
    uniform_sample_np,
)
from cugraph_gnn_tpu.sampler.output import COOSample, HopBlock, MultihopBatch, to_coo

__all__ = [
    "COOSample",
    "HopBlock",
    "MultihopBatch",
    "NeighborSampler",
    "level_capacities",
    "to_coo",
    "uniform_sample_np",
]
