from cugraph_gnn_tpu.ops.csr import (
    CSR,
    coo_to_csr,
    coo_to_csr_np,
    csr_add_self_loop,
    edge_mask_valid,
)
from cugraph_gnn_tpu.ops.dist_full_batch import DistFullBatchGraph
from cugraph_gnn_tpu.ops.full_batch import (FullBatchGraph,
                                             RelationalFullBatch)
from cugraph_gnn_tpu.ops.gather import local_gather, local_scatter, local_scatter_add
from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
    SlabGraph,
    build_slab_graph,
    slab_spmm,
)
from cugraph_gnn_tpu.ops.reorder import ReorderedGraph, bandwidth_stats, reorder_csr
from cugraph_gnn_tpu.ops.sample import (
    SampleOutput,
    masked_uniform_sample,
    uniform_sample,
    weighted_sample,
)
from cugraph_gnn_tpu.ops.sddmm import (
    coo_edge_softmax,
    coo_sddmm,
    fanout_attention_softmax,
    fanout_sddmm,
)
from cugraph_gnn_tpu.ops.spmm import (
    EllBuckets,
    csr_spmm,
    ell_spmm,
    fanout_aggregate,
    segment_spmm,
)
from cugraph_gnn_tpu.ops.unique import AppendUniqueOutput, append_unique

__all__ = [
    "CSR",
    "DistFullBatchGraph",
    "FullBatchGraph",
    "RelationalFullBatch",
    "ReorderedGraph",
    "SlabGraph",
    "bandwidth_stats",
    "build_slab_graph",
    "reorder_csr",
    "slab_spmm",
    "EllBuckets",
    "ell_spmm",
    "SampleOutput",
    "AppendUniqueOutput",
    "append_unique",
    "coo_to_csr",
    "coo_to_csr_np",
    "csr_add_self_loop",
    "csr_spmm",
    "coo_sddmm",
    "coo_edge_softmax",
    "edge_mask_valid",
    "fanout_aggregate",
    "fanout_attention_softmax",
    "fanout_sddmm",
    "local_gather",
    "local_scatter",
    "local_scatter_add",
    "masked_uniform_sample",
    "segment_spmm",
    "uniform_sample",
    "weighted_sample",
]
