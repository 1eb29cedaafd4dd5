from cugraph_gnn_tpu.parallel.mesh import (
    STORE_AXIS,
    axis_size,
    create_hierarchical_mesh,
    create_store_mesh,
    replicated,
    row_sharding,
    split_mesh,
)

__all__ = [
    "STORE_AXIS",
    "axis_size",
    "create_hierarchical_mesh",
    "create_store_mesh",
    "replicated",
    "row_sharding",
    "split_mesh",
]
