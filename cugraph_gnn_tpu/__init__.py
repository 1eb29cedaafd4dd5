"""cugraph_gnn_tpu — a TPU-native GNN data + compute framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
rapidsai/cugraph-gnn (cuGraph-PyG + WholeGraph):

- ``store``:    node-dim row-partitioned feature/embedding store over a
                ``jax.sharding.Mesh`` (WholeMemory equivalent,
                ref cpp/src/wholememory/memory_handle.cpp).
- ``ops``:      Pallas + XLA kernels: gather/scatter, SpMM, SDDMM, fused
                neighbor sampling, append-unique
                (ref cpp/src/wholememory_ops, cpp/src/wholegraph_ops).
- ``sampler``:  multi-hop homogeneous/heterogeneous/weighted/temporal
                neighbor sampling pipeline with static shapes
                (replaces the external pylibcugraph bulk samplers,
                ref cugraph_pyg/sampler/distributed_sampler.py).
- ``embedding``: trainable sharded embedding tables with sparse
                optimizers (ref cpp/src/wholememory/embedding.cpp).
- ``data``/``loader``: PyG-style GraphStore/FeatureStore and
                Node/Neighbor/Link loaders (ref cugraph_pyg/data, loader).
- ``models``:   flax model zoo (GraphSAGE/GCN/GAT/RGCN) — the reference
                delegates model math to PyG; here it is first-class.
"""

from cugraph_gnn_tpu.version import __version__

__all__ = ["__version__"]
