"""GraphStructure: WholeGraph-native graph container + multilayer sampling.

API-parity module for the reference's
python/pylibwholegraph/pylibwholegraph/torch/graph_structure.py:13-196:
a CSR graph (+ optional node/edge attributes) held in store tensors,
with one-hop samplers and ``multilayer_sample_without_replacement``.

The TPU version wraps :class:`~cugraph_gnn_tpu.sampler.NeighborSampler`
(static-shape fused pipeline) and keeps attributes in a FeatureStore.
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.ops import sample as sample_ops
from cugraph_gnn_tpu.sampler.neighbor_sampler import NeighborSampler
from cugraph_gnn_tpu.sampler.output import MultihopBatch


class GraphStructure:
    """CSR graph with attribute tensors (ref graph_structure.py)."""

    def __init__(self):
        self.indptr = None
        self.indices = None
        self.node_attrs: Dict[str, jax.Array] = {}
        self.edge_attrs: Dict[str, jax.Array] = {}
        self.num_nodes = 0
        self.num_edges = 0

    def set_csr_graph(self, indptr, indices):
        """ref graph_structure.py set_csr_graph."""
        self.indptr = jnp.asarray(indptr, jnp.int32)
        self.indices = jnp.asarray(indices, jnp.int32)
        self.num_nodes = int(self.indptr.shape[0]) - 1
        self.num_edges = int(self.indices.shape[0])

    def set_node_attribute(self, name: str, tensor):
        self.node_attrs[name] = jnp.asarray(tensor)

    def set_edge_attribute(self, name: str, tensor):
        self.edge_attrs[name] = jnp.asarray(tensor)

    # -- one-hop samplers (ref graph_structure.py:70-134) --------------------

    def unweighted_sample_without_replacement_one_hop(
            self, seeds, fanout: int, *, key=None):
        key = key if key is not None else jax.random.PRNGKey(0)
        return sample_ops.uniform_sample(
            key, self.indptr, self.indices, jnp.asarray(seeds, jnp.int32),
            fanout)

    def weighted_sample_without_replacement_one_hop(
            self, seeds, fanout: int, weight_name: str = "weight", *,
            key=None, max_degree: Optional[int] = None):
        key = key if key is not None else jax.random.PRNGKey(0)
        w = self.edge_attrs[weight_name]
        if max_degree is None:
            deg = np.asarray(self.indptr[1:] - self.indptr[:-1])
            max_degree = int(deg.max(initial=1))
        return sample_ops.weighted_sample(
            key, self.indptr, self.indices, w,
            jnp.asarray(seeds, jnp.int32), fanout, max_degree=max_degree)

    # -- multilayer (ref graph_structure.py:136-196) -------------------------

    def multilayer_sample_without_replacement(
            self, seeds, fanouts: Sequence[int], weight_name: Optional[str] = None,
            *, key=None, dedup: bool = True) -> MultihopBatch:
        key = key if key is not None else jax.random.PRNGKey(0)
        weights = self.edge_attrs.get(weight_name) if weight_name else None
        max_degree = None
        if weights is not None:
            deg = np.asarray(self.indptr[1:] - self.indptr[:-1])
            max_degree = int(deg.max(initial=1))
        sampler = NeighborSampler(
            self.indptr, self.indices, fanouts, weights=weights,
            max_degree=max_degree, dedup=dedup)
        return sampler.sample(key, jnp.asarray(seeds, jnp.int32))
