"""DistMatrix: COO edge matrix stored as two row-partitioned arrays.

ref python/cugraph-pyg/cugraph_pyg/tensor/dist_matrix.py:12-163 — the
edge list as two DistTensors (col, row) partitioned along the edge dim,
with ``local_col/local_row/local_coo`` computed by even-partition slice.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.store.dist_array import DistArray
from cugraph_gnn_tpu.store.partition import PartitionBook


class DistMatrix:
    """Edge-dim partitioned COO matrix (src, dst [, optional edge
    attributes])."""

    def __init__(self, src: DistArray, dst: DistArray):
        assert src.book.total == dst.book.total
        self.src = src
        self.dst = dst

    @staticmethod
    def from_coo(src, dst, mesh: Mesh, axis: str = STORE_AXIS) -> "DistMatrix":
        src = np.asarray(src).reshape(-1, 1)
        dst = np.asarray(dst).reshape(-1, 1)
        return DistMatrix(
            DistArray.from_array(src, mesh, axis),
            DistArray.from_array(dst, mesh, axis))

    @property
    def num_edges(self) -> int:
        return self.src.book.total

    @property
    def book(self) -> PartitionBook:
        return self.src.book

    def local_src(self, rank: int):
        """Edges owned by ``rank`` (ref dist_matrix.py:120-154)."""
        return self.src.local_shard(rank)[:, 0]

    def local_dst(self, rank: int):
        return self.dst.local_shard(rank)[:, 0]

    def local_coo(self, rank: int):
        return self.local_src(rank), self.local_dst(rank)

    def gather_edges(self, edge_ids):
        """(src, dst) rows for global edge ids (cross-shard gather)."""
        s = self.src.gather(jnp.asarray(edge_ids))[:, 0]
        d = self.dst.gather(jnp.asarray(edge_ids))[:, 0]
        return s, d

    def to_global(self):
        return self.src.to_global()[:, 0], self.dst.to_global()[:, 0]
