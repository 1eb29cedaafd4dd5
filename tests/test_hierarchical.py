"""Hierarchical (2-level mesh) gather tests — MT_HIERARCHY analog
(ref cpp/src/wholememory_ops/gather_op_impl_hierarchy.cu)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.parallel.mesh import create_hierarchical_mesh
from cugraph_gnn_tpu.store.hierarchical import HierarchicalDistArray


@pytest.fixture(scope="module")
def mesh2d():
    return create_hierarchical_mesh(2)  # 2 nodes x 4 devices


def test_hier_gather(mesh2d, rng):
    n, f, b = 128, 8, 64
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = HierarchicalDistArray.from_array(host, mesh2d)
    ids = rng.integers(0, n, b).astype(np.int32)
    out = np.asarray(arr.gather(jnp.asarray(ids)))
    np.testing.assert_allclose(out, host[ids], rtol=1e-6)


def test_hier_gather_with_duplicates_and_pads(mesh2d, rng):
    n, f = 64, 4
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = HierarchicalDistArray.from_array(host, mesh2d)
    ids = np.array([5, 5, -1, 63, 5, 0, -1, 17,
                    3, 3, 3, 3, -1, -1, 2, 1], np.int32)
    out = np.asarray(arr.gather(jnp.asarray(ids)))
    expect = np.where((ids >= 0)[:, None], host[np.clip(ids, 0, None)], 0)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_hier_gather_skewed(mesh2d, rng):
    # all ids on one (node, device) shard
    n, f, b = 64, 4, 32
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = HierarchicalDistArray.from_array(host, mesh2d)
    ids = rng.integers(0, 8, b).astype(np.int32)
    out = np.asarray(arr.gather(jnp.asarray(ids)))
    np.testing.assert_allclose(out, host[ids], rtol=1e-6)
