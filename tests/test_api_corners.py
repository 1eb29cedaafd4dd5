"""API-corner coverage: store mutation, embedding factory, init helper."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.embedding import DistEmbedding
from cugraph_gnn_tpu.parallel.mesh import create_hierarchical_mesh, create_store_mesh
from cugraph_gnn_tpu.store.hierarchical import HierarchicalDistArray


def test_graph_store_remove_and_refinalize(karate):
    gs = GraphStore()
    gs.put_edge_index((karate.src, karate.dst), ("N", "e", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    g1 = gs.finalize()
    assert g1 is gs.finalize()  # cached
    gs.put_edge_index((karate.src[:10], karate.dst[:10]), ("N", "e2", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    g2 = gs.finalize()          # invalidated by the put
    assert g2 is not g1
    assert len(g2.etypes) == 2
    gs.remove_edge_index(("N", "e2", "N"))
    g3 = gs.finalize()
    assert len(g3.etypes) == 1
    assert set(gs.get_all_edge_attrs()) == {("N", "e", "N")}


def test_feature_store_remove(rng):
    fs = FeatureStore()
    fs[("", "x")] = rng.standard_normal((10, 4)).astype(np.float32)
    assert ("", "x") in fs
    fs.remove_tensor("", "x")
    assert ("", "x") not in fs
    with pytest.raises(KeyError):
        fs.get_tensor("", "x")


def test_dist_embedding_create_factory():
    mesh = create_store_mesh(8)
    emb = DistEmbedding.create(96, 16, mesh, optimizer="sgd", seed=1)
    assert emb.table.shape == (96, 16)
    rows = np.asarray(emb.gather(jnp.asarray([0, 95, -1], jnp.int32)))
    assert rows.shape == (3, 16)
    assert (rows[2] == 0).all()
    assert np.isfinite(rows[:2]).all() and (rows[:2] != 0).any()
    # one training step through the factory-created table
    emb.add_gradients(jnp.asarray([3, 7], jnp.int32),
                      jnp.ones((2, 16), jnp.float32))
    emb.apply_gradients(lr=0.5)


def test_hierarchical_mesh_4x2(rng):
    mesh = create_hierarchical_mesh(4)  # 4 nodes x 2 devices
    assert mesh.shape == {"node": 4, "device": 2}
    host = rng.standard_normal((64, 8)).astype(np.float32)
    arr = HierarchicalDistArray.from_array(host, mesh)
    ids = rng.integers(0, 64, 16).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(arr.gather(jnp.asarray(ids))), host[ids], rtol=1e-6)


def test_distributed_init_single_process():
    from cugraph_gnn_tpu.utils import distributed
    distributed.init(log_level="warn")  # no coordinator -> single process
    rank, world, _, local = distributed.world_info()
    assert rank == 0 and world == 1 and local >= 1
    mesh = distributed.get_global_mesh()
    assert mesh.shape["store"] == jax.device_count()
