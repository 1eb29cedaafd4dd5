"""Orbax checkpoint adapter: DistArray / DistEmbedding round-trips with
shardings, world-size mismatch rejection."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cugraph_gnn_tpu.embedding import DistEmbedding
from cugraph_gnn_tpu.parallel import STORE_AXIS
from cugraph_gnn_tpu.store.dist_array import DistArray
from cugraph_gnn_tpu.utils import orbax_ckpt


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), (STORE_AXIS,))


def test_dist_array_roundtrip(mesh, tmp_path, rng):
    host = rng.standard_normal((101, 6)).astype(np.float32)
    arr = DistArray.from_array(host, mesh)
    orbax_ckpt.save_dist_array(str(tmp_path / "arr"), arr)
    back = orbax_ckpt.restore_dist_array(str(tmp_path / "arr"), mesh)
    np.testing.assert_allclose(back.to_global(), host)
    assert back.book.counts.tolist() == arr.book.counts.tolist()
    # restored array keeps the row sharding
    assert back.data.sharding.spec == arr.data.sharding.spec
    # gather works on the restored store
    ids = jnp.asarray(np.arange(16) * 6 % 101, jnp.int32)
    np.testing.assert_allclose(np.asarray(back.gather(ids)),
                               host[np.asarray(ids)], rtol=1e-6)


def test_world_size_mismatch_rejected(mesh, tmp_path, rng):
    arr = DistArray.from_array(
        rng.standard_normal((40, 4)).astype(np.float32), mesh)
    orbax_ckpt.save_dist_array(str(tmp_path / "arr8"), arr)
    mesh4 = Mesh(np.array(jax.devices()[:4]), (STORE_AXIS,))
    with pytest.raises(ValueError, match="world_size"):
        orbax_ckpt.restore_dist_array(str(tmp_path / "arr8"), mesh4)


def test_embedding_roundtrip_with_optimizer_state(mesh, tmp_path):
    emb = DistEmbedding.create(60, 8, mesh, optimizer="lazy_adam")
    ids = jnp.asarray(np.arange(12) * 5 % 60, jnp.int32)
    grads = jnp.ones((12, 8), jnp.float32) * 0.3
    emb.add_gradients(ids, grads)
    emb.apply_gradients(lr=0.05)
    orbax_ckpt.save_embedding(str(tmp_path / "emb"), emb)
    back = orbax_ckpt.restore_embedding(str(tmp_path / "emb"), mesh)
    np.testing.assert_allclose(np.asarray(back.table.data),
                               np.asarray(emb.table.data))
    assert sorted(back._state) == sorted(emb._state)
    for k in emb._state:
        np.testing.assert_allclose(np.asarray(back._state[k]),
                                   np.asarray(emb._state[k]))
    # continued training is bit-identical from the restored state
    for e in (emb, back):
        e.add_gradients(ids, grads)
        e.apply_gradients(lr=0.05)
    np.testing.assert_allclose(np.asarray(back.table.data),
                               np.asarray(emb.table.data))
