"""bf16 feature/compute paths (the reference's half/bf16 dtype-conversion
gather, ref gather_scatter_func.cuh:150-197; TPU training standard)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.models import GraphSAGE
from cugraph_gnn_tpu.ops import coo_to_csr_np, local_gather
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.sampler import NeighborSampler
from cugraph_gnn_tpu.store.dist_array import DistArray


def test_gather_dtype_conversion(rng):
    """bf16 table -> f32 rows and vice versa (on-the-fly conversion)."""
    table = jnp.asarray(rng.standard_normal((32, 8)), jnp.bfloat16)
    ids = jnp.asarray([3, -1, 7], jnp.int32)
    out = local_gather(table, ids, out_dtype=jnp.float32)
    assert out.dtype == jnp.float32
    np.testing.assert_allclose(
        np.asarray(out[0]), np.asarray(table[3], np.float32))
    assert (np.asarray(out[1]) == 0).all()


def test_dist_array_bf16(rng):
    mesh = create_store_mesh(8)
    host = rng.standard_normal((64, 16)).astype(np.float32)
    arr = DistArray.from_array(host, mesh, dtype=jnp.bfloat16)
    assert arr.dtype == jnp.bfloat16
    ids = rng.integers(0, 64, 24).astype(np.int32)
    out = np.asarray(arr.gather(jnp.asarray(ids)), dtype=np.float32)
    np.testing.assert_allclose(out, host[ids], rtol=0.01, atol=0.01)


def test_bf16_training_step(karate):
    """GraphSAGE in bf16 activations / f32 params trains a step."""
    import optax
    n = karate.num_nodes
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, n, sort_by="src")
    sampler = NeighborSampler(indptr, indices, [4, 4])
    seeds = jnp.arange(8, dtype=jnp.int32)
    batch = sampler.sample(jax.random.PRNGKey(0), seeds)
    x = jax.random.normal(jax.random.PRNGKey(1),
                          (batch.input_nodes.shape[0], 16), jnp.bfloat16)
    model = GraphSAGE(hidden_features=16, out_features=2, num_layers=2,
                      dtype=jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(2), x, batch)
    # params stay f32 (flax dtype= affects computation dtype)
    leaf = jax.tree.leaves(params)[0]
    assert leaf.dtype == jnp.float32
    out = model.apply(params, x, batch)
    assert out.dtype == jnp.bfloat16

    y = jnp.zeros((8,), jnp.int32)
    def loss_fn(p):
        logits = model.apply(p, x, batch).astype(jnp.float32)
        return optax.softmax_cross_entropy_with_integer_labels(
            logits, y).mean()
    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    assert all(np.isfinite(np.asarray(g, np.float32)).all()
               for g in jax.tree.leaves(grads))
