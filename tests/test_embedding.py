"""DistEmbedding sparse-optimizer tests vs dense NumPy references
(ref cpp/tests/wholememory_ops/wholememory_embedding_gradient_apply_tests.cu
strategy: device sparse step must equal a host dense step on touched rows).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.embedding import DistEmbedding, dedup_ids_grads
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.store.dist_array import DistArray


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


def make_emb(mesh, rng, n=64, d=8, optimizer="sgd", hyper=None):
    host = rng.standard_normal((n, d)).astype(np.float32)
    table = DistArray.from_array(host.copy(), mesh)
    emb = DistEmbedding(table, optimizer=optimizer, hyper=hyper)
    return emb, host


def test_dedup_ids_grads():
    ids = jnp.asarray([3, 1, 3, -1, 1, 3], dtype=jnp.int32)
    grads = jnp.ones((6, 4), jnp.float32)
    uids, ugrads = dedup_ids_grads(ids, grads)
    u = np.asarray(uids)
    g = np.asarray(ugrads)
    assert u[0] == 1 and u[1] == 3
    np.testing.assert_allclose(g[0], 2.0)
    np.testing.assert_allclose(g[1], 3.0)
    assert (u[2:] == -1).all()
    np.testing.assert_allclose(g[2:], 0.0)


def test_embedding_gather(mesh, rng):
    emb, host = make_emb(mesh, rng)
    ids = rng.integers(0, 64, 32).astype(np.int32)
    out = np.asarray(emb.gather(jnp.asarray(ids)))
    np.testing.assert_allclose(out, host[ids], rtol=1e-6)


def test_sgd_step(mesh, rng):
    emb, host = make_emb(mesh, rng, optimizer="sgd")
    ids = rng.integers(0, 64, 40).astype(np.int32)  # duplicates likely
    grads = rng.standard_normal((40, 8)).astype(np.float32)
    emb.add_gradients(jnp.asarray(ids), jnp.asarray(grads))
    emb.apply_gradients(lr=0.1)
    expect = host.copy()
    # dedup: summed grads per unique id
    for uid in np.unique(ids):
        g = grads[ids == uid].sum(0)
        expect[uid] -= 0.1 * g
    np.testing.assert_allclose(emb.table.to_global(), expect, rtol=1e-4,
                               atol=1e-5)


def test_adagrad_step(mesh, rng):
    emb, host = make_emb(mesh, rng, optimizer="adagrad")
    ids = rng.choice(64, 16, replace=False).astype(np.int32)
    grads = rng.standard_normal((16, 8)).astype(np.float32)
    emb.add_gradients(jnp.asarray(ids), jnp.asarray(grads))
    emb.apply_gradients(lr=0.5)
    expect = host.copy()
    eps = 1e-8
    for i, uid in enumerate(ids):
        h = grads[i] ** 2
        expect[uid] -= 0.5 * grads[i] / (np.sqrt(h) + eps)
    np.testing.assert_allclose(emb.table.to_global(), expect, rtol=1e-4,
                               atol=1e-5)
    # untouched rows unchanged
    untouched = np.setdiff1d(np.arange(64), ids)
    np.testing.assert_array_equal(
        emb.table.to_global()[untouched], host[untouched])


def test_lazy_adam_two_steps(mesh, rng):
    emb, host = make_emb(mesh, rng, optimizer="lazy_adam")
    expect = host.copy().astype(np.float64)
    m = np.zeros_like(expect)
    v = np.zeros_like(expect)
    t = np.zeros((64, 1))
    b1, b2, eps, lr = 0.9, 0.999, 1e-8, 0.01
    for step in range(2):
        ids = rng.choice(64, 12, replace=False).astype(np.int32)
        grads = rng.standard_normal((12, 8)).astype(np.float32)
        emb.add_gradients(jnp.asarray(ids), jnp.asarray(grads))
        emb.apply_gradients(lr=lr)
        for i, uid in enumerate(ids):
            g = grads[i].astype(np.float64)
            t[uid] += 1
            m[uid] = b1 * m[uid] + (1 - b1) * g
            v[uid] = b2 * v[uid] + (1 - b2) * g * g
            mh = m[uid] / (1 - b1 ** t[uid])
            vh = v[uid] / (1 - b2 ** t[uid])
            expect[uid] -= lr * mh / (np.sqrt(vh) + eps)
    np.testing.assert_allclose(emb.table.to_global(), expect, rtol=1e-3,
                               atol=1e-5)


def test_rmsprop_step(mesh, rng):
    emb, host = make_emb(mesh, rng, optimizer="rmsprop")
    ids = rng.choice(64, 8, replace=False).astype(np.int32)
    grads = rng.standard_normal((8, 8)).astype(np.float32)
    emb.add_gradients(jnp.asarray(ids), jnp.asarray(grads))
    emb.apply_gradients(lr=0.05)
    expect = host.copy()
    for i, uid in enumerate(ids):
        g = grads[i]
        vv = 0.01 * g * g
        expect[uid] -= 0.05 * g / (np.sqrt(vv) + 1e-8)
    np.testing.assert_allclose(emb.table.to_global(), expect, rtol=1e-3,
                               atol=1e-5)


def test_differentiable_lookup_parity(mesh):
    """jax.grad through the tap-lookup == the manual add_gradients path
    (ref EmbeddingLookupFn, torch/embedding.py:221-245): training purely
    via jax.grad + optimizer step yields bit-identical tables."""
    import optax

    n, dim, b = 64, 8, 16
    w = np.random.default_rng(3).standard_normal((n, dim)).astype(np.float32)
    target = np.random.default_rng(4).standard_normal(
        (b, dim)).astype(np.float32)
    ids_np = (np.arange(b) * 3) % n

    def build():
        from cugraph_gnn_tpu.embedding import DistEmbedding
        from cugraph_gnn_tpu.store.dist_array import DistArray
        return DistEmbedding(DistArray.from_array(w.copy(), mesh),
                             optimizer="sgd")

    ids = jnp.asarray(ids_np, jnp.int32)
    tj = jnp.asarray(target)

    # --- autograd path: loss -> jax.grad -> add_gradients -> step
    emb_a = build()
    lookup = emb_a.lookup_fn()

    @jax.jit
    def grad_step(table_data, tap, ids):
        def loss_fn(tap):
            rows = lookup(table_data, tap, ids)
            return jnp.sum((rows - tj) ** 2)
        return jax.grad(loss_fn)(tap)

    for _ in range(3):
        g = grad_step(emb_a.table.data, emb_a.make_tap(b), ids)
        emb_a.add_gradients(ids, g)
        emb_a.apply_gradients(lr=0.1)

    # --- manual path: hand-computed row gradients
    emb_m = build()
    for _ in range(3):
        rows = emb_m.gather(ids)
        g = 2.0 * (rows - tj)
        emb_m.add_gradients(ids, g)
        emb_m.apply_gradients(lr=0.1)

    np.testing.assert_array_equal(
        np.asarray(emb_a.table.data), np.asarray(emb_m.table.data))
    # and the loss actually went down
    final = float(jnp.sum((emb_a.gather(ids) - tj) ** 2))
    first = float(jnp.sum((jnp.asarray(w)[ids_np] - tj) ** 2))
    assert final < first


def test_differentiable_lookup_joint_model_grads(mesh):
    """Embedding tap + dense model params differentiate jointly in one
    jax.grad call; no dense table cotangent is materialised."""
    n, dim, b = 48, 4, 12
    w = np.random.default_rng(5).standard_normal((n, dim)).astype(np.float32)
    from cugraph_gnn_tpu.embedding import DistEmbedding
    from cugraph_gnn_tpu.store.dist_array import DistArray
    emb = DistEmbedding(DistArray.from_array(w, mesh), optimizer="sgd")
    lookup = emb.lookup_fn()
    ids = jnp.asarray(np.arange(b), jnp.int32)
    proj = jnp.ones((dim,), jnp.float32)

    @jax.jit
    def grads(table_data, params, ids):
        def loss_fn(params):
            rows = lookup(table_data, params["tap"], ids)
            return jnp.sum((rows @ params["proj"]) ** 2)
        return jax.grad(loss_fn)(params)

    g = grads(emb.table.data, {"tap": emb.make_tap(b), "proj": proj}, ids)
    rows = np.asarray(emb.gather(ids))
    pred = rows @ np.ones((dim,))
    np.testing.assert_allclose(
        np.asarray(g["tap"]), 2 * pred[:, None] * np.ones((1, dim)),
        rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(g["proj"]), 2 * (pred[:, None] * rows).sum(0), rtol=1e-4)
