"""End-to-end training on karate.csv — BASELINE.json config 1:
2-layer GraphSAGE (mean agg), full-batch, CPU-runnable; plus a sampled
minibatch variant exercising the whole sampler->gather->model->grad loop.
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cugraph_gnn_tpu.models import GCN, GraphSAGE
from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.sampler import NeighborSampler

# Zachary karate club factions (standard labels; 0 = Mr. Hi, 1 = Officer).
MR_HI = {0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 16, 17, 19, 21}


def karate_labels(n=34):
    return np.array([0 if i in MR_HI else 1 for i in range(n)], np.int32)


def test_full_batch_graphsage_trains(karate):
    n = karate.num_nodes
    y = jnp.asarray(karate_labels(n))
    x = jnp.eye(n, dtype=jnp.float32)  # one-hot features
    src = jnp.asarray(karate.src)
    dst = jnp.asarray(karate.dst)

    model = GraphSAGE(hidden_features=16, out_features=2, num_layers=2)
    fwd = lambda m, x: m.full(x, src, dst, n)
    params = model.init(jax.random.PRNGKey(0), x, method=fwd)

    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state):
        def loss_fn(p):
            logits = model.apply(p, x, method=fwd)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    losses = []
    for _ in range(60):
        params, opt_state, loss = step(params, opt_state)
        losses.append(float(loss))
    logits = model.apply(params, x, method=fwd)
    acc = (jnp.argmax(logits, -1) == y).mean()
    assert losses[-1] < losses[0] * 0.2, losses[::10]
    assert acc > 0.9, float(acc)


def test_minibatch_graphsage_trains(karate):
    n = karate.num_nodes
    y = np.asarray(karate_labels(n))
    feat = np.eye(n, dtype=np.float32)
    (indptr, indices), _ = coo_to_csr_np(
        karate.dst, karate.src, n, sort_by="src")
    sampler = NeighborSampler(indptr, indices, [5, 5])

    batch_size = 16
    seeds0 = jnp.arange(batch_size, dtype=jnp.int32)
    batch0 = sampler.sample(jax.random.PRNGKey(0), seeds0)
    x_all = jnp.asarray(feat)

    model = GraphSAGE(hidden_features=16, out_features=2, num_layers=2)

    def gather_x(batch):
        inp = batch.input_nodes
        return jnp.where((inp >= 0)[:, None], x_all[jnp.clip(inp, 0)], 0)

    params = model.init(jax.random.PRNGKey(1), gather_x(batch0), batch0)
    tx = optax.adam(1e-2)
    opt_state = tx.init(params)

    @jax.jit
    def step(params, opt_state, batch, labels):
        def loss_fn(p):
            logits = model.apply(p, gather_x(batch), batch)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state, loss

    rng = np.random.default_rng(0)
    losses = []
    key = jax.random.PRNGKey(2)
    for it in range(30):
        seeds = rng.permutation(n)[:batch_size].astype(np.int32)
        key, sk = jax.random.split(key)
        batch = sampler.sample(sk, jnp.asarray(seeds))
        params, opt_state, loss = step(
            params, opt_state, batch, jnp.asarray(y[seeds]))
        losses.append(float(loss))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]) * 0.5, losses
