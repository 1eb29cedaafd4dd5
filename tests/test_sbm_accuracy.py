"""Train-to-accuracy on a planted-partition (SBM) graph through the
real NeighborLoader path (VERDICT r2 #5b).

The community signal lives ONLY in the graph structure: features are
one-hot node ids, so an MLP memorizes train nodes and collapses to its
bias on test nodes (their one-hot dimensions were never trained) —
the control below must stay near chance.  The sampled GraphSAGE must
recover the partition from neighborhoods (>= 90% test accuracy).
"""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from cugraph_gnn_tpu.data import FeatureStore, GraphStore
from cugraph_gnn_tpu.loader import NeighborLoader
from cugraph_gnn_tpu.models import GraphSAGE

N_BLOCKS = 4
N = 320
P_IN, P_OUT = 0.16, 0.01


@pytest.fixture(scope="module")
def sbm():
    rng = np.random.default_rng(0)
    y = np.repeat(np.arange(N_BLOCKS), N // N_BLOCKS).astype(np.int32)
    rng.shuffle(y)
    # planted partition, symmetrized
    block = y[:, None] == y[None, :]
    p = np.where(block, P_IN, P_OUT)
    upper = np.triu(rng.random((N, N)) < p, k=1)
    s, d = np.nonzero(upper)
    src = np.concatenate([s, d])
    dst = np.concatenate([d, s])
    x = np.eye(N, dtype=np.float32)
    train = rng.random(N) < 0.6
    return src, dst, x, y, train


def _loader(sbm, input_nodes, shuffle, seed=0):
    src, dst, x, y, _ = sbm
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(N, N))
    fs = FeatureStore()
    fs[("", "x")] = x
    fs[("", "y")] = y
    return NeighborLoader((fs, gs), num_neighbors=[10, 10],
                          batch_size=160, shuffle=shuffle,
                          input_nodes=input_nodes, seed=seed)


def _train(model, loader, steps_fn, epochs):
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, sample, yb, seeds):
        def loss_fn(p):
            logits = steps_fn(model, p, xb, sample)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(yb, 0))
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for _ in range(epochs):
        for b in loader:
            params, opt, _ = step(params, opt, b.x, b.sample, b.y, b.seeds)
    return params


def _accuracy(model, params, loader, steps_fn, y, mask):
    hits = total = 0
    for b in loader:
        logits = steps_fn(model, params, b.x, b.sample)
        seeds = np.asarray(b.seeds)
        valid = seeds >= 0
        pred = np.asarray(logits).argmax(1)[: len(seeds)][valid]
        sel = seeds[valid]
        keep = mask[sel]
        hits += int((pred[keep] == y[sel][keep]).sum())
        total += int(keep.sum())
    return hits / max(total, 1)


def test_sbm_sage_beats_structure_blind_mlp(sbm):
    src, dst, x, y, train = sbm
    train_ids = np.flatnonzero(train)

    sage = GraphSAGE(hidden_features=64, out_features=N_BLOCKS,
                     num_layers=2)
    sage_apply = lambda m, p, xb, sample: m.apply(p, xb, sample)
    params = _train(sage, _loader(sbm, train_ids, True), sage_apply,
                    epochs=30)
    test_loader = _loader(sbm, np.arange(N), False)
    acc = _accuracy(sage, params, test_loader, sage_apply, y, ~train)
    assert acc >= 0.9, f"GraphSAGE test accuracy {acc:.3f} < 0.9"

    # control: same budget MLP on the features alone — one-hot ids give
    # it nothing to generalize from (near chance = 1/N_BLOCKS)
    import flax.linen as nn

    class MLP(nn.Module):
        @nn.compact
        def __call__(self, xb):
            h = nn.relu(nn.Dense(64)(xb))
            return nn.Dense(N_BLOCKS)(h)

    mlp = MLP()
    mparams = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, N)))
    tx = optax.adam(1e-2)
    opt = tx.init(mparams)

    @jax.jit
    def mstep(params, opt, xb, yb):
        def loss_fn(p):
            return optax.softmax_cross_entropy_with_integer_labels(
                mlp.apply(p, xb), yb).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    xt = jnp.asarray(x[train_ids])
    yt = jnp.asarray(y[train_ids])
    for _ in range(300):
        mparams, opt, _ = mstep(mparams, opt, xt, yt)
    pred = np.asarray(mlp.apply(mparams, jnp.asarray(x[~train]))).argmax(1)
    mlp_acc = float((pred == y[~train]).mean())
    assert mlp_acc < 0.5, f"control MLP unexpectedly learned: {mlp_acc:.3f}"
    assert acc > mlp_acc + 0.35
