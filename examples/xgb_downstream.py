"""Gradient-boosted trees over exported GNN embeddings.

TPU-native analog of ref cugraph_pyg/examples/xgb.py: load
previously-generated node embeddings (such as those exported by
fraud_detection.py or a link-prediction encoder) plus labels, random
80/20 split, and fit a histogram gradient-boosted tree classifier
(the reference uses XGBoost ``tree_method="hist"`` over Dask/cuDF
partitions; sklearn's HistGradientBoostingClassifier is the same
histogram algorithm, and the data layer is plain NumPy — there is no
Dask tier to replace on a single host).

Run with --data_dir pointing at x.npy (N, F) and y.npy (N,) to consume
a real export; without it, a small GraphSAGE encoder is trained on a
synthetic graph and its all-node embedding export feeds the trees
(self-contained, mirroring how the reference example assumes
mag_lp_mnmg.py ran first).
"""

import argparse
import os

import numpy as np


def make_embeddings(args, train_mask):
    """Train a small encoder and export [raw features | embedding] for
    every node — the minimal version of fraud_detection.py's sweep.

    The encoder's supervised loss only sees nodes in ``train_mask`` —
    the downstream tree split reuses the same mask, so no test-node
    label ever leaks into the exported embedding columns."""
    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader
    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.utils.datasets import random_graph, symmetrize

    rng = np.random.default_rng(0)
    n, f, classes = args.num_nodes, 16, args.num_classes
    g = symmetrize(random_graph(n, n * 8, power_law=True))
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, classes, size=n).astype(np.int32)
    x[:, 0] += 0.8 * y  # planted signal so the trees have a target

    gs = GraphStore()
    gs.put_edge_index((g.src, g.dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = x
    fs[("", "y")] = y

    model = GraphSAGE(hidden_features=args.hidden_dim,
                      out_features=classes, num_layers=2)
    loader = NeighborLoader((fs, gs), num_neighbors=[4, 4],
                            batch_size=min(256, n), shuffle=True)
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    train_mask_dev = jnp.asarray(train_mask)

    @jax.jit
    def step(params, opt, xb, sample, yb, seeds):
        def loss_fn(p):
            logits = model.apply(p, xb, sample)
            valid = (seeds >= 0) & train_mask_dev[jnp.maximum(seeds, 0)]
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for _ in range(args.epochs):
        for batch in loader:
            params, opt, _ = step(params, opt, batch.x, batch.sample,
                                  batch.y, batch.seeds)

    # all-node sweep: export logits as the embedding columns
    apply = jax.jit(model.apply)
    emb = np.zeros((n, classes), np.float32)
    sweep = NeighborLoader((fs, gs), num_neighbors=[4, 4],
                           batch_size=min(256, n), shuffle=False)
    for batch in sweep:
        z = np.asarray(apply(params, batch.x, batch.sample))
        seeds = np.asarray(batch.seeds)
        valid = seeds >= 0
        emb[seeds[valid]] = z[: seeds.shape[0]][valid]
    return np.concatenate([x, emb], axis=1).astype(np.float32), y


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--data_dir", type=str, default=None,
                        help="directory with x.npy / y.npy embedding export")
    parser.add_argument("--num_boost_round", type=int, default=4)
    parser.add_argument("--max_depth", type=int, default=10)
    parser.add_argument("--eta", type=float, default=0.1)
    parser.add_argument("--epochs", type=int, default=2)
    parser.add_argument("--num_nodes", type=int, default=2000)
    parser.add_argument("--num_classes", type=int, default=4)
    parser.add_argument("--hidden_dim", type=int, default=32)
    args = parser.parse_args()

    # ref xgb.py:40-57 — random 80/20 split on a uniform column.  The
    # split is fixed up front so the self-contained path can train its
    # encoder on the train side only (no test-label leakage into the
    # exported embeddings).
    rng = np.random.default_rng(42)
    if args.data_dir:
        x = np.asarray(np.load(os.path.join(args.data_dir, "x.npy")),
                       np.float32)
        y = np.asarray(np.load(os.path.join(args.data_dir, "y.npy")),
                       np.int64)
        r = rng.random(len(y))
        train, test = r <= 0.8, r > 0.8
    else:
        r = rng.random(args.num_nodes)
        train, test = r <= 0.8, r > 0.8
        x, y = make_embeddings(args, train)
    print(f"embeddings: {x.shape}, classes: {len(np.unique(y))}", flush=True)

    # ref xgb.py:63-84 — hist trees, max_depth 10, eta 0.1,
    # multi:softmax objective with mlogloss eval.
    from sklearn.ensemble import HistGradientBoostingClassifier
    from sklearn.metrics import accuracy_score, log_loss

    clf = HistGradientBoostingClassifier(
        max_iter=args.num_boost_round, max_depth=args.max_depth,
        learning_rate=args.eta, random_state=0)
    print("Training hist-GBT model...", flush=True)
    clf.fit(x[train], y[train])
    labels = np.unique(y)
    for name, mask in (("train", train), ("test", test)):
        prob = clf.predict_proba(x[mask])
        print(f"{name}: mlogloss {log_loss(y[mask], prob, labels=labels):.4f}"
              f" acc {accuracy_score(y[mask], prob.argmax(1)):.4f}")


if __name__ == "__main__":
    main()
