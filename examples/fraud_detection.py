"""Fraud detection: GNN embeddings + downstream random forest.

TPU-native analog of the reference's fraud workload
(ref python/cugraph-pyg/cugraph_pyg/examples/fraud/bitcoin_mnmg.py —
train a GNN encoder on transaction-fraud labels, run loader inference
over every node to export [embedding | raw features | gnn score], and
ref fraud/bitcoin_rf.py — fit a RandomForest on the exported
embeddings and compare "RF with GNN" / "GNN only" / "RF only" by
confusion matrix, accuracy, and ROC AUC).

The EllipticBitcoin dataset needs network access, so this script
generates an elliptic-shaped synthetic: a power-law transaction graph
whose fraud labels are planted on a feature direction PLUS a
neighborhood signal only the GNN can see (a node is fraud-prone when
its neighbors are), so the "RF with GNN" column should beat "RF only".
The downstream forest is sklearn's RandomForestClassifier (the
reference uses cuml's); if sklearn is absent we fall back to a
logistic probe on the same design matrix.

Usage:
    python examples/fraud_detection.py --num-nodes 4000 --epochs 4
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def show_confusion_matrix(y_test, prob, name):
    """ref fraud/bitcoin_rf.py:24-28."""
    pred = prob.argmax(axis=1)
    cm = np.zeros((2, 2), np.int64)
    np.add.at(cm, (y_test.astype(np.int64), pred.astype(np.int64)), 1)
    acc = float((y_test == pred).mean())
    # rank-based AUC (no sklearn dependency for the metric itself)
    s = prob[:, 1]
    order = np.argsort(s, kind="stable")
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(s) + 1)
    pos = y_test == 1
    n_pos, n_neg = int(pos.sum()), int((~pos).sum())
    auc = ((ranks[pos].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg)
           if n_pos and n_neg else float("nan"))
    print(f"=== {name} ===\nConfusion Matrix:\n{cm}\n"
          f"Accuracy: {acc:.4f}\nROC AUC: {auc:.4f}\n")
    return acc, auc


def train_forest(X_train, y_train):
    """ref fraud/bitcoin_rf.py:18-21 (cuml RF -> sklearn RF here)."""
    try:
        from sklearn.ensemble import RandomForestClassifier
        rf = RandomForestClassifier(n_estimators=60, random_state=0)
    except ImportError:
        from sklearn.linear_model import LogisticRegression  # noqa: F401
        rf = None
    if rf is None:
        from sklearn.linear_model import LogisticRegression
        rf = LogisticRegression(max_iter=200)
    rf.fit(X_train, y_train)
    return rf


def main():
    from cugraph_gnn_tpu.utils.config import (
        add_model_options, add_sampler_options, add_training_options,
        make_parser, parse_fanouts)
    p = make_parser(add_training_options, add_model_options,
                    add_sampler_options)
    p.add_argument("--num-nodes", type=int, default=4000)
    p.add_argument("--avg-degree", type=int, default=10)
    p.add_argument("--feat-dim", type=int, default=32)
    p.add_argument("--fraud-frac", type=float, default=0.15)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader
    from cugraph_gnn_tpu.models.builder import create_gnn_model
    from cugraph_gnn_tpu.utils.datasets import random_graph, symmetrize

    rng = np.random.default_rng(7)
    n = args.num_nodes
    g = symmetrize(random_graph(n, n * args.avg_degree, power_law=True))

    # Planted structure: fraud rings — seeds are fraud-prone, and fraud
    # probability rises with the fraction of fraud-prone neighbors, so
    # the label signal is partly *relational* (invisible to RF-only).
    prone = rng.random(n) < args.fraud_frac
    neigh_frac = np.zeros(n)
    deg = np.bincount(g.dst, minlength=n).clip(1)
    np.add.at(neigh_frac, g.dst, prone[g.src].astype(np.float64))
    neigh_frac /= deg
    raw = 0.25 * prone + 0.75 * neigh_frac + 0.05 * rng.standard_normal(n)
    y = (raw > np.quantile(raw, 1.0 - args.fraud_frac)).astype(np.int32)
    x = rng.standard_normal((n, args.feat_dim)).astype(np.float32)
    x[:, 0] += 1.5 * prone  # direct feature carries prone-ness, not the label

    train_mask = rng.random(n) < 0.7
    test_mask = ~train_mask

    gs = GraphStore()
    gs.put_edge_index((g.src, g.dst), ("N", "e", "N"),
                      num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = x
    fs[("", "y")] = y

    fanouts = parse_fanouts(args.neighbors)
    loader = NeighborLoader(
        (fs, gs), num_neighbors=fanouts,
        batch_size=min(args.batch_size, n), shuffle=True,
        input_nodes=np.nonzero(train_mask)[0].astype(np.int64))

    # Encoder: hidden -> 2-logit head, embeddings read before the head
    # (ref bitcoin_mnmg.py:204-262 exports encoder output + lin score).
    enc = create_gnn_model(args.model, class_count=args.hidden_dim,
                           hidden_feat_dim=args.hidden_dim,
                           num_layers=len(fanouts), num_heads=args.heads)
    import flax.linen as nn

    class Encoder(nn.Module):
        enc: nn.Module

        @nn.compact
        def __call__(self, xb, sample):
            z = nn.relu(self.enc(xb, sample))
            return z, nn.Dense(2, name="lin")(z)

    model = Encoder(enc)
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, xb, sample, yb, seeds):
        def loss_fn(pp):
            _, logits = model.apply(pp, xb, sample)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, yb)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for ep in range(args.epochs):
        tot, nb = 0.0, 0
        for batch in loader:
            params, opt, loss = step(params, opt, batch.x, batch.sample,
                                     batch.y, batch.seeds)
            tot += float(loss); nb += 1
        print(f"epoch {ep}: loss {tot / max(nb, 1):.4f}")

    # Inference sweep over ALL nodes -> per-node embedding + gnn score
    # (ref bitcoin_mnmg.py:204-262 embedding export loop).
    @jax.jit
    def embed(params, xb, sample):
        z, logits = model.apply(params, xb, sample)
        return z, jax.nn.softmax(logits, axis=-1)[:, 1]

    all_loader = NeighborLoader(
        (fs, gs), num_neighbors=fanouts,
        batch_size=min(args.batch_size, n), shuffle=False)
    emb = np.zeros((n, args.hidden_dim), np.float32)
    score = np.zeros(n, np.float32)
    for batch in all_loader:
        z, s = embed(params, batch.x, batch.sample)
        seeds = np.asarray(batch.seeds)
        valid = seeds >= 0
        bs = seeds.shape[0]
        emb[seeds[valid]] = np.asarray(z)[:bs][valid]
        score[seeds[valid]] = np.asarray(s)[:bs][valid]

    # Downstream classifiers (ref fraud/bitcoin_rf.py:31-69).
    X = np.concatenate([x, emb], axis=1)
    rf_gnn = train_forest(X[train_mask], y[train_mask])
    acc_gnn, auc_gnn = show_confusion_matrix(
        y[test_mask], rf_gnn.predict_proba(X[test_mask]), "RF with GNN")
    zz = np.stack([1 - score[test_mask], score[test_mask]], axis=1)
    show_confusion_matrix(y[test_mask], zz, "GNN Only")
    rf_only = train_forest(x[train_mask], y[train_mask])
    acc_rf, auc_rf = show_confusion_matrix(
        y[test_mask], rf_only.predict_proba(x[test_mask]), "RF Only")
    print(f"gnn-embedding lift: acc {acc_gnn - acc_rf:+.4f} "
          f"auc {auc_gnn - auc_rf:+.4f}")


if __name__ == "__main__":
    main()
