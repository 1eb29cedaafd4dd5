"""Link prediction example — LinkNeighborLoader + dot-product decoder.

ref python/cugraph-pyg/cugraph_pyg/examples/mag_lp_mnmg.py (link
prediction with learned embeddings) and rgcn_link_class_mnmg.py.

Usage:
    python examples/link_prediction.py --dataset karate --epochs 20
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    from cugraph_gnn_tpu.utils.config import (
        add_model_options,
        add_sampler_options,
        add_training_options,
        make_parser,
        parse_fanouts,
    )
    p = make_parser(add_training_options, add_model_options,
                    add_sampler_options)
    p.add_argument("--dataset", default="karate")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader.link_loader import LinkNeighborLoader
    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.utils.datasets import load_karate, symmetrize
    from cugraph_gnn_tpu.utils.logging import get_logger, set_log_level

    set_log_level(args.log_level)
    log = get_logger()

    g = symmetrize(load_karate())
    gs = GraphStore()
    gs.put_edge_index((g.src, g.dst), ("N", "e", "N"),
                      num_nodes=(g.num_nodes, g.num_nodes))
    fs = FeatureStore()
    fs[("", "x")] = np.eye(g.num_nodes, dtype=np.float32)

    eli = np.stack([g.src, g.dst])
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=parse_fanouts(args.neighbors),
        edge_label_index=eli, neg_sampling="binary",
        batch_size=min(args.batch_size, 32), shuffle=True,
        reject_true_edges=True)

    model = GraphSAGE(hidden_features=args.hidden_dim, out_features=16,
                      num_layers=len(parse_fanouts(args.neighbors)))
    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, sample, eli, label, seeds):
        def loss_fn(p):
            emb = model.apply(p, x, sample)
            score = jnp.sum(emb[eli[0]] * emb[eli[1]], axis=-1)
            valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, label)
            return (jnp.sum(jnp.where(valid, ls, 0)) /
                    jnp.maximum(jnp.sum(valid), 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for epoch in range(args.epochs):
        tot, nb = 0.0, 0
        for b in loader:
            params, opt, loss = step(params, opt, b.x, b.sample,
                                     b.edge_label_index, b.edge_label,
                                     b.seeds)
            tot += float(loss)
            nb += 1
        if epoch % 5 == 0 or epoch == args.epochs - 1:
            log.info("epoch %d: loss %.4f", epoch, tot / nb)

    # rank-based AUC over one evaluation pass (positives vs sampled
    # negatives) — the example-level quality gate
    scores, labels = [], []
    for b in loader:
        emb = model.apply(params, b.x, b.sample)
        eli = np.asarray(b.edge_label_index)
        s = np.asarray(jnp.sum(emb[eli[0]] * emb[eli[1]], axis=-1))
        seeds = np.asarray(b.seeds)
        valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
        scores.append(s[valid])
        labels.append(np.asarray(b.edge_label)[valid])
    s = np.concatenate(scores)
    lab = np.concatenate(labels)
    order = np.argsort(s)
    rank = np.empty_like(order, dtype=np.float64)
    rank[order] = np.arange(1, len(s) + 1)
    n_pos, n_neg = int(lab.sum()), int((1 - lab).sum())
    auc = ((rank[lab > 0.5].sum() - n_pos * (n_pos + 1) / 2)
           / max(n_pos * n_neg, 1))
    print(f"link-pred AUC: {auc:.4f}", flush=True)


if __name__ == "__main__":
    main()
