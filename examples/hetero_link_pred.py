"""Heterogeneous link prediction (ogbn-mag author-writes-paper shape).

ref python/cugraph-pyg/cugraph_pyg/examples/mag_lp_mnmg.py:100-160 and
rgcn_link_class_mnmg.py — edge seeds of ONE typed relation, negatives
drawn inside the src/dst node types, RGCN encoder + dot-product decoder.

Usage:
    python examples/hetero_link_pred.py --epochs 5
(synthetic mag-like graph: papers/authors with cites/writes edges; the
training relation is ('author','writes','paper').)
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
    )
    p = make_parser(add_training_options, add_model_options,
                    add_sampler_options)
    p.add_argument("--num-papers", type=int, default=2000)
    p.add_argument("--num-authors", type=int, default=1000)
    p.add_argument("--num-writes", type=int, default=6000)
    p.add_argument("--disjoint", action="store_true",
                   help="independent per-seed subgraphs (PyG disjoint "
                        "mode; the decoder reads each seed's own row)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import LinkNeighborLoader
    from cugraph_gnn_tpu.models import RGCN

    rng = np.random.default_rng(0)
    n_p, n_a, n_w = args.num_papers, args.num_authors, args.num_writes
    et = ("author", "writes", "paper")

    gs = GraphStore()
    gs.put_edge_index(
        (rng.integers(0, n_p, 4 * n_p), rng.integers(0, n_p, 4 * n_p)),
        ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    w_src = rng.integers(0, n_a, n_w)
    w_dst = rng.integers(0, n_p, n_w)
    gs.put_edge_index((w_src, w_dst), et, num_nodes=(n_a, n_p))
    fs = FeatureStore()
    fs[("paper", "x")] = rng.standard_normal((n_p, 16)).astype(np.float32)
    fs[("author", "x")] = rng.standard_normal((n_a, 16)).astype(np.float32)

    fanouts = [int(f) for f in args.neighbors.split(",")]
    loader = LinkNeighborLoader(
        (fs, gs), num_neighbors=fanouts,
        edge_label_index=(et, np.stack([w_src, w_dst])),
        neg_sampling="binary", batch_size=args.batch_size, shuffle=True,
        disjoint=args.disjoint)

    g = gs.finalize()
    etype_names = ["__".join(e) for e in g.etypes]
    model = RGCN(num_relations=len(etype_names),
                 hidden_features=args.hidden_dim, out_features=args.hidden_dim,
                 num_layers=len(fanouts))

    def to_rel_batches(sample):
        return [[(hop[en].neigh_local, hop[en].mask) if en in hop else None
                 for en in etype_names]
                for hop in reversed(sample.hops)]

    def input_features(x_dict):
        total = None
        for x in x_dict.values():
            total = x if total is None else total + x
        return total

    b0 = next(iter(loader))
    x0, rb0 = input_features(b0.x), to_rel_batches(b0.sample)
    if args.disjoint:
        # init on one seed's subgraph (the same shapes vmap sees)
        x0 = x0[0]
        rb0 = jax.tree.map(lambda a: a[0], rb0)
    params = model.init(jax.random.PRNGKey(0), x0, rb0)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, rel_batches, eli, lab, seeds):
        def loss_fn(p):
            if args.disjoint:
                # per-seed subgraphs: vmap the encoder over the seed
                # axis; each seed's embedding is row 0 of its own
                # namespace (no leakage between seeds)
                h = jax.vmap(model.apply, in_axes=(None, 0, 0))(
                    p, x, rel_batches)[:, 0]
            else:
                h = model.apply(p, x, rel_batches)
            score = jnp.sum(h[eli[0]] * h[eli[1]], axis=-1)
            valid = (seeds[eli[0]] >= 0) & (seeds[eli[1]] >= 0)
            ls = optax.sigmoid_binary_cross_entropy(score, lab)
            loss = jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
            acc = jnp.sum(jnp.where(
                valid, ((score > 0) == (lab > 0.5)).astype(jnp.float32),
                0)) / jnp.maximum(jnp.sum(valid), 1)
            return loss, acc
        (loss, acc), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss, acc

    for epoch in range(args.epochs):
        tot = n = 0.0
        acc = 0.0
        for batch in loader:
            params, opt, loss, acc = step(
                params, opt, input_features(batch.x),
                to_rel_batches(batch.sample), batch.edge_label_index,
                batch.edge_label, batch.seeds)
            tot += float(loss)
            n += 1
        print(f"epoch {epoch}: loss {tot / max(n, 1):.4f} "
              f"acc {float(acc):.3f}")


if __name__ == "__main__":
    main()
