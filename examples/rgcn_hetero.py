"""Heterogeneous R-GCN node classification (ogbn-mag shape).

ref python/cugraph-pyg/cugraph_pyg/examples/rgcn_link_class_mnmg.py and
taobao_mnmg.py (hetero SAGE) — BASELINE.json config 4: per-edge-type
fanout sampling feeding a relational GCN.

Usage:
    python examples/rgcn_hetero.py --epochs 10
(synthetic mag-like graph: papers/authors/institutions with
cites/writes/affiliated edge types.)
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
    p.add_argument("--num-insts", type=int, default=100)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader
    from cugraph_gnn_tpu.models import RGCN
    from cugraph_gnn_tpu.utils.logging import get_logger, set_log_level

    set_log_level(args.log_level)
    log = get_logger()
    rng = np.random.default_rng(0)
    n_p, n_a, n_i = args.num_papers, args.num_authors, args.num_insts

    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n_p, n_p * 5),
                       rng.integers(0, n_p, n_p * 5)),
                      ("paper", "cites", "paper"), num_nodes=(n_p, n_p))
    gs.put_edge_index((rng.integers(0, n_a, n_p * 3),
                       rng.integers(0, n_p, n_p * 3)),
                      ("author", "writes", "paper"), num_nodes=(n_a, n_p))
    gs.put_edge_index((rng.integers(0, n_i, n_a),
                       rng.integers(0, n_a, n_a)),
                      ("institution", "affiliated", "author"),
                      num_nodes=(n_i, n_a))
    fdim, n_classes = 32, 8
    fs = FeatureStore()
    for nt, n in (("paper", n_p), ("author", n_a), ("institution", n_i)):
        fs[(nt, "x")] = rng.standard_normal((n, fdim)).astype(np.float32)
    fs[("paper", "y")] = rng.integers(0, n_classes, n_p).astype(np.int32)

    loader = NeighborLoader((fs, gs), num_neighbors=[4, 4],
                            input_nodes=("paper", np.arange(n_p)),
                            batch_size=min(args.batch_size, 128),
                            shuffle=True)
    g = gs.finalize()
    etype_names = ["__".join(et) for et in g.etypes]
    model = RGCN(num_relations=len(etype_names),
                 hidden_features=args.hidden_dim // 4,
                 out_features=n_classes, num_layers=2)

    def to_rel_batches(sample):
        out = []
        for hop in reversed(sample.hops):
            out.append([
                (hop[en].neigh_local, hop[en].mask) if en in hop else None
                for en in etype_names])
        return out

    def input_features(x_dict):
        total = None
        for x in x_dict.values():
            total = x if total is None else total + x
        return total

    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), input_features(b0.x),
                        to_rel_batches(b0.sample))
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, rel_batches, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, rel_batches)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (jnp.sum(jnp.where(valid, ls, 0))
                    / jnp.maximum(jnp.sum(valid), 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for epoch in range(args.epochs):
        tot = nb = 0
        for b in loader:
            params, opt, loss = step(params, opt, input_features(b.x),
                                     to_rel_batches(b.sample), b.y, b.seeds)
            tot += float(loss)
            nb += 1
        log.info("epoch %d: loss %.4f", epoch, tot / nb)


if __name__ == "__main__":
    main()
