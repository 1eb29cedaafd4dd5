"""Node classification example — sampled minibatch GraphSAGE/GCN/GAT.

TPU-native analog of the reference's canonical training loops
(ref python/cugraph-pyg/cugraph_pyg/examples/gcn_dist_mnmg.py:161-341 and
python/pylibwholegraph/examples/node_classfication.py): build stores,
make a NeighborLoader, run epochs, report accuracy + timing.

Usage:
    python examples/node_classification.py --dataset karate --model sage
    python examples/node_classification.py --dataset synthetic \
        --num-nodes 100000 --num-edges 2000000 --model gat
"""

import sys
import time

sys.path.insert(0, ".")

import numpy as np


def main():
    from cugraph_gnn_tpu.utils.config import (
        add_graph_options,
        add_model_options,
        add_sampler_options,
        add_training_options,
        make_parser,
        parse_fanouts,
    )
    p = make_parser(add_training_options, add_graph_options,
                    add_model_options, add_sampler_options)
    p.add_argument("--num-nodes", type=int, default=10000)
    p.add_argument("--num-edges", type=int, default=100000)
    p.add_argument("--num-classes", type=int, default=8)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader
    from cugraph_gnn_tpu.utils.datasets import load_karate, random_graph, symmetrize
    from cugraph_gnn_tpu.utils.logging import get_logger, set_log_level

    set_log_level(args.log_level)
    log = get_logger()

    rng = np.random.default_rng(0)
    if args.dataset == "karate":
        g = symmetrize(load_karate())
        feat_dim = g.num_nodes
        x = np.eye(g.num_nodes, dtype=np.float32)
        num_classes = 2
        mr_hi = {0, 1, 2, 3, 4, 5, 6, 7, 8, 10, 11, 12, 13, 16, 17, 19, 21}
        y = np.array([0 if i in mr_hi else 1 for i in range(g.num_nodes)],
                     np.int32)
    else:
        g = random_graph(args.num_nodes, args.num_edges, power_law=True)
        feat_dim = args.feat_dim
        x = rng.standard_normal((g.num_nodes, feat_dim)).astype(np.float32)
        y = rng.integers(0, args.num_classes, g.num_nodes).astype(np.int32)
        num_classes = args.num_classes

    gs = GraphStore()
    gs.put_edge_index((g.src, g.dst), ("N", "e", "N"),
                      num_nodes=(g.num_nodes, g.num_nodes))
    fs = FeatureStore()
    fs[("", "x")] = x
    fs[("", "y")] = y

    fanouts = parse_fanouts(args.neighbors)
    t0 = time.perf_counter()
    loader = NeighborLoader((fs, gs), num_neighbors=fanouts,
                            batch_size=min(args.batch_size, g.num_nodes),
                            shuffle=True)
    log.info("prep time: %.2fs", time.perf_counter() - t0)

    from cugraph_gnn_tpu.models.builder import create_gnn_model
    model = create_gnn_model(args.model, class_count=num_classes,
                             hidden_feat_dim=args.hidden_dim,
                             num_layers=len(fanouts), num_heads=args.heads)

    b0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, x, sample, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, sample)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (jnp.sum(jnp.where(valid, ls, 0)) /
                    jnp.maximum(jnp.sum(valid), 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    @jax.jit
    def evaluate(params, x, sample, y, seeds):
        logits = model.apply(params, x, sample)
        valid = seeds >= 0
        correct = (jnp.argmax(logits, -1) == y) & valid
        return jnp.sum(correct), jnp.sum(valid)

    for epoch in range(args.epochs):
        t0 = time.perf_counter()
        tot, nb = 0.0, 0
        for b in loader:
            params, opt, loss = step(params, opt, b.x, b.sample, b.y, b.seeds)
            tot += float(loss)
            nb += 1
        dt = time.perf_counter() - t0
        log.info("epoch %d: loss %.4f  (%.2fs, %.3fs/iter)",
                 epoch, tot / nb, dt, dt / nb)

    correct = total = 0
    for b in loader:
        c, v = evaluate(params, b.x, b.sample, b.y, b.seeds)
        correct += int(c)
        total += int(v)
    log.info("train accuracy: %.4f", correct / total)
    # machine-parseable line for the example quality gates
    print(f"train accuracy: {correct / total:.4f}", flush=True)


if __name__ == "__main__":
    main()
