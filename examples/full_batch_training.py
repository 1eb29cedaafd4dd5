"""Full-batch training via FullBatchGraph (the slab MXU pipeline).

The TPU-first full-batch path: RCM reorder -> banded slab split -> MXU
aggregation (ops/full_batch.py; slab SpMM 1080 GB/s effective at
products scale on v5e vs the 116 GB/s gather wall; fused attention
575 fwd / 317 bwd — PERF_NOTES.md).  The reference has no full-batch
compute of its own (model math lives in PyG); this is the
framework-native equivalent of a PyG full-batch training script.

Run (CPU or TPU):  python examples/full_batch_training.py [--model gat]
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import argparse

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GAT, GCN, RGCN, GraphSAGE
    from cugraph_gnn_tpu.ops import FullBatchGraph, RelationalFullBatch
    from cugraph_gnn_tpu.utils.datasets import load_karate, symmetrize

    p = argparse.ArgumentParser()
    p.add_argument("--model", choices=("gcn", "sage", "gat", "rgcn"),
                   default="gcn")
    p.add_argument("--epochs", type=int, default=60)
    args = p.parse_args()

    g = symmetrize(load_karate())
    labels_in = np.zeros(g.num_nodes, np.int32)
    # karate's standard 2-community split by club membership proxy:
    # nodes closer to 0 vs 33 by id parity of the original dataset
    labels_in[[8, 9, 14, 15, 18, 20, 22, 23, 24, 25, 26, 27, 28, 29,
               30, 31, 32, 33]] = 1

    # one-time preprocessing: build the graph, move node data into
    # graph order, train entirely in that space.  rgcn splits edges
    # into 2 relations (by endpoint parity) and runs per-relation
    # banded slabs on a shared union-RCM order (RelationalFullBatch).
    if args.model == "rgcn":
        etype = ((np.asarray(g.src) + np.asarray(g.dst)) % 2).astype(
            np.int32)
        fbg = RelationalFullBatch(g.src, g.dst, etype, 2, g.num_nodes)
    else:
        fbg = FullBatchGraph.from_coo(g.src, g.dst, g.num_nodes,
                                      reorder="auto")
    rng = np.random.default_rng(0)
    x_in = rng.standard_normal((g.num_nodes, 16)).astype(np.float32)
    x = fbg.to_graph_order(jnp.asarray(x_in))
    y = fbg.to_graph_order(jnp.asarray(labels_in))

    # GAT runs the fused slab attention (SDDMM + edge softmax +
    # aggregate, one MXU pass per direction) fwd AND bwd
    model = {
        "gcn": lambda: GCN(hidden_features=16, out_features=2,
                           num_layers=2),
        "sage": lambda: GraphSAGE(hidden_features=16, out_features=2,
                                  num_layers=2),
        "gat": lambda: GAT(hidden_features=16, out_features=2,
                           num_layers=2, heads=4),
        "rgcn": lambda: RGCN(num_relations=2, hidden_features=16,
                             out_features=2, num_layers=2),
    }[args.model]()
    fg = type(model).full_graph
    params = model.init(jax.random.PRNGKey(0), x, fbg, method=fg)
    tx = optax.adam(5e-3 if args.model != "gat" else 1e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, x, fbg, method=fg)
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, y).mean()
        loss, grads = jax.value_and_grad(loss_fn)(params)
        upd, opt = tx.update(grads, opt)
        return optax.apply_updates(params, upd), opt, loss

    for epoch in range(args.epochs):
        params, opt, loss = step(params, opt)
        if epoch % 20 == 19:
            print(f"epoch {epoch + 1}: loss {float(loss):.4f}")

    logits = model.apply(params, x, fbg, method=fg)
    acc = float((jnp.argmax(logits, -1) == y).mean())
    print(f"full-batch {args.model} accuracy: {acc:.3f} "
          f"(band fraction {fbg.band_fraction:.2f})")
    assert acc > 0.9
    print("OK")


if __name__ == "__main__":
    main()
