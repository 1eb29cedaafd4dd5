"""Distributed full-batch GCN training over a device mesh.

The TPU-first full-batch path sharded over chips
(ops/dist_full_batch.py): RCM reorder -> banded slab split -> each
shard aggregates its row block with ONE R-row halo ppermute per
neighbor shard; model/optimizer state replicated, node arrays
row-sharded.  The reference has no full-batch compute (model math is
PyG's) — this is capability beyond parity: full-graph training that
scales with the mesh instead of sampling.

Run:  python examples/dist_full_batch_training.py --devices 8
(CPU: forces a virtual mesh of --devices; TPU pod: uses real chips.)
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--epochs", type=int, default=60)
    p.add_argument("--num-nodes", type=int, default=4096)
    p.add_argument("--mean-degree", type=int, default=6)
    p.add_argument("--band", type=int, default=200)
    p.add_argument("--lr", type=float, default=2e-2)
    p.add_argument("--tpu", action="store_true",
                   help="use the real TPU devices instead of a CPU mesh")
    args = p.parse_args()

    import jax
    if "--tpu" not in sys.argv:
        try:  # no-op when the harness already initialized a backend
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except RuntimeError:
            pass
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from cugraph_gnn_tpu.models import GCN
    from cugraph_gnn_tpu.ops import DistFullBatchGraph
    from cugraph_gnn_tpu.parallel import STORE_AXIS

    n = args.num_nodes
    rng = np.random.default_rng(0)
    # locality graph with planted 4-block community labels
    deg = args.mean_degree
    src = np.clip(
        np.repeat(np.arange(n), deg)
        + rng.integers(-args.band, args.band + 1, n * deg), 0, n - 1)
    dst = np.repeat(np.arange(n), deg)
    labels = (np.arange(n) * 4) // n
    x = (rng.standard_normal((n, 16))
         + labels[:, None] * 0.5).astype(np.float32)

    world = min(args.devices, len(jax.devices()))
    mesh = Mesh(np.array(jax.devices()[:world]), (STORE_AXIS,))
    g = DistFullBatchGraph.from_coo(src, dst, n, mesh, reorder="auto",
                                    block_rows=128)
    print(f"mesh={world} devices, band_fraction={g.band_fraction:.2f}")

    # one-time: node data into graph order, then row-sharded placement
    xs = g.shard(g.to_graph_order(x))
    y_pad = np.full(g._n_pad, 0, np.int32)
    y_pad[:n] = g.to_graph_order(labels)
    ys = g.shard(y_pad)
    valid = g.shard((np.arange(g._n_pad) < n).astype(np.float32))

    model = GCN(hidden_features=32, out_features=4, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), xs, g, method=GCN.full_graph)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, xs, g, method=GCN.full_graph)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, ys)
            return jnp.sum(ls * valid) / jnp.sum(valid)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for epoch in range(args.epochs):
        params, opt, loss = step(params, opt)
        if epoch % 20 == 19:
            print(f"epoch {epoch + 1}: loss {float(loss):.4f}")

    logits = model.apply(params, xs, g, method=GCN.full_graph)
    pred = np.asarray(jnp.argmax(logits, -1))[:n]
    acc = float((pred == g.to_graph_order(labels)).mean())
    print(f"full-batch distributed accuracy: {acc:.3f}")
    assert acc > 0.8, acc
    print("OK")


if __name__ == "__main__":
    main()
