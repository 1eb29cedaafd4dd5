"""Training with a device-cached HOST-resident embedding table.

ref python/pylibwholegraph/examples/node_classification.py with
``--cache_type local_device --cache_ratio 0.2`` — the
device_cached_host_embedding configuration (ref embedding.cpp:556):
the node-feature/embedding table is larger than device HBM, lives in
host RAM, and a set-associative LFU cache of hot rows sits in HBM.
Trained rows are written into the cache (dirty) and write back on
eviction/flush.

Usage:
    python examples/cached_embedding_training.py --epochs 3
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
    p.add_argument("--num-nodes", type=int, default=20000)
    p.add_argument("--num-edges", type=int, default=100000)
    p.add_argument("--dim", type=int, default=32)
    p.add_argument("--cache-ratio", type=float, default=0.1)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.embedding import CachedHostEmbedding
    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.native import build_csr
    from cugraph_gnn_tpu.sampler import NeighborSampler
    from cugraph_gnn_tpu.utils.datasets import random_graph

    rng = np.random.default_rng(0)
    n = args.num_nodes
    g = random_graph(n, args.num_edges, seed=0, power_law=True)
    indptr, indices, _ = build_csr(g.dst, g.src, n)
    labels = rng.integers(0, 8, n).astype(np.int32)

    # learnable node embeddings in HOST memory behind the device cache
    emb = CachedHostEmbedding(
        (0.05 * rng.standard_normal((n, args.dim))).astype(np.float32),
        optimizer="adagrad", cache_ratio=args.cache_ratio, ways=8)

    fanouts = [int(f) for f in args.neighbors.split(",")]
    sampler = NeighborSampler(indptr, indices, fanouts)
    model = GraphSAGE(hidden_features=args.hidden_dim, out_features=8,
                      num_layers=len(fanouts))

    key = jax.random.PRNGKey(0)
    seeds0 = jnp.arange(args.batch_size, dtype=jnp.int32)
    sample0 = sampler.sample(key, seeds0)
    tap0 = emb.make_tap(int(sample0.input_nodes.shape[0]))
    params = model.init(key, emb.gather(sample0.input_nodes) + tap0,
                        sample0)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt, rows, tap, sample, y):
        def loss_fn(p, t):
            logits = model.apply(p, rows + t, sample)
            valid = sample.levels[0] >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, (gp, gt) = jax.value_and_grad(loss_fn, argnums=(0, 1))(
            params, tap)
        u, opt = tx.update(gp, opt)
        return optax.apply_updates(params, u), opt, loss, gt

    steps_per_epoch = max(n // args.batch_size, 1)
    for epoch in range(args.epochs):
        tot = 0.0
        k = jax.random.fold_in(key, epoch)
        for i in range(steps_per_epoch):
            kk = jax.random.fold_in(k, i)
            seeds = jax.random.randint(kk, (args.batch_size,), 0, n,
                                       jnp.int32)
            sample = sampler.sample(kk, seeds)
            rows = emb.gather(sample.input_nodes)
            tap = emb.make_tap(int(sample.input_nodes.shape[0]))
            y = jnp.asarray(labels)[jnp.clip(seeds, 0)]
            params, opt, loss, g_tap = step(params, opt, rows, tap,
                                            sample, y)
            emb.add_gradients(sample.input_nodes, g_tap)
            emb.apply_gradients(lr=args.lr)
            tot += float(loss)
        print(f"epoch {epoch}: loss {tot / steps_per_epoch:.4f} "
              f"cache hit rate {emb.hit_rate:.2f}")
    emb.flush()


if __name__ == "__main__":
    main()
