"""Per-model training-step benchmarks (BASELINE configs 2/3 shapes):
GraphSAGE / GCN / GAT over the sampled pipeline on the real chip.

Prints one JSON line per model.  Usage: python benchmarks/model_bench.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np


def log(m):
    print(f"[mbench] {m}", file=sys.stderr, flush=True)


NUM_NODES = 2_449_029
AVG_DEG = 50
FEAT = 128
HIDDEN = 256
CLASSES = 47
BATCH = 1024
FANOUTS = (10, 10)
ITERS = 50


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GAT, GCN, GraphSAGE
    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    num_edges = NUM_NODES * AVG_DEG

    @jax.jit
    def make_data():
        indptr = jnp.arange(NUM_NODES + 1, dtype=jnp.int32) * AVG_DEG
        indices = jax.random.randint(
            jax.random.PRNGKey(0), (num_edges,), 0, NUM_NODES, jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT), jnp.bfloat16)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indptr, indices, feats, labels

    ip, ix, feats, labels = jax.block_until_ready(make_data())
    log("data ready")

    models = {
        "graphsage": GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                               num_layers=2, dtype=jnp.bfloat16),
        "gcn": GCN(hidden_features=HIDDEN, out_features=CLASSES,
                   num_layers=2, dtype=jnp.bfloat16),
        "gat": GAT(hidden_features=HIDDEN, out_features=CLASSES,
                   num_layers=2, heads=4),
    }

    s0 = jax.jit(
        lambda k, a, b: multihop_uniform(
            k, a, b, jnp.arange(BATCH, dtype=jnp.int32), FANOUTS,
            dedup=False))(jax.random.PRNGKey(0), ip, ix)
    x0 = feats[jnp.clip(s0.input_nodes, 0)]

    for name, model in models.items():
        params = model.init(jax.random.PRNGKey(1), x0, s0)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def step(params, opt, total, key, seeds, ip, ix, feats, labels,
                 model=model, tx=tx):
            sample = multihop_uniform(key, ip, ix, seeds, FANOUTS,
                                      dedup=False)
            inp = sample.input_nodes
            x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
            y = labels[jnp.clip(seeds, 0)]

            def loss_fn(p):
                logits = model.apply(p, x, sample).astype(jnp.float32)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(params)
            u, opt = tx.update(grads, opt)
            edges = sum(jnp.sum(h.mask) for h in sample.hops)
            return (optax.apply_updates(params, u), opt,
                    total + edges.astype(jnp.int32))

        def run(n, params, opt):
            key = jax.random.PRNGKey(3)
            total = jnp.zeros((), jnp.int32)
            for i in range(n):
                key, sk, pk = jax.random.split(key, 3)
                seeds = jax.random.randint(pk, (BATCH,), 0, NUM_NODES,
                                           jnp.int32)
                params, opt, total = step(params, opt, total, sk, seeds,
                                          ip, ix, feats, labels)
            return int(total), params, opt

        _, params, opt = run(3, params, opt)
        t0 = time.perf_counter()
        _, params, opt = run(2, params, opt)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, params, opt = run(ITERS + 2, params, opt)
        tb = time.perf_counter() - t0
        dt = max(tb - ts, 1e-9) / ITERS
        eps = tot * ITERS / (ITERS + 2) / (dt * ITERS)
        print(json.dumps({
            "model": name, "ms_per_iter": round(dt * 1e3, 2),
            "sampled_edges_per_s": round(eps, 1)}))
        log(f"{name}: {dt*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
