"""Benchmark: sampled edges/s/chip through the full training pipeline
(sample -> feature gather -> GraphSAGE fwd/bwd -> update) on an
ogbn-products-scale synthetic graph, run on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md); vs_baseline is
measured against the round-1 pinned value below so later rounds show
relative progress.
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# Round-1 pinned reference point (first measured value of this bench on
# one TPU v5e chip).  Update only when the bench definition changes.
BASELINE_EDGES_PER_S = 1.61e6

# ogbn-products scale: 2.45M nodes, ~124M directed edges
NUM_NODES = 2_449_029
NUM_EDGES = 123_718_280
FEAT_DIM = 100
HIDDEN = 256
CLASSES = 47
BATCH = 1024
FANOUTS = (10, 10)
WARMUP = 3
ITERS = 20


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.sampler import NeighborSampler

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t = time.perf_counter()
    rng = np.random.default_rng(0)
    # Build CSR directly (uniform random graph): row lengths ~ Binomial.
    avg_deg = NUM_EDGES // NUM_NODES
    deg = rng.poisson(avg_deg, NUM_NODES).astype(np.int64)
    indptr = np.concatenate([[0], np.cumsum(deg)])
    num_edges = int(indptr[-1])
    indices = rng.integers(0, NUM_NODES, num_edges, dtype=np.int64)
    log(f"graph built in {time.perf_counter()-t:.1f}s ({num_edges} edges)")

    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    indptr_j = jnp.asarray(indptr, jnp.int32)
    indices_j = jnp.asarray(indices, jnp.int32)

    feats = jnp.asarray(
        rng.standard_normal((NUM_NODES, FEAT_DIM)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, CLASSES, NUM_NODES, dtype=np.int64))

    model = GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                      num_layers=len(FANOUTS))
    seeds0 = jnp.arange(BATCH, dtype=jnp.int32)
    t = time.perf_counter()
    sample0 = jax.jit(multihop_uniform, static_argnames=("fanouts",))(
        jax.random.PRNGKey(0), indptr_j, indices_j, seeds0, fanouts=FANOUTS)
    x0 = feats[jnp.clip(sample0.input_nodes, 0)]
    params = model.init(jax.random.PRNGKey(1), x0, sample0)
    tx = optax.adam(1e-3)
    opt_state = tx.init(params)
    log(f"init done in {time.perf_counter()-t:.1f}s")

    @jax.jit
    def train_step(params, opt_state, key, seeds, indptr, indices, feats,
                   labels):
        sample = multihop_uniform(key, indptr, indices, seeds, FANOUTS)
        inp = sample.input_nodes
        x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
        y = labels[jnp.clip(seeds, 0)]

        def loss_fn(p):
            logits = model.apply(p, x, sample)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        edges = sum(jnp.sum(h.mask) for h in sample.hops)
        return params, opt_state, loss, edges

    key = jax.random.PRNGKey(2)
    total_edges = 0
    for i in range(WARMUP):
        key, sk, pk = jax.random.split(key, 3)
        seeds = jax.random.randint(pk, (BATCH,), 0, NUM_NODES, jnp.int32)
        params, opt_state, loss, edges = train_step(
            params, opt_state, sk, seeds, indptr_j, indices_j, feats, labels)
    jax.block_until_ready(params)
    log("warmup done")

    t0 = time.perf_counter()
    for i in range(ITERS):
        key, sk, pk = jax.random.split(key, 3)
        seeds = jax.random.randint(pk, (BATCH,), 0, NUM_NODES, jnp.int32)
        params, opt_state, loss, edges = train_step(
            params, opt_state, sk, seeds, indptr_j, indices_j, feats, labels)
        total_edges += int(edges)
    jax.block_until_ready(params)
    dt = time.perf_counter() - t0

    edges_per_s = total_edges / dt
    print(json.dumps({
        "metric": "sampled_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
    }))


if __name__ == "__main__":
    main()
