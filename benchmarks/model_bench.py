"""Per-model training-step benchmarks (BASELINE configs 2/3 shapes):
GraphSAGE / GCN / GAT over the sampled pipeline on the real chip, same
graph and timing discipline as bench.py (power-law degrees,
degree-proportional targets, scan-amortized dispatches).

Prints one JSON line per model.  Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python benchmarks/model_bench.py
"""

import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import (  # noqa: E402
    BATCH,
    CLASSES,
    DEG_ALPHA,
    DEG_CAP,
    DEG_SCALE,
    FANOUTS,
    FEAT_DIM,
    HIDDEN,
    NUM_NODES,
)

ITERS = 100
REPS = 10


def log(m):
    print(f"[mbench] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GAT, GCN, GraphSAGE
    from cugraph_gnn_tpu.ops.window_gather import (
        hub_fraction,
        hub_fraction_edgewise,
    )
    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    host = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    hub_frac = (hub_fraction(indptr_np), hub_fraction_edgewise(indptr_np))
    num_edges = int(indptr_np[-1])
    nep = -(-num_edges // 128) * 128
    ip = jnp.asarray(indptr_np)

    @jax.jit
    def make_data(indptr):
        slot = jax.random.randint(
            jax.random.PRNGKey(0), (nep,), 0, num_edges, jnp.int32)
        indices = (jnp.searchsorted(indptr, slot, side="right") - 1
                   ).astype(jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.bfloat16)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indices, feats, labels

    ix, feats, labels = jax.block_until_ready(make_data(ip))
    log("data ready")

    def sample_fn(key, seeds, indptr, indices):
        return multihop_uniform(key, indptr, indices, seeds, FANOUTS,
                                dedup=False,
                                indices2d=indices.reshape(-1, 128),
                                max_degree=max_degree, hub_frac=hub_frac)

    models = {
        "graphsage": GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                               num_layers=2, dtype=jnp.bfloat16),
        "gcn": GCN(hidden_features=HIDDEN, out_features=CLASSES,
                   num_layers=2, dtype=jnp.bfloat16),
        "gat": GAT(hidden_features=HIDDEN, out_features=CLASSES,
                   num_layers=2, heads=4),
    }

    s0 = jax.jit(sample_fn)(jax.random.PRNGKey(0),
                            jnp.arange(BATCH, dtype=jnp.int32), ip, ix)
    x0 = feats[jnp.clip(s0.input_nodes, 0)]

    for name, model in models.items():
        params = model.init(jax.random.PRNGKey(1), x0, s0)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def block(params, opt, total, key, ip, ix, feats, labels,
                  model=model, tx=tx):
            def body(carry, i):
                params, opt, total = carry
                kk = jax.random.fold_in(key, i)
                seeds = jax.random.randint(
                    jax.random.fold_in(kk, 1), (BATCH,), 0, NUM_NODES,
                    jnp.int32)
                sample = sample_fn(kk, seeds, ip, ix)
                inp = sample.input_nodes
                x = jnp.where((inp >= 0)[:, None],
                              feats[jnp.clip(inp, 0)], 0)
                y = labels[jnp.clip(seeds, 0)]

                def loss_fn(p):
                    logits = model.apply(p, x, sample).astype(jnp.float32)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                u, opt = tx.update(grads, opt)
                edges = sum(jnp.sum(h.mask) for h in sample.hops)
                return ((optax.apply_updates(params, u), opt,
                         total + edges.astype(jnp.int32)), None)

            carry, _ = jax.lax.scan(body, (params, opt, total),
                                    jnp.arange(REPS, dtype=jnp.int32))
            return carry

        def run(n, params, opt):
            key = jax.random.PRNGKey(3)
            total = jnp.zeros((), jnp.int32)
            for i in range(n):
                params, opt, total = block(
                    params, opt, total, jax.random.fold_in(key, i),
                    ip, ix, feats, labels)
            return int(total), params, opt

        nb = ITERS // REPS
        _, params, opt = run(1, params, opt)  # compile + warm
        t0 = time.perf_counter()
        _, params, opt = run(1, params, opt)
        ts = time.perf_counter() - t0
        t0 = time.perf_counter()
        tot, params, opt = run(nb + 1, params, opt)
        tb = time.perf_counter() - t0
        dt = max(tb - ts, 1e-9) / ITERS
        eps = tot * nb / (nb + 1) / (dt * ITERS)
        print(json.dumps({
            "model": name, "ms_per_iter": round(dt * 1e3, 2),
            "sampled_edges_per_s": round(eps, 1)}))
        log(f"{name}: {dt*1e3:.2f} ms/iter")


if __name__ == "__main__":
    main()
