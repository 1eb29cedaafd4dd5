"""Overlap demonstration (round 5 / VERDICT r4 #8): does the pipeline's
steady-state step time beat the sum of its isolated stages?

Two claims to check on the real chip:
1. INTRA-step overlap: XLA:TPU executes one program's thunks serially
   (PERF_NOTES), so total should ~= sample + gather + model.
2. CROSS-step pipelining: `__iter__`-style back-to-back dispatches hide
   host dispatch latency — K async dispatches should beat K dispatches
   serialized by a readback each (the loader's documented overlap
   model, loader/dist_loader.py docstring).

Timing: iteration-count differencing; every block threads a dependent
carry (hoist-proof).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")

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

REPS = 10
NB = 10


def log(m):
    print(f"[overlap] {m}", file=sys.stderr, flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.ops.window_gather import (
        hub_fraction,
        hub_fraction_edgewise,
    )
    from cugraph_gnn_tpu.sampler.neighbor_sampler import (
        multihop_uniform_batched,
    )

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
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.float32)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indices, feats, labels

    ix, feats, labels = jax.block_until_ready(make_data(ip))
    log("data ready")

    def sample_block(key):
        sk, pk = jax.random.split(key)
        seeds = jax.random.randint(pk, (REPS, BATCH), 0, NUM_NODES,
                                   jnp.int32)
        sample = multihop_uniform_batched(
            sk, ip, ix, seeds, FANOUTS, indices2d=ix.reshape(-1, 128),
            max_degree=max_degree, hub_frac=hub_frac)
        return seeds, sample

    model = GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                      num_layers=len(FANOUTS), dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)
    key0 = jax.random.PRNGKey(0)
    seeds0, sample0 = jax.jit(sample_block)(key0)
    s0 = jax.tree_util.tree_map(lambda a: a[0], sample0)
    x0 = feats[jnp.clip(s0.input_nodes, 0)].astype(jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), x0, s0)
    opt = tx.init(params)
    x_all0 = jax.block_until_ready(jnp.stack(
        [feats[jnp.clip(sample0.levels[-1][i], 0)].astype(jnp.bfloat16)
         for i in range(REPS)]))

    def timed(blk, args, label):
        blk = jax.jit(blk)
        key = jax.random.PRNGKey(7)
        acc = jnp.zeros((), jnp.int32)
        int(blk(acc, key, *args))
        def loop(n):
            nonlocal key
            a = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                a = blk(a, sk, *args)
            return int(a)
        loop(1)
        t0 = time.perf_counter(); loop(1); small = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(NB + 1)
        ms = max(time.perf_counter() - t0 - small, 1e-9) / (NB * REPS) * 1e3
        log(f"{label}: {ms:.3f} ms/step")
        return ms

    # stage 1: sample only
    def b_sample(acc, key, feats, labels):
        _, s = sample_block(key)
        return acc + jnp.sum(s.levels[-1]).astype(jnp.int32)

    # stage 2: feature gathers only, ids fixed but perturbed by carry
    def b_gather(acc, key, feats, labels):
        inp = sample0.levels[-1] + (acc & 1)
        xs = [feats[jnp.clip(inp[i], 0)].astype(jnp.bfloat16)
              for i in range(REPS)]
        return acc + sum(jnp.sum(x).astype(jnp.float32).astype(jnp.int32)
                         for x in xs)

    # stage 3: model scan only on fixed sample + features
    def b_model(acc, key, feats, labels):
        ys = labels[jnp.clip(seeds0, 0)]

        def step(carry, xs):
            p, o, a = carry
            s, y, sr, x = xs

            def loss_fn(pp):
                logits = model.apply(pp, x, s).astype(jnp.float32)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            u, o = tx.update(grads, o)
            return (optax.apply_updates(p, u), o,
                    a + loss.astype(jnp.int32)), None

        (p, o, a), _ = jax.lax.scan(
            step, (params, opt, acc), (sample0, ys, seeds0, x_all0))
        return a

    # full pipeline (bench.py's train block)
    def b_full(acc, key, feats, labels):
        seeds, sample = sample_block(key)
        inp = sample.levels[-1]
        x_all = jnp.stack([
            feats[jnp.clip(inp[i], 0)].astype(jnp.bfloat16)
            for i in range(REPS)])
        ys = labels[jnp.clip(seeds, 0)]

        def step(carry, xs):
            p, o, a = carry
            s, y, sr, x = xs

            def loss_fn(pp):
                logits = model.apply(pp, x, s).astype(jnp.float32)
                return optax.softmax_cross_entropy_with_integer_labels(
                    logits, y).mean()

            loss, grads = jax.value_and_grad(loss_fn)(p)
            u, o = tx.update(grads, o)
            return (optax.apply_updates(p, u), o,
                    a + loss.astype(jnp.int32)), None

        (p, o, a), _ = jax.lax.scan(
            step, (params, opt, acc), (sample, ys, seeds, x_all))
        return a

    args = (feats, labels)
    ms_s = timed(b_sample, args, "sample only          ")
    ms_g = timed(b_gather, args, "feature gathers only ")
    ms_m = timed(b_model, args, "model scan only      ")
    ms_f = timed(b_full, args, "full pipeline        ")
    log(f"sum of stages {ms_s + ms_g + ms_m:.3f} vs full {ms_f:.3f} "
        f"-> intra-step overlap {'YES' if ms_f < 0.95 * (ms_s + ms_g + ms_m) else 'NO'}")

    # cross-step pipelining: K dispatches async vs readback-serialized
    blk = jax.jit(b_full)
    key = jax.random.PRNGKey(9)
    acc = jnp.zeros((), jnp.int32)
    int(blk(acc, key, *args))
    K = 8

    def run_async():
        nonlocal key
        a = jnp.zeros((), jnp.int32)
        for _ in range(K):
            key, sk = jax.random.split(key)
            a = blk(a, sk, *args)
        return int(a)

    def run_sync():
        nonlocal key
        a = jnp.zeros((), jnp.int32)
        for _ in range(K):
            key, sk = jax.random.split(key)
            a = blk(a, sk, *args)
            int(a)  # device->host readback serializes the host
        return int(a)

    run_async(); run_sync()
    t0 = time.perf_counter(); run_async()
    t_async = (time.perf_counter() - t0) / (K * REPS) * 1e3
    t0 = time.perf_counter(); run_sync()
    t_sync = (time.perf_counter() - t0) / (K * REPS) * 1e3
    log(f"cross-step: async dispatch {t_async:.3f} ms/step vs "
        f"readback-serialized {t_sync:.3f} ms/step "
        f"({t_sync / max(t_async, 1e-9):.2f}x)")


if __name__ == "__main__":
    main()
