"""Stage-level timing of the headline train step (bench.py shapes).

Times each pipeline stage in isolation with the same iteration-count
differencing discipline as bench.py (dependent scalar readback; no
block_until_ready through the tunnel).  Run on the real chip:

    timeout 580 python benchmarks/stage_profile.py
"""

import time

import numpy as np

from bench import (  # noqa: E402  (same graph as the headline bench)
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
REPS = 10   # steps per dispatch (scan) — amortizes the tunnel floor


def log(msg):
    print(f"[stage] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    from cugraph_gnn_tpu.ops.window_gather import (
        hub_fraction,
        hub_fraction_edgewise,
    )
    hub_frac = (hub_fraction(indptr_np), hub_fraction_edgewise(indptr_np))
    num_edges = int(indptr_np[-1])
    num_edges_pad = -(-num_edges // 128) * 128
    indptr_j = jnp.asarray(indptr_np)

    @jax.jit
    def make_data(indptr):
        # degree-proportional neighbor ids, matching bench.py (indptr
        # as an argument, not a closure constant)
        slot = jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, num_edges,
            jnp.int32)
        indices = (jnp.searchsorted(indptr, slot, side="right") - 1
                   ).astype(jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.bfloat16)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indices, feats, labels

    indices_j, feats, labels = jax.block_until_ready(make_data(indptr_j))
    log(f"data ready ({num_edges} edges)")

    model = GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                      num_layers=len(FANOUTS), dtype=jnp.bfloat16)

    def sample_fn(key, seeds, indptr, indices):
        return multihop_uniform(key, indptr, indices, seeds, FANOUTS,
                                dedup=False,
                                indices2d=indices.reshape(-1, 128),
                                max_degree=max_degree, hub_frac=hub_frac)

    # Stage jit programs, each threading a dependent scalar accumulator.
    def scan_reps(body):
        def run(carry, key, *args):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i), *args), None
            carry, _ = jax.lax.scan(step, carry,
                                    jnp.arange(REPS, dtype=jnp.int32))
            return carry
        return jax.jit(run)

    stage_sample = scan_reps(
        lambda acc, key, seeds, indptr, indices: acc + jnp.sum(
            sample_fn(key, seeds, indptr, indices).levels[-1]
        ).astype(jnp.int32))

    def _sg(acc, key, seeds, indptr, indices, feats):
        s = sample_fn(key, seeds, indptr, indices)
        inp = s.input_nodes
        x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
        return acc + jnp.sum(x).astype(jnp.float32).astype(jnp.int32)

    stage_sample_gather = scan_reps(_sg)

    # model-only: fixed sample/x as args (sampling excluded)
    tx = optax.adam(1e-3)

    def model_step(params, opt_state, x, sample, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, sample).astype(jnp.float32)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    def _sm(carry, key, x, sample, y, seeds):
        params, opt_state, acc = carry
        # perturb x by key so iterations aren't constant-folded
        xx = x + jax.random.normal(key, (1, x.shape[1]), x.dtype)
        params, opt_state, loss = model_step(params, opt_state, xx, sample,
                                             y, seeds)
        return params, opt_state, acc + loss.astype(jnp.float32)

    stage_model = scan_reps(
        lambda c, key, x, sample, y, seeds: _sm(c, key, x, sample, y, seeds))

    def _sf(carry, key, seeds, indptr, indices, feats, labels):
        params, opt_state, acc = carry
        s = sample_fn(key, seeds, indptr, indices)
        inp = s.input_nodes
        x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
        y = labels[jnp.clip(seeds, 0)]
        params, opt_state, loss = model_step(params, opt_state, x, s, y,
                                             seeds)
        return params, opt_state, acc + loss.astype(jnp.float32)

    stage_full = scan_reps(_sf)

    key = jax.random.PRNGKey(3)
    seeds0 = jnp.arange(BATCH, dtype=jnp.int32)
    s0 = jax.jit(sample_fn)(jax.random.PRNGKey(0), seeds0, indptr_j,
                            indices_j)
    x0 = jnp.where((s0.input_nodes >= 0)[:, None],
                   feats[jnp.clip(s0.input_nodes, 0)], 0)
    y0 = labels[jnp.clip(seeds0, 0)]
    params = model.init(jax.random.PRNGKey(1), x0, s0)
    opt_state = tx.init(params)
    log("init done")

    def timed(name, loop):
        # warmup (compile) + differencing; each dispatch runs REPS steps
        loop(2)
        t0 = time.perf_counter(); loop(2); t_small = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(ITERS + 2)
        dt = max(time.perf_counter() - t0 - t_small, 1e-9)
        log(f"{name}: {1e3 * dt / (ITERS * REPS):.3f} ms/iter")

    def mk_seed(pk):
        return jax.random.randint(pk, (BATCH,), 0, NUM_NODES, jnp.int32)

    def loop_sample(n):
        nonlocal key
        acc = jnp.zeros((), jnp.int32)
        for _ in range(n):
            key, sk, pk = jax.random.split(key, 3)
            acc = stage_sample(acc, sk, mk_seed(pk), indptr_j, indices_j)
        return int(acc)

    def loop_gather(n):
        nonlocal key
        acc = jnp.zeros((), jnp.int32)
        for _ in range(n):
            key, sk, pk = jax.random.split(key, 3)
            acc = stage_sample_gather(acc, sk, mk_seed(pk), indptr_j,
                                      indices_j, feats)
        return int(acc)

    def loop_model(n):
        nonlocal key, params, opt_state
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            key, sk = jax.random.split(key)
            params, opt_state, acc = stage_model(
                (params, opt_state, acc), sk, x0, s0, y0, seeds0)
        return float(acc)

    def loop_full(n):
        nonlocal key, params, opt_state
        acc = jnp.zeros((), jnp.float32)
        for _ in range(n):
            key, sk, pk = jax.random.split(key, 3)
            params, opt_state, acc = stage_full(
                (params, opt_state, acc), sk, mk_seed(pk), indptr_j,
                indices_j, feats, labels)
        return float(acc)

    timed("sample-only         ", loop_sample)
    timed("sample+feature-gather", loop_gather)
    timed("model fwd+bwd+adam  ", loop_model)
    timed("full step           ", loop_full)


if __name__ == "__main__":
    main()
