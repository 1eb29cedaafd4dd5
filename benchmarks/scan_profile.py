"""Clean device-time profile: every variant runs 20 steps inside one
jit'd lax.scan, so per-dispatch tunnel overhead (~0.25 ms) amortizes
away.  The per-step numbers are true device times.

    timeout 580 python -m benchmarks.scan_profile
"""

import time

import numpy as np

from bench import (
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

REPS = 20   # steps per dispatch
OUTER = 20  # dispatches timed
S2 = BATCH * (FANOUTS[0] + 1)


def log(msg):
    print(f"[scan] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.ops.sample import floyd_positions
    from cugraph_gnn_tpu.ops.window_gather import gather_csr_values
    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    num_edges_pad = -(-int(indptr_np[-1]) // 128) * 128
    indptr = jnp.asarray(indptr_np)
    k = FANOUTS[0]

    @jax.jit
    def make_data():
        indices = jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, NUM_NODES, jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.bfloat16)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indices, feats, labels

    indices, feats, labels = jax.block_until_ready(make_data())
    log("data ready")

    def scanner(step_fn, n=REPS):
        """jit fn: (acc, key, *arrays) -> acc after n steps of step_fn."""
        @jax.jit
        def run(acc, key, *arrays):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                return step_fn(carry, kk, *arrays), None
            acc, _ = jax.lax.scan(body, acc, jnp.arange(n, dtype=jnp.int32))
            return acc
        return run

    # -- sampler pieces (hop-2 shape S2) --
    def p_indptr(acc, kk, indptr):
        seeds = jax.random.randint(kk, (S2,), 0, NUM_NODES, jnp.int32)
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        return acc + jnp.sum(start) + jnp.sum(d)

    def p_floyd(acc, kk, indptr):
        seeds = jax.random.randint(kk, (S2,), 0, NUM_NODES, jnp.int32)
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(kk, (S2, k))
        pos = floyd_positions(u, d, k)
        return acc + jnp.sum(pos) + jnp.sum(start)

    def p_window(acc, kk, indptr, indices):
        seeds = jax.random.randint(kk, (S2,), 0, NUM_NODES, jnp.int32)
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(kk, (S2, k))
        pos = floyd_positions(u, d, k)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree)
        return acc + jnp.sum(nbr)

    def p_multihop(acc, kk, indptr, indices):
        seeds = jax.random.randint(kk, (BATCH,), 0, NUM_NODES, jnp.int32)
        s = multihop_uniform(kk, indptr, indices, seeds, FANOUTS,
                             dedup=False,
                             indices2d=indices.reshape(-1, 128),
                             max_degree=max_degree)
        return acc + jnp.sum(s.levels[-1])

    def p_feat_gather(acc, kk, feats):
        # gather of the deepest-level row count from the feature table
        rows = BATCH * (FANOUTS[0] + 1) * (FANOUTS[1] + 1)
        ids = jax.random.randint(kk, (rows,), 0, NUM_NODES, jnp.int32)
        x = feats[ids]
        return acc + jnp.sum(x).astype(jnp.int32)

    # -- full train step --
    model = GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                      num_layers=len(FANOUTS), dtype=jnp.bfloat16)
    tx = optax.adam(1e-3)
    seeds0 = jnp.arange(BATCH, dtype=jnp.int32)
    s0 = jax.jit(lambda kk, ip, ix: multihop_uniform(
        kk, ip, ix, seeds0, FANOUTS, dedup=False,
        indices2d=ix.reshape(-1, 128), max_degree=max_degree))(
            jax.random.PRNGKey(0), indptr, indices)
    x0 = jnp.where((s0.input_nodes >= 0)[:, None],
                   feats[jnp.clip(s0.input_nodes, 0)], 0)
    params = model.init(jax.random.PRNGKey(1), x0, s0)
    opt_state = tx.init(params)

    def p_full(carry, kk, indptr, indices, feats, labels):
        params, opt_state, acc = carry
        seeds = jax.random.randint(kk, (BATCH,), 0, NUM_NODES, jnp.int32)
        s = multihop_uniform(kk, indptr, indices, seeds, FANOUTS,
                             dedup=False,
                             indices2d=indices.reshape(-1, 128),
                             max_degree=max_degree)
        inp = s.input_nodes
        x = jnp.where((inp >= 0)[:, None], feats[jnp.clip(inp, 0)], 0)
        y = labels[jnp.clip(seeds, 0)]

        def loss_fn(p):
            logits = model.apply(p, x, s).astype(jnp.float32)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = tx.update(grads, opt_state)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, acc + loss.astype(jnp.float32))

    key = jax.random.PRNGKey(9)

    def timed(name, run, acc0, arrays):
        nonlocal key

        def loop(n):
            nonlocal key
            acc = acc0
            for _ in range(n):
                key, sk = jax.random.split(key)
                acc = run(acc, sk, *arrays)
            return jax.tree_util.tree_leaves(acc)[-1]

        float(jnp.sum(loop(1)))  # compile
        t0 = time.perf_counter(); float(jnp.sum(loop(1)))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); float(jnp.sum(loop(OUTER + 1)))
        dt = max(time.perf_counter() - t0 - t_s, 1e-9)
        log(f"{name}: {1e3 * dt / (OUTER * REPS):.3f} ms/step")

    z = jnp.zeros((), jnp.int32)
    timed("seeds+indptr       ", scanner(p_indptr), z, (indptr,))
    timed("+floyd             ", scanner(p_floyd), z, (indptr,))
    timed("+window-gather     ", scanner(p_window), z, (indptr, indices))
    timed("multihop [10,10]   ", scanner(p_multihop), z, (indptr, indices))
    timed("feature gather 124k", scanner(p_feat_gather), z, (feats,))
    timed("FULL train step    ", scanner(p_full),
          (params, opt_state, jnp.zeros((), jnp.float32)),
          (indptr, indices, feats, labels))


if __name__ == "__main__":
    main()
