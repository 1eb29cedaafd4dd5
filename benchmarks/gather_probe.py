"""Probe: (a) hierarchical window-select timing, (b) feature-gather
variants at the bench batch-gather shape (124k rows x 128 bf16).

    timeout 580 python -m benchmarks.gather_probe
"""

import time

import numpy as np

from bench import (
    BATCH,
    DEG_ALPHA,
    DEG_CAP,
    DEG_SCALE,
    FANOUTS,
    FEAT_DIM,
    NUM_NODES,
)

REPS = 20
OUTER = 20
S2 = BATCH * (FANOUTS[0] + 1)
ROWS = BATCH * (FANOUTS[0] + 1) * (FANOUTS[1] + 1)  # 124k


def log(msg):
    print(f"[gprof] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.sample import floyd_positions
    from cugraph_gnn_tpu.ops.window_gather import gather_csr_values

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
        return indices, feats

    indices, feats = jax.block_until_ready(make_data())
    feats_f32 = jax.block_until_ready(
        jax.jit(lambda f: f.astype(jnp.float32))(feats))
    log("data ready")

    def scanner(step_fn, n=REPS):
        @jax.jit
        def run(acc, key, *arrays):
            def body(carry, i):
                kk = jax.random.fold_in(key, i)
                return step_fn(carry, kk, *arrays), None
            acc, _ = jax.lax.scan(body, acc, jnp.arange(n, dtype=jnp.int32))
            return acc
        return run

    def p_window(acc, kk, indptr, indices):
        seeds = jax.random.randint(kk, (S2,), 0, NUM_NODES, jnp.int32)
        start = indptr[seeds].astype(jnp.int32)
        d = (indptr[seeds + 1] - indptr[seeds]).astype(jnp.int32)
        u = jax.random.uniform(kk, (S2, k))
        pos = floyd_positions(u, d, k)
        nbr = gather_csr_values(indices.reshape(-1, 128), start, pos,
                                degrees=d, max_degree=max_degree)
        return acc + jnp.sum(nbr)

    # feature gather variants
    def p_feat_bf16(acc, kk, feats):
        ids = jax.random.randint(kk, (ROWS,), 0, NUM_NODES, jnp.int32)
        return acc + jnp.sum(feats[ids]).astype(jnp.int32)

    def p_feat_i32view(acc, kk, feats):
        ids = jax.random.randint(kk, (ROWS,), 0, NUM_NODES, jnp.int32)
        f32v = jax.lax.bitcast_convert_type(
            feats.reshape(NUM_NODES, FEAT_DIM // 2, 2), jnp.int32)
        x = jax.lax.bitcast_convert_type(
            f32v[ids], jnp.bfloat16).reshape(ROWS, FEAT_DIM)
        return acc + jnp.sum(x).astype(jnp.int32)

    def p_feat_f32(acc, kk, feats_f32):
        ids = jax.random.randint(kk, (ROWS,), 0, NUM_NODES, jnp.int32)
        return acc + jnp.sum(feats_f32[ids]).astype(jnp.int32)

    def p_feat_sorted(acc, kk, feats):
        ids = jax.random.randint(kk, (ROWS,), 0, NUM_NODES, jnp.int32)
        sids = jnp.sort(ids)
        return acc + jnp.sum(feats[sids]).astype(jnp.int32)

    def p_feat_half(acc, kk, feats):
        ids = jax.random.randint(kk, (ROWS // 2,), 0, NUM_NODES, jnp.int32)
        return acc + jnp.sum(feats[ids]).astype(jnp.int32)

    key = jax.random.PRNGKey(9)

    def timed(name, run, arrays):
        nonlocal key

        def loop(n):
            nonlocal key
            acc = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                acc = run(acc, sk, *arrays)
            return int(acc)

        loop(1)
        t0 = time.perf_counter(); loop(1); t_s = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(OUTER + 1)
        dt = max(time.perf_counter() - t0 - t_s, 1e-9)
        log(f"{name}: {1e3 * dt / (OUTER * REPS):.3f} ms/step")

    timed("window-gather (hier select)", scanner(p_window),
          (indptr, indices))
    timed("feat gather bf16 128       ", scanner(p_feat_bf16), (feats,))
    timed("feat gather bf16-as-i32 64 ", scanner(p_feat_i32view), (feats,))
    timed("feat gather f32 128        ", scanner(p_feat_f32), (feats_f32,))
    timed("feat gather bf16 sorted    ", scanner(p_feat_sorted), (feats,))
    timed("feat gather bf16 half rows ", scanner(p_feat_half), (feats,))


if __name__ == "__main__":
    main()
