"""Probe: does batching S steps' sampling / feature gather into one
flattened op beat a scan of S per-step ops?

Hypothesis (round-5 #1): the XLA row gather has a per-op size ramp
(~117M rows/s at 113k rows vs ~227M at 1M — benchmarks/gather_variants.py),
and the sampled step's two dominant stages (neighbor-id window gather
inside sampling, feature gather) sit at the small end of that ramp.
Running S=10 steps' worth of per-seed work as ONE flattened batch makes
every gather 10x bigger and should roughly double the row rate.

Timing discipline per .claude/skills/verify/SKILL.md: iteration-count
differencing with a dependent scalar readback; bodies are scans whose
carry threads through every iteration (hoist-proof).
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(f"[probe] {m}", file=sys.stderr, flush=True)


NUM_NODES = 2_449_029
DEG_SCALE = 25.0
DEG_ALPHA = -0.5
DEG_CAP = 17_000
FEAT_DIM = 128
BATCH = 1024
S = 10  # steps fused per dispatch in the batched variant
FANOUTS = (10, 10)
REPS = 10
NB = 10


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.window_gather import (
        hub_fraction, hub_fraction_edgewise)
    from cugraph_gnn_tpu.sampler.neighbor_sampler import multihop_uniform

    log(f"backend={jax.default_backend()}")
    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    hub_frac = (hub_fraction(indptr_np), hub_fraction_edgewise(indptr_np))
    num_edges = int(indptr_np[-1])
    num_edges_pad = -(-num_edges // 128) * 128
    indptr_j = jnp.asarray(indptr_np)

    @jax.jit
    def make_data(indptr):
        slot = jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, num_edges, jnp.int32)
        indices = (jnp.searchsorted(indptr, slot, side="right") - 1
                   ).astype(jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.bfloat16)
        return indices, feats

    indices_j, feats = jax.block_until_ready(make_data(indptr_j))
    log(f"data ready ({num_edges} edges)")

    def timed(blk, args, label, reps, per_iter_scale=1.0):
        acc = jnp.zeros((), jnp.int32)
        key = jax.random.PRNGKey(7)
        int(blk(acc, key, *args))  # compile
        def loop(n):
            nonlocal key
            a = jnp.zeros((), jnp.int32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                a = blk(a, sk, *args)
            return int(a)
        loop(1)  # warm
        t0 = time.perf_counter(); loop(1); small = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(NB + 1)
        big = time.perf_counter() - t0
        ms = max(big - small, 1e-9) / (NB * reps) * 1e3
        log(f"{label}: {ms * per_iter_scale:.3f} ms/step-equivalent "
            f"(small {small * 1e3:.1f} ms, big {big * 1e3:.1f} ms)")
        return ms * per_iter_scale

    # --- A: sampling, scan of per-step bodies (current bench shape) ----
    def sample_body(b):
        def body(acc, key, indptr, indices, feats):
            sk, pk = jax.random.split(key)
            seeds = jax.random.randint(pk, (b,), 0, NUM_NODES, jnp.int32)
            s = multihop_uniform(sk, indptr, indices, seeds, FANOUTS,
                                 dedup=False,
                                 indices2d=indices.reshape(-1, 128),
                                 max_degree=max_degree, hub_frac=hub_frac)
            return acc + jnp.sum(s.levels[-1]).astype(jnp.int32)
        return body

    def scan_block(body, reps):
        @jax.jit
        def run(acc, key, indptr, indices, feats):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i), indptr,
                            indices, feats), None
            acc2, _ = jax.lax.scan(step, acc,
                                   jnp.arange(reps, dtype=jnp.int32))
            return acc2
        return run

    args = (indptr_j, indices_j, feats)
    ms_a = timed(scan_block(sample_body(BATCH), REPS), args,
                 f"sample scan {REPS}x B={BATCH}", REPS)
    # --- B: sampling, flattened S*B batch (1/S as many scan iters) -----
    ms_b = timed(scan_block(sample_body(S * BATCH), REPS // S), args,
                 f"sample flat B={S * BATCH}", REPS // S,
                 per_iter_scale=1.0 / S)

    # --- C: feature gather, per-step size vs flattened ------------------
    NIN = BATCH * (FANOUTS[0] + 1) * (FANOUTS[1] + 1)  # 124k input nodes

    def gather_body(rows):
        def body(acc, key, indptr, indices, feats):
            ids = jax.random.randint(key, (rows,), 0, NUM_NODES, jnp.int32)
            x = feats[ids]
            return acc + jnp.sum(x).astype(jnp.float32).astype(jnp.int32)
        return body

    ms_c = timed(scan_block(gather_body(NIN), REPS), args,
                 f"feat gather scan {REPS}x {NIN} rows", REPS)
    ms_d = timed(scan_block(gather_body(S * NIN), REPS // S), args,
                 f"feat gather flat {S * NIN} rows", REPS // S,
                 per_iter_scale=1.0 / S)

    # --- D: paired-line gather: two bf16 rows per 512B table line ------
    # feats2[i // 2] holds rows 2i, 2i+1; gather full 512B lines at the
    # line rate, select the half on the VPU.  Tables ride the args tuple
    # (closure constants are re-shipped per dispatch through the tunnel).
    npair = NUM_NODES // 2

    @jax.jit
    def make_tables(feats):
        feats2 = feats[: npair * 2].reshape(npair, 2 * FEAT_DIM)
        return feats2, feats.astype(jnp.float32)

    feats2, feats32 = jax.block_until_ready(make_tables(feats))

    def paired_body(rows):
        def body(acc, key, indptr, indices, table):
            ids = jax.random.randint(key, (rows,), 0, NUM_NODES - 1,
                                     jnp.int32)
            lines = table[jnp.minimum(ids // 2, npair - 1)]  # (rows, 256)
            lo, hi = lines[:, :FEAT_DIM], lines[:, FEAT_DIM:]
            x = jnp.where((ids % 2 == 0)[:, None], lo, hi)
            return acc + jnp.sum(x).astype(jnp.float32).astype(jnp.int32)
        return body

    args2 = (indptr_j, indices_j, feats2)
    ms_e = timed(scan_block(paired_body(NIN), REPS), args2,
                 f"paired gather scan {REPS}x {NIN} rows", REPS)
    ms_f = timed(scan_block(paired_body(S * NIN), REPS // S), args2,
                 f"paired gather flat {S * NIN} rows", REPS // S,
                 per_iter_scale=1.0 / S)

    # --- E: f32 table ramp check ---------------------------------------
    def f32_body(rows):
        def body(acc, key, indptr, indices, table):
            ids = jax.random.randint(key, (rows,), 0, NUM_NODES, jnp.int32)
            x = table[ids]
            return acc + jnp.sum(x).astype(jnp.int32)
        return body

    args32 = (indptr_j, indices_j, feats32)
    ms_g = timed(scan_block(f32_body(NIN), REPS), args32,
                 f"f32 gather scan {REPS}x {NIN} rows", REPS)
    ms_h = timed(scan_block(f32_body(S * NIN), REPS // S), args32,
                 f"f32 gather flat {S * NIN} rows", REPS // S,
                 per_iter_scale=1.0 / S)

    log(f"sample speedup {ms_a / ms_b:.2f}x, gather flat {ms_c / ms_d:.2f}x, "
        f"paired {ms_c / ms_f:.2f}x, f32-flat {ms_c / ms_h:.2f}x")
    best = min(ms_d, ms_f, ms_h)
    log(f"projected step: sample {ms_b:.2f} + gather {best:.2f} + model ~0.28"
        f" = {ms_b + best + 0.28:.2f} ms (current 2.70)")


if __name__ == "__main__":
    main()
