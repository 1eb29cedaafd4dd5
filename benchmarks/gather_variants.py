"""Microbench: feature-gather formulations for the sampled batch.

The headline step's feature gather (113,664 rows x 256B from a 2.45M x
128 bf16 table) measures ~1.2 ms — above the ~0.5 ms row-rate wall
(227M rows/s, PERF_NOTES.md).  This probes where the gap comes from:
the mask+clip epilogue, the bf16 row width, or the gather itself.

    PYTHONPATH=/root/repo:/root/.axon_site timeout 580 python \
        benchmarks/gather_variants.py
"""

import time

import numpy as np

NUM_NODES = 2_449_029
FEAT_DIM = 128
NUM_IDS = 113_664
ITERS = 50
REPS = 20


def log(msg):
    print(f"[gv] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    @jax.jit
    def make():
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.bfloat16)
        return feats, feats.astype(jnp.float32)

    feats, feats32 = jax.block_until_ready(make())
    log("data ready")

    def scan_reps(body):
        # feats passed as an ARGUMENT (a closure would embed a 600MB
        # constant -> minutes through the tunnel)
        def run(acc, key, f):
            def step(c, i):
                ids = jax.random.randint(
                    jax.random.fold_in(key, i), (NUM_IDS,), -1, NUM_NODES,
                    jnp.int32)
                return c + body(ids, f), None
            c, _ = jax.lax.scan(step, acc, jnp.arange(REPS, dtype=jnp.int32))
            return c
        return jax.jit(run)

    variants = {
        # ids only (gather excluded): baseline for the scan + randint cost
        "ids-only           ": (
            lambda ids, f: jnp.sum(ids).astype(jnp.float32), feats),
        # current formulation in bench.py train_step
        "where+clip (bench) ": (
            lambda ids, f: jnp.sum(
                jnp.where((ids >= 0)[:, None], f[jnp.clip(ids, 0)], 0)
            ).astype(jnp.float32), feats),
        # raw clip gather, no mask epilogue
        "clip only          ": (
            lambda ids, f: jnp.sum(f[jnp.clip(ids, 0)]).astype(jnp.float32),
            feats),
        # one-pass fill-mode gather (OOB -> 0); pads are -1 (OOB)
        "take mode=fill     ": (
            lambda ids, f: jnp.sum(
                f.at[ids].get(mode="fill", fill_value=0)
            ).astype(jnp.float32), feats),
        # f32 table (rows 512B): is the wall bytes or rows?
        "clip f32 table     ": (
            lambda ids, f: jnp.sum(f[jnp.clip(ids, 0)]).astype(jnp.float32),
            feats32),
        # bitcast trick: view bf16 (N,128) as i32 (N,64), gather, view back
        "clip i32-view      ": (
            lambda ids, f: jnp.sum(
                jax.lax.bitcast_convert_type(
                    jax.lax.bitcast_convert_type(
                        f.reshape(NUM_NODES, 64, 2), jnp.int32
                    )[jnp.clip(ids, 0)],
                    jnp.bfloat16).reshape(NUM_IDS, FEAT_DIM)
            ).astype(jnp.float32), feats),
        # sorted gather (locality probe): sort ids, gather, sum (unsort
        # not needed for the sum; measures best-case sorted row access)
        "sort ids + gather  ": (
            lambda ids, f: jnp.sum(
                f[jnp.clip(jnp.sort(ids), 0)]).astype(jnp.float32), feats),
    }

    key = jax.random.PRNGKey(0)

    for name, (body, table) in variants.items():
        prog = scan_reps(body)

        def loop(n, prog=prog, table=table):
            nonlocal key
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                key, sk = jax.random.split(key)
                acc = prog(acc, sk, table)
            return float(acc)

        loop(2)
        t0 = time.perf_counter(); loop(2); t_small = time.perf_counter() - t0
        t0 = time.perf_counter(); loop(ITERS + 2)
        dt = max(time.perf_counter() - t0 - t_small, 1e-9)
        ms = 1e3 * dt / (ITERS * REPS)
        gbs = NUM_IDS * FEAT_DIM * 2 / (ms * 1e-3) / 1e9
        log(f"{name}: {ms:.3f} ms  ({gbs:.0f} GB/s eff @256B rows)")


if __name__ == "__main__":
    main()
