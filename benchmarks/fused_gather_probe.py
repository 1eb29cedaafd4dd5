"""Probe: the bench step's 10 per-step feature gathers (unrolled
independent ops, 113,664 rows each) vs ONE flattened (REPS*113,664)-row
gather vs the in-scan form.  gather_wall.py showed the row gather is
row-rate bound with no upward batch ramp beyond ~100k rows, but the
per-op dispatch/ramp overhead of 10 separate ops is untested.

    timeout 580 python -m benchmarks.fused_gather_probe
"""

import time

import numpy as np

N = 2_449_029
F = 128
ROWS = 113_664   # bench hop-level input size per step
REPS = 10
OUTER = 20


def log(msg):
    print(f"[fgather] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    @jax.jit
    def make():
        k = jax.random.PRNGKey(0)
        feats = jax.random.normal(jax.random.PRNGKey(1), (N, F),
                                  jnp.float32)
        ids = jax.random.randint(k, (REPS, ROWS), 0, N, jnp.int32)
        return feats, ids

    feats, ids = jax.block_until_ready(make())

    def timed(name, fn):
        @jax.jit
        def many(acc, feats, ids):
            for i in range(OUTER):
                ids = (ids + acc.astype(jnp.int32)) % N   # dependent chain
                x = fn(feats, ids)
                acc = acc + jnp.sum(x[:, :, :1].astype(jnp.float32))
            return acc

        a = many(jnp.zeros((), jnp.float32), feats, ids)
        float(a)
        t0 = time.perf_counter()
        float(many(jnp.zeros((), jnp.float32), feats, ids))
        dt = (time.perf_counter() - t0) / (OUTER * REPS)
        rate = ROWS / dt / 1e6
        log(f"{name}: {dt*1e3:.3f} ms/step ({rate:.0f}M rows/s)")

    def unrolled(feats, ids):
        return jnp.stack([
            feats[jnp.clip(ids[i], 0)].astype(jnp.bfloat16)
            for i in range(REPS)])

    def fused(feats, ids):
        flat = feats[jnp.clip(ids.reshape(-1), 0)].astype(jnp.bfloat16)
        return flat.reshape(REPS, ROWS, F)

    def scanned(feats, ids):
        def body(c, row):
            return c, feats[jnp.clip(row, 0)].astype(jnp.bfloat16)
        _, out = jax.lax.scan(body, 0, ids)
        return out

    timed("unrolled 10x113k", unrolled)
    timed("fused 1x1.14M   ", fused)
    timed("scan 10x113k    ", scanned)


if __name__ == "__main__":
    main()
