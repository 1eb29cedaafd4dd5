"""Why does the bench's feature gather run slower than the uniform-ids
probe?  Isolate: id distribution (uniform vs degree-biased vs real
sampled frontier), scan context, and the where/cast epilogue.
"""

import sys
import time

import numpy as np

sys.path.insert(0, ".")


def log(m):
    print(f"[idsprobe] {m}", file=sys.stderr, flush=True)


NUM_NODES = 2_449_029
FEAT_DIM = 128
NIN = 123_904
REPS = 10
NB = 10


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    host_rng = np.random.default_rng(0)
    deg = np.minimum(np.floor(25.0 * host_rng.random(NUM_NODES) ** -0.5),
                     17_000).astype(np.int64)
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    num_edges = int(indptr_np[-1])
    indptr_j = jnp.asarray(indptr_np)

    @jax.jit
    def make(indptr):
        feats = jax.random.normal(jax.random.PRNGKey(1),
                                  (NUM_NODES, FEAT_DIM), jnp.float32)
        return feats

    feats = jax.block_until_ready(make(indptr_j))
    log("data ready")

    def timed(body, args, label):
        @jax.jit
        def blk(acc, key, *a):
            def step(c, i):
                return body(c, jax.random.fold_in(key, i), *a), None
            acc2, _ = jax.lax.scan(step, acc,
                                   jnp.arange(REPS, dtype=jnp.int32))
            return acc2
        acc = jnp.zeros((), jnp.int32)
        key = jax.random.PRNGKey(7)
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

    # A: uniform ids, plain gather + sum
    def a_body(acc, key, indptr, feats):
        ids = jax.random.randint(key, (NIN,), 0, NUM_NODES, jnp.int32)
        x = feats[ids]
        return acc + jnp.sum(x).astype(jnp.int32)

    # B: degree-biased ids (edge-slot draw + searchsorted)
    def b_body(acc, key, indptr, feats):
        slot = jax.random.randint(key, (NIN,), 0, num_edges, jnp.int32)
        ids = (jnp.searchsorted(indptr, slot, side="right") - 1
               ).astype(jnp.int32)
        x = feats[ids]
        return acc + jnp.sum(x).astype(jnp.int32)

    # C: uniform ids + the bench's where/clip/bf16-cast epilogue
    def c_body(acc, key, indptr, feats):
        ids = jax.random.randint(key, (NIN,), 0, NUM_NODES, jnp.int32)
        ids = jnp.where(ids % 97 == 0, -1, ids)  # some padding slots
        x = jnp.where((ids >= 0)[:, None], feats[jnp.clip(ids, 0)],
                      0).astype(jnp.bfloat16)
        return acc + jnp.sum(x).astype(jnp.float32).astype(jnp.int32)

    # D: degree-biased + epilogue (the bench's exact shape)
    def d_body(acc, key, indptr, feats):
        slot = jax.random.randint(key, (NIN,), 0, num_edges, jnp.int32)
        ids = (jnp.searchsorted(indptr, slot, side="right") - 1
               ).astype(jnp.int32)
        x = jnp.where((ids >= 0)[:, None], feats[jnp.clip(ids, 0)],
                      0).astype(jnp.bfloat16)
        return acc + jnp.sum(x).astype(jnp.float32).astype(jnp.int32)

    args = (indptr_j, feats)
    timed(a_body, args, "A uniform+sum        ")
    timed(b_body, args, "B degree-biased      ")
    timed(c_body, args, "C uniform+epilogue   ")
    timed(d_body, args, "D biased+epilogue    ")


if __name__ == "__main__":
    main()
