"""Attribution probe for the one-pass attention backward kernel:
times variants with individual pieces disabled to locate the bound
(DMA / decode / exp / reductions / matmuls / epilogue).

    timeout 580 python -m benchmarks.attn_bwd_probe
"""

import functools
import time

import numpy as np

N = 2_449_408
F = 128
DEG = 12
R = 256
REPS = 5
OUTER = 4


def log(msg):
    print(f"[probe] {msg}", flush=True)


def main(only_full=False):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from jax.experimental import pallas as pl

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import _decode_bits

    nb = N // R
    n_pad = nb * R

    @jax.jit
    def make_data():
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 6)
        x = jax.random.normal(ks[0], (n_pad + 2 * R, F), jnp.float32)
        g = jax.random.normal(ks[1], (n_pad + 2 * R, F), jnp.float32)
        st = jax.random.uniform(ks[2], (n_pad + 2 * R, 128), jnp.float32,
                                1.0, 2.0)
        as_t = jax.random.normal(ks[3], (8, n_pad + 2 * R), jnp.float32)
        planes = jax.random.bernoulli(ks[4], DEG / (3.0 * R), (n_pad, 128, 8))
        w = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
        bits = jnp.sum(planes * w, axis=-1).astype(jnp.int8)
        return x, g, st, as_t, bits

    x_pad, g_pad, st_pad, as_t, bits = jax.block_until_ready(make_data())
    edges = N * DEG
    log("data ready")

    def kern(flags, bits_ref, stc_ref, as0, as1, as2, x0, x1, x2, gc_ref,
             dad_ref, dx_ref, das_ref):
        r_blk = R
        ns = jnp.float32(0.2)
        if flags["decode"]:
            a = _decode_bits(bits_ref[...], r_blk)
        else:
            a = jnp.zeros((r_blk, 3 * r_blk), jnp.float32) \
                + bits_ref[...].astype(jnp.int32)[0:1, 0:1] \
                .astype(jnp.float32)
        slab_x = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)
        as_c = jnp.concatenate([as0[...], as1[...], as2[...]], axis=1)
        blk = stc_ref[...]
        gc = gc_ref[...]
        ad = blk[:, 0:1]
        m = blk[:, 1:2]
        s = blk[:, 2:3]
        t = blk[:, 3:4]
        as_row = as_c[0:1]
        z = ad + as_row
        if flags["exp"]:
            lr = jnp.where(z >= 0, z, ns * z)
            alpha = jnp.where(a > 0, jnp.exp(lr - m), 0.0) / s
        else:
            alpha = a * z
        if flags["gx"]:
            gx = jax.lax.dot_general(
                gc, slab_x, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            gx = jnp.zeros((r_blk, 3 * r_blk), jnp.float32) + slab_x[0, 0]
        de = alpha * (gx - t) * jnp.where(z >= 0, 1.0, ns)
        if flags["dad"]:
            dad = jnp.sum(de, axis=1, keepdims=True)
        else:
            dad = de[:, 0:1]
        dad_ref[...] = jnp.broadcast_to(dad, dad_ref.shape)
        if flags["dx"]:
            dxp = jax.lax.dot_general(
                alpha, gc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            dxp = jnp.zeros((3 * r_blk, F), jnp.float32) + alpha[0, 0]
        dx_ref[...] = jnp.concatenate(
            [dxp[o * r_blk:(o + 1) * r_blk] for o in range(3)], axis=1)
        if flags["das"]:
            das = jnp.sum(de, axis=0, keepdims=True)
        else:
            das = de[0:1]
        das_ref[...] = jnp.broadcast_to(das, das_ref.shape)

    def build(flags):
        slab_specs = lambda width: [
            pl.BlockSpec((R, width), lambda b, o=o: (b + o, 0))
            for o in range(3)]
        as_specs = [pl.BlockSpec((8, R), lambda b, o=o: (0, b + o))
                    for o in range(3)]

        def run(bits_a, st_a, as_a, x_a, g_a):
            return pl.pallas_call(
                functools.partial(kern, flags),
                grid=(nb,),
                in_specs=[pl.BlockSpec((R, 128), lambda b: (b, 0)),
                          pl.BlockSpec((R, 128), lambda b: (b + 1, 0))]
                + as_specs + slab_specs(F)
                + [pl.BlockSpec((R, F), lambda b: (b + 1, 0))],
                out_specs=[pl.BlockSpec((R, 128), lambda b: (b, 0)),
                           pl.BlockSpec((R, 3 * F), lambda b: (b, 0)),
                           pl.BlockSpec((8, 3 * R), lambda b: (b, 0))],
                out_shape=[
                    jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                    jax.ShapeDtypeStruct((n_pad, 3 * F), jnp.float32),
                    jax.ShapeDtypeStruct((nb * 8, 3 * R), jnp.float32)],
                interpret=False,
            )(bits_a, st_a, as_a, as_a, as_a, x_a, x_a, x_a, g_a)
        return run

    def timed(name, fn):
        @jax.jit
        def many(acc, *arrs):
            def body(c, i):
                o1, o2, o3 = fn(*arrs)
                return c + o1[0, 0] + o2[-1, -1] + o3[0, 0] + i * 0.0, None
            acc, _ = jax.lax.scan(body, acc,
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        arrays = (bits, st_pad, as_t, x_pad, g_pad)
        acc = jnp.zeros((), jnp.float32)
        float(many(acc, *arrays))
        t0 = time.perf_counter()
        a = acc
        for _ in range(OUTER):
            a = many(a, *arrays)
        float(a)
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * REPS)
        eff = edges * F * 4 / dt / 1e9
        log(f"{name}: {dt*1e3:.1f} ms -> {eff:.0f} GB/s effective")

    full = dict(decode=True, exp=True, gx=True, dad=True, dx=True,
                das=True)
    if only_full:
        timed("full             ", build(full))
        return
    timed("full             ", build(full))
    for piece in ("decode", "exp", "gx", "dad", "dx", "das"):
        f = dict(full)
        f[piece] = False
        timed(f"no {piece:14s}", build(f))
    none = {k: False for k in full}
    timed("dma only         ", build(none))


def reps_scaling():
    """Is the scan body hoisted? Compare per-iter cost at REPS=1 vs 5:
    ~equal per-iter cost means no hoisting; 5x cheaper per-iter at
    REPS=5 means the loop-invariant kernel was hoisted (then scan-based
    numbers are per-dispatch, not per-iteration)."""
    global REPS
    for r in (1, 5):
        REPS = r
        log(f"--- REPS={r} ---")
        main(only_full=True)


if __name__ == "__main__":
    import sys
    if len(sys.argv) > 1 and sys.argv[1] == "scaling":
        reps_scaling()
    else:
        main()
