"""Anatomy of the one-pass attention backward kernel (round 5): which
in-kernel phase owns the 44 ms — decode, exp/softmax VPU chain, or the
two MXU dots?  Times stripped kernel variants (identical memory
traffic, phases selectively disabled).  Timing: chained scan.
"""

import functools
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from cugraph_gnn_tpu.ops.pallas.slab_kernel import _decode_bits

N, F, DEG, R = 2_449_408, 128, 12, 256
REPS, OUTER = 20, 2
NB = N // R


def make_kernel(do_decode, do_exp, do_dots):
    def kern(bits_ref, stc_ref, as0, as1, as2, x0, x1, x2, gc_ref,
             dad_ref, dx_ref, das_ref):
        r_blk = bits_ref.shape[0]
        if do_decode:
            a = _decode_bits(bits_ref[...], r_blk)
        else:
            a = (bits_ref[...][:, :1].astype(jnp.float32)
                 * jnp.ones((r_blk, 3 * r_blk), jnp.float32))
        slab_x = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)
        as_t = jnp.concatenate([as0[...], as1[...], as2[...]], axis=1)
        blk = stc_ref[...]
        gc = gc_ref[...]
        ad = blk[:, 0:1]
        m = blk[:, 1:2]
        s = blk[:, 2:3]
        t = blk[:, 3:4]
        z = ad + as_t[0:1]
        lr = jnp.where(z >= 0, z, jnp.float32(0.2) * z)
        if do_exp:
            alpha = jnp.where(a > 0, jnp.exp(lr - m), 0.0) / s
        else:
            alpha = jnp.where(a > 0, lr - m, 0.0) / s
        if do_dots:
            gx = jax.lax.dot_general(
                gc, slab_x, dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)
            dx = jax.lax.dot_general(
                alpha, gc, dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
        else:
            gx = alpha * 2.0
            dx = jnp.concatenate([alpha[:, :F]] * 3, axis=0) * 0.5
        de = alpha * (gx - t) * jnp.where(z >= 0, 1.0, jnp.float32(0.2))
        dad_ref[...] = jnp.broadcast_to(
            jnp.sum(de, axis=1, keepdims=True), dad_ref.shape)
        dx_ref[...] = jnp.concatenate(
            [dx[o * r_blk:(o + 1) * r_blk] for o in range(3)], axis=1)
        das_ref[...] = jnp.sum(de, axis=0, keepdims=True) * jnp.ones(
            (8, 1), jnp.float32)
    return kern


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    @jax.jit
    def make():
        ks = jax.random.split(jax.random.PRNGKey(0), 6)
        x = jax.random.normal(ks[0], (N, F), jnp.float32)
        g = jax.random.normal(ks[1], (N, F), jnp.float32)
        st = jax.random.uniform(ks[2], (N, 128), jnp.float32, 1.0, 2.0)
        as_t = jax.random.normal(ks[3], (8, N), jnp.float32)
        planes = jax.random.bernoulli(ks[4], DEG / (3.0 * R), (N, 128, 8))
        w = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
        bits = jnp.sum(planes * w, axis=-1).astype(jnp.int8)
        return x, g, st, as_t, bits

    x, g, st, as_t, bits = jax.block_until_ready(make())
    print("data ready", flush=True)

    clamp = lambda o: lambda b: (jnp.clip(b + o - 1, 0, NB - 1), 0)
    clamp_c = lambda o: lambda b: (0, jnp.clip(b + o - 1, 0, NB - 1))

    def run_variant(name, do_decode, do_exp, do_dots):
        kern = make_kernel(do_decode, do_exp, do_dots)
        call = pl.pallas_call(
            kern,
            grid=(NB,),
            in_specs=[pl.BlockSpec((R, 128), lambda b: (b, 0)),
                      pl.BlockSpec((R, 128), lambda b: (b, 0))]
            + [pl.BlockSpec((8, R), clamp_c(o)) for o in range(3)]
            + [pl.BlockSpec((R, F), clamp(o)) for o in range(3)]
            + [pl.BlockSpec((R, F), lambda b: (b, 0))],
            out_specs=[pl.BlockSpec((R, 128), lambda b: (b, 0)),
                       pl.BlockSpec((R, 3 * F), lambda b: (b, 0)),
                       pl.BlockSpec((8, 3 * R), lambda b: (b, 0))],
            out_shape=[jax.ShapeDtypeStruct((N, 128), jnp.float32),
                       jax.ShapeDtypeStruct((N, 3 * F), jnp.float32),
                       jax.ShapeDtypeStruct((NB * 8, 3 * R), jnp.float32)],
        )

        def step(gc, bits, st, as_t, x):
            dad, dx3, das3 = call(bits, st, as_t, as_t, as_t, x, x, x, gc)
            return dx3[:, :F] * 0.25 + gc * 0.5

        @jax.jit
        def many(gc, *arrs):
            def body(c, i):
                return step(c, *arrs), None
            gc, _ = jax.lax.scan(body, gc,
                                 jnp.arange(REPS, dtype=jnp.int32))
            return gc

        g1 = many(g, bits, st, as_t, x)
        float(g1[0, 0])
        t0 = time.perf_counter()
        gc = g1
        for _ in range(OUTER):
            gc = many(gc, bits, st, as_t, x)
        float(gc[0, 0])
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * REPS)
        print(f"{name}: {dt*1e3:.1f} ms", flush=True)

    run_variant("full (decode+exp+dots)", True, True, True)
    run_variant("no exp               ", True, False, True)
    run_variant("no decode            ", False, True, True)
    run_variant("no dots              ", True, True, False)
    run_variant("dots only (no dec/exp)", False, False, True)


if __name__ == "__main__":
    main()
