"""One-off probe: chain-timed attention forward before/after G-stacking
(round 5).  Same data + chain discipline as slab_chain_bench's
"attn fwd bits" row; H=1 full scale and mh(4) at N/2.

    timeout 580 python -m benchmarks.attn_fwd_gstack_probe
"""

import time

import numpy as np

N = 2_449_408
F = 128
DEG = 12
K = 16
R = 256
REPS = 20
OUTER = 2


def log(msg):
    print(f"[gstack] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
        SlabGraph, slab_attention_spmm, slab_attention_spmm_mh)

    nb = N // R

    @jax.jit
    def make_data():
        k = jax.random.PRNGKey(0)
        ks = jax.random.split(k, 10)
        ell = jax.random.randint(ks[0], (N, K), 0, 3 * R, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ell = jnp.where(lane < DEG, ell, -1)
        x = jax.random.normal(ks[2], (N, F), jnp.float32)
        a_d = jax.random.normal(ks[4], (N,), jnp.float32)
        a_s = jax.random.normal(ks[5], (N,), jnp.float32)
        planes = jax.random.bernoulli(ks[9], DEG / (3.0 * R), (N, 128, 8))
        w = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
        bits = jnp.sum(planes * w, axis=-1).astype(jnp.int8)
        return ell, x, a_d, a_s, bits

    ell, x, a_d, a_s, bits = jax.block_until_ready(make_data())
    base = SlabGraph(ell=ell, ell_w=None,
                     fb_src=jnp.zeros((0,), jnp.int32),
                     fb_dst=jnp.zeros((0,), jnp.int32), fb_w=None,
                     degrees=jnp.full((N,), DEG, jnp.int32),
                     num_rows=N, block_rows=R, n_blocks=nb)
    edges = N * DEG
    log(f"data ready ({edges/1e6:.1f}M edges)")

    def timed(name, step, x0, const, e=None, actual_bytes=None):
        e = e or edges

        @jax.jit
        def many(xc, *arrs):
            def body(c, i):
                return step(c, *arrs), None
            xc, _ = jax.lax.scan(body, xc,
                                 jnp.arange(REPS, dtype=jnp.int32))
            return xc

        x1 = many(x0, *const)
        float(x1.reshape(-1)[0])
        t0 = time.perf_counter()
        xc = x1
        for _ in range(OUTER):
            xc = many(xc, *const)
        float(xc.reshape(-1)[0])
        dt = max(time.perf_counter() - t0, 1e-9) / (OUTER * REPS)
        eff = e * F * 4 / dt / 1e9
        act = ""
        if actual_bytes is not None:
            gbs = actual_bytes / dt / 1e9
            act = (f" | actual {gbs:.0f} GB/s"
                   f" ({100 * gbs / 820:.0f}% of v5e peak)")
        log(f"{name}: {dt*1e3:.1f} ms -> {eff:.0f} GB/s effective{act}")
        return dt

    def attn_bits(xc, g_bits, ad, asx):
        gg = base._replace(ell_bits=g_bits)
        return slab_attention_spmm(
            gg, xc, ad, asx, interpret=False).astype(xc.dtype)

    # actual bytes H=1 (g from the cap): bits + ad lane block + as
    # margins + x slab + u + ms outputs
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import _attn_g_stack
    g = _attn_g_stack(nb, R, F, 4, 128)
    log(f"g_stack (H=1 f32) = {g}")
    amp = (g + 2) / g

    def fwd_bytes(x_item):
        return (N * 128 + N * 128 * 4 + 3 * 8 * N * 4
                + N * F * x_item * amp + N * F * 4 + N * 128 * 4)

    timed("attn fwd bits f32   ", attn_bits, x, (bits, a_d, a_s),
          actual_bytes=fwd_bytes(4))
    timed("attn fwd bits bf16-x", attn_bits, x.astype(jnp.bfloat16),
          (bits, a_d, a_s), actual_bytes=fwd_bytes(2))
    timed("attn fwd ELL  f32   ",
          lambda xc, e_, ad, asx: slab_attention_spmm(
              base._replace(ell=e_), xc, ad, asx, interpret=False),
          x, (ell, a_d, a_s))

    # mh(4) at N/2
    N2 = N // 2
    H = 4
    FH = F // H
    g2 = base._replace(ell=ell[:N2], degrees=base.degrees[:N2],
                       num_rows=N2, n_blocks=N2 // R)

    @jax.jit
    def make_mh():
        k = jax.random.PRNGKey(9)
        ks = jax.random.split(k, 2)
        return (jax.random.normal(ks[0], (N2, H), jnp.float32),
                jax.random.normal(ks[1], (N2, H), jnp.float32))

    ad_h, as_h = jax.block_until_ready(make_mh())

    def attn_mh_bits(xc, g_bits, ad, asx):
        gg = g2._replace(ell_bits=g_bits)
        out = slab_attention_spmm_mh(gg, xc.reshape(N2, H, FH), ad, asx,
                                     interpret=False)
        return out.reshape(N2, F)

    timed("attn fwd mh(4) bits (N/2)", attn_mh_bits, x[:N2],
          (bits[:N2], ad_h, as_h), e=N2 * DEG)


if __name__ == "__main__":
    main()
