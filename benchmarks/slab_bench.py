"""Slab SpMM TPU bench at products scale: banded graph (the RCM-ordered
real-graph case), vs the ELL composite and the segment path.

SUPERSEDED for kernel numbers by benchmarks/slab_chain_bench.py: this
harness scans a loop-invariant body, and XLA HOISTS a bare pallas_call
out of such a scan (the round-4 glue-less kernels "measured" 4.8 TB/s
here).  Numbers from this file are only honest for paths with enough
XLA glue to block hoisting (the round-2/3 kernels were; see
PERF_NOTES.md round-4 notes).

    timeout 580 python -m benchmarks.slab_bench
"""

import time

import numpy as np

N = 2_449_408          # ~products nodes, multiple of 256
F = 128
DEG = 12               # per-direction mean degree at products scale
K = 16                 # ELL width (deg <= K, all in-band)
R = 256

REPS = 5
OUTER = 4


def log(msg):
    print(f"[slab] {msg}", flush=True)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import SlabGraph, slab_spmm

    nb = N // R

    @jax.jit
    def make_data():
        # banded ELL: each row has DEG in-band neighbors (slab-local ids
        # in [0, 3R)), rest -1 padding.
        key = jax.random.PRNGKey(0)
        k1, k2 = jax.random.split(key)
        ell = jax.random.randint(k1, (N, K), 0, 3 * R, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        ell = jnp.where(lane < DEG, ell, -1)
        x = jax.random.normal(k2, (N, F), jnp.float32)
        deg = jnp.full((N,), DEG, jnp.int32)
        return ell, x, deg

    ell, x, deg = jax.block_until_ready(make_data())
    g = SlabGraph(ell=ell, ell_w=None,
                  fb_src=jnp.zeros((0,), jnp.int32),
                  fb_dst=jnp.zeros((0,), jnp.int32), fb_w=None,
                  degrees=deg, num_rows=N, block_rows=R, n_blocks=nb)
    edges = N * DEG
    log(f"data ready: {edges/1e6:.1f}M in-band edges")

    def timed(name, fn, arrays):
        @jax.jit
        def many(acc, *arrs):
            def body(c, i):
                o = fn(*arrs)
                return c + o[0, 0] + o[-1, -1] + i * 0.0, None
            acc, _ = jax.lax.scan(body, acc,
                                  jnp.arange(REPS, dtype=jnp.int32))
            return acc

        acc = jnp.zeros((), jnp.float32)
        float(many(acc, *arrays))
        t0 = time.perf_counter(); float(many(acc, *arrays))
        t_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        a = acc
        for _ in range(OUTER):
            a = many(a, *arrays)
        float(a)
        dt = max(time.perf_counter() - t0 - t_s * 0, 1e-9) / (OUTER * REPS)
        eff = edges * F * 4 / dt / 1e9
        log(f"{name}: {dt*1e3:.1f} ms -> {eff:.0f} GB/s effective")

    def run_slab_bf16(g_ell, g_x):
        gg = g._replace(ell=g_ell)
        return slab_spmm(gg, g_x, reduce="sum", compute_dtype=jnp.bfloat16,
                         interpret=False)

    def run_slab_f32(g_ell, g_x):
        gg = g._replace(ell=g_ell)
        return slab_spmm(gg, g_x, reduce="sum", compute_dtype=jnp.float32,
                         interpret=False)

    timed("slab MXU bf16", run_slab_bf16, (ell, x))
    timed("slab MXU f32 ", run_slab_f32, (ell, x))

    # bit-packed adjacency path (round 3): decode ~4 VPU passes + MXU
    # matmul instead of K compare-accumulate passes.  Density matches
    # DEG/(3R) per bit (the timing is content-independent).
    @jax.jit
    def make_bits():
        k = jax.random.PRNGKey(9)
        planes = jax.random.bernoulli(k, DEG / (3.0 * R), (N, 128, 8))
        w = (2 ** jnp.arange(8, dtype=jnp.int32))[None, None, :]
        return jnp.sum(planes * w, axis=-1).astype(jnp.int8)

    bits = jax.block_until_ready(make_bits())

    def run_slab_bits_bf16(g_bits, g_x):
        gg = g._replace(ell_bits=g_bits)
        return slab_spmm(gg, g_x, reduce="sum", compute_dtype=jnp.bfloat16,
                         interpret=False)

    def run_slab_bits_f32(g_bits, g_x):
        gg = g._replace(ell_bits=g_bits)
        return slab_spmm(gg, g_x, reduce="sum", compute_dtype=jnp.float32,
                         interpret=False)

    timed("slab bits bf16", run_slab_bits_bf16, (bits, x))
    timed("slab bits f32 ", run_slab_bits_f32, (bits, x))

    # ELL-composite reference: 62 GB/s effective (PERF_NOTES.md);
    # the per-row gather formulation is row-rate bound at ~116 GB/s.

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm

    @jax.jit
    def make_alphas():
        k = jax.random.PRNGKey(5)
        return (jax.random.normal(k, (N,), jnp.float32),
                jax.random.normal(jax.random.fold_in(k, 1), (N,),
                                  jnp.float32))

    a_d, a_s = jax.block_until_ready(make_alphas())

    def run_attn(g_ell, g_x, ad, asx):
        gg = g._replace(ell=g_ell)
        return slab_attention_spmm(gg, g_x, ad, asx, interpret=False)

    timed("slab attention", run_attn, (ell, x, a_d, a_s))

    def run_attn_bits(g_bits, g_x, ad, asx):
        gg = g._replace(ell_bits=g_bits)
        return slab_attention_spmm(gg, g_x, ad, asx, interpret=False)

    timed("slab attention bits", run_attn_bits, (bits, x, a_d, a_s))

    # -- fused attention backward (dst + transpose-src kernels) ----------
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        AttnSlabPair, slab_attention_bwd)

    @jax.jit
    def make_bwd_data():
        k = jax.random.PRNGKey(7)
        ks = jax.random.split(k, 5)
        t_ell = jax.random.randint(ks[0], (N, K), 0, 3 * R, jnp.int32)
        lane = jax.lax.broadcasted_iota(jnp.int32, (N, K), 1)
        t_ell = jnp.where(lane < DEG, t_ell, -1)
        gout = jax.random.normal(ks[1], (N, F), jnp.float32)
        m = jax.random.normal(ks[2], (N,), jnp.float32)
        s = jax.random.uniform(ks[3], (N,), jnp.float32, 1.0, 8.0)
        t = jax.random.normal(ks[4], (N,), jnp.float32)
        return t_ell, gout, m, s, t

    t_ell, gout, m_st, s_st, t_st = jax.block_until_ready(make_bwd_data())

    def run_attn_bwd(g_ell, g_tell, g_x, ad, asx, gm, gs, gt, gg_out):
        pair = AttnSlabPair(fwd=g._replace(ell=g_ell), t_ell=g_tell)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg_out, interpret=False)
        return dx + dad[:, None] + das[:, None]

    timed("slab attn bwd ", run_attn_bwd,
          (ell, t_ell, x, a_d, a_s, m_st, s_st, t_st, gout))

    def run_attn_bwd_bits(g_bits, g_tbits, g_x, ad, asx, gm, gs, gt,
                          gg_out):
        pair = AttnSlabPair(fwd=g._replace(ell_bits=g_bits),
                            t_ell=t_ell, t_bits=g_tbits)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg_out, interpret=False)
        return dx + dad[:, None] + das[:, None]

    timed("slab attn bwd bits", run_attn_bwd_bits,
          (bits, bits, x, a_d, a_s, m_st, s_st, t_st, gout))

    def run_attn_bwd_bits_bf16(g_bits, g_tbits, g_x, ad, asx, gm, gs, gt,
                               gg_out):
        import jax.numpy as jnp
        pair = AttnSlabPair(fwd=g._replace(ell_bits=g_bits),
                            t_ell=t_ell, t_bits=g_tbits)
        dx, dad, das = slab_attention_bwd(pair, g_x, ad, asx, gm, gs, gt,
                                          gg_out, interpret=False,
                                          compute_dtype=jnp.bfloat16)
        return dx + dad[:, None] + das[:, None]

    timed("slab attn bwd bits bf16", run_attn_bwd_bits_bf16,
          (bits, bits, x, a_d, a_s, m_st, s_st, t_st, gout))

    # -- multi-head: all H heads in one kernel pass vs a per-head loop.
    # H * FH = F keeps total feature bytes identical, so the delta is
    # pure amortization of the one-hot adjacency build + dispatches.
    H = 4
    FH = F // H
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm_mh
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        slab_attention_bwd_mh)

    @jax.jit
    def make_mh():
        k = jax.random.PRNGKey(9)
        ks = jax.random.split(k, 5)
        return (jax.random.normal(ks[0], (N, H), jnp.float32),
                jax.random.normal(ks[1], (N, H), jnp.float32),
                jax.random.normal(ks[2], (N, H), jnp.float32),
                jax.random.uniform(ks[3], (N, H), jnp.float32, 1.0, 8.0),
                jax.random.normal(ks[4], (N, H), jnp.float32))

    ad_h, as_h, m_h, s_h, t_h = jax.block_until_ready(make_mh())

    def run_attn_mh(g_ell, g_x, ad, asx):
        gg = g._replace(ell=g_ell)
        out = slab_attention_spmm_mh(gg, g_x.reshape(N, H, FH), ad, asx,
                                     interpret=False)
        return out.reshape(N, F)

    def run_attn_headloop(g_ell, g_x, ad, asx):
        gg = g._replace(ell=g_ell)
        xh = g_x.reshape(N, H, FH)
        return jnp.concatenate(
            [slab_attention_spmm(gg, xh[:, h], ad[:, h], asx[:, h],
                                 interpret=False) for h in range(H)],
            axis=1)

    timed("attn mh(4) fused", run_attn_mh, (ell, x, ad_h, as_h))
    timed("attn mh(4) loop ", run_attn_headloop, (ell, x, ad_h, as_h))

    # bwd at HALF scale: the scan carry holds five (N, H) stat arrays
    # whose (8,128)-tile padding at full N pushes the full-graph mh bwd
    # program past the 16G HBM (fair comparison: both variants at N2).
    N2 = N // 2
    g2 = g._replace(ell=ell[:N2], degrees=deg[:N2], num_rows=N2,
                    n_blocks=N2 // R)
    edges2 = N2 * DEG

    def run_attn_bwd_mh(g_ell, g_tell, g_x, ad, asx, gm, gs, gt, gg_out):
        pair = AttnSlabPair(fwd=g2._replace(ell=g_ell), t_ell=g_tell)
        dx, dad, das = slab_attention_bwd_mh(
            pair, g_x.reshape(N2, H, FH), ad, asx, gm, gs, gt,
            gg_out.reshape(N2, H, FH), interpret=False)
        return dx.reshape(N2, F) + dad[:, :1] + das[:, :1]

    def run_attn_bwd_headloop(g_ell, g_tell, g_x, ad, asx, gm, gs, gt,
                              gg_out):
        pair = AttnSlabPair(fwd=g2._replace(ell=g_ell), t_ell=g_tell)
        xh = g_x.reshape(N2, H, FH)
        gh = gg_out.reshape(N2, H, FH)
        outs = []
        for h in range(H):
            dx, dad, das = slab_attention_bwd(
                pair, xh[:, h], ad[:, h], asx[:, h], gm[:, h], gs[:, h],
                gt[:, h], gh[:, h], interpret=False)
            outs.append(dx + dad[:, None] + das[:, None])
        return jnp.concatenate(outs, axis=1)

    edges = edges2  # timed() reports effective GB/s from `edges`
    timed("attn bwd mh(4) fused (N/2)", run_attn_bwd_mh,
          (ell[:N2], t_ell[:N2], x[:N2], ad_h[:N2], as_h[:N2], m_h[:N2],
           s_h[:N2], t_h[:N2], gout[:N2]))
    timed("attn bwd mh(4) loop  (N/2)", run_attn_bwd_headloop,
          (ell[:N2], t_ell[:N2], x[:N2], ad_h[:N2], as_h[:N2], m_h[:N2],
           s_h[:N2], t_h[:N2], gout[:N2]))

    def run_attn_bwd_mh_bits(g_bits, g_x, ad, asx, gm, gs, gt, gg_out):
        pair = AttnSlabPair(fwd=g2._replace(ell_bits=g_bits),
                            t_ell=t_ell[:N2], t_bits=g_bits)
        dx, dad, das = slab_attention_bwd_mh(
            pair, g_x.reshape(N2, H, FH), ad, asx, gm, gs, gt,
            gg_out.reshape(N2, H, FH), interpret=False)
        return dx.reshape(N2, F) + dad[:, :1] + das[:, :1]

    timed("attn bwd mh(4) bits  (N/2)", run_attn_bwd_mh_bits,
          (bits[:N2], x[:N2], ad_h[:N2], as_h[:N2], m_h[:N2],
           s_h[:N2], t_h[:N2], gout[:N2]))

    def run_attn_bwd_mh_bits_bf16(g_bits, g_x, ad, asx, gm, gs, gt,
                                  gg_out):
        pair = AttnSlabPair(fwd=g2._replace(ell_bits=g_bits),
                            t_ell=t_ell[:N2], t_bits=g_bits)
        dx, dad, das = slab_attention_bwd_mh(
            pair, g_x.reshape(N2, H, FH), ad, asx, gm, gs, gt,
            gg_out.reshape(N2, H, FH), interpret=False,
            compute_dtype=jnp.bfloat16)
        return dx.reshape(N2, F) + dad[:, :1] + das[:, :1]

    timed("attn bwd mh(4) bits bf16 (N/2)", run_attn_bwd_mh_bits_bf16,
          (bits[:N2], x[:N2], ad_h[:N2], as_h[:N2], m_h[:N2],
           s_h[:N2], t_h[:N2], gout[:N2]))


if __name__ == "__main__":
    main()
