"""Backward pass of the fused slab attention kernel
(ops/pallas/slab_attn_grad.py): gradients vs jax autodiff of the
segment-op reference, on band-only and mixed (band + fallback) graphs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.native import build_csr
from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
    build_attention_slab_pair, differentiable_slab_attention)
from tests.test_slab_spmm import make_graph


def _ref_attention(indptr, indices, negative_slope=0.2):
    """Pure segment-op attention aggregate, differentiable by jax."""
    n = len(indptr) - 1
    rows = jnp.asarray(np.repeat(np.arange(n), np.diff(indptr)), jnp.int32)
    cols = jnp.asarray(indices, jnp.int32)

    def f(x, a_d, a_s):
        e = a_d[rows] + a_s[cols]
        e = jnp.where(e >= 0, e, negative_slope * e)
        m = jax.ops.segment_max(e, rows, num_segments=n)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(e - m[rows])
        s = jax.ops.segment_sum(p, rows, num_segments=n)
        u = jax.ops.segment_sum(p[:, None] * x[cols], rows, num_segments=n)
        return u / jnp.maximum(s, 1e-16)[:, None]

    return f


def _check_grads(n, f, src, dst, block_rows, max_k, seed, tol=2e-4):
    indptr, indices, _ = build_csr(dst, src, n)
    pair = build_attention_slab_pair(indptr, indices, block_rows=block_rows,
                                     max_k=max_k)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))

    fn = differentiable_slab_attention(pair)
    ref = _ref_attention(indptr, indices)

    # forward parity first
    np.testing.assert_allclose(np.asarray(fn(x, a_d, a_s)),
                               np.asarray(ref(x, a_d, a_s)),
                               rtol=tol, atol=tol)

    loss = lambda h: lambda *args: jnp.sum(h(*args) * g)
    got = jax.grad(loss(fn), argnums=(0, 1, 2))(x, a_d, a_s)
    want = jax.grad(loss(ref), argnums=(0, 1, 2))(x, a_d, a_s)
    for gi, wi, name in zip(got, want, ("dx", "dalpha_dst", "dalpha_src")):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   rtol=tol, atol=tol, err_msg=name)
    return pair


def test_attn_grad_band_only():
    rng = np.random.default_rng(10)
    n = 384
    src, dst = make_graph(n, 5, 50, rng)
    # boundary clipping makes nodes 0 / n-1 in-degree hubs that spill the
    # symmetric transpose cap — band fraction is high but not 1.0
    pair = _check_grads(n, 64, src, dst, block_rows=128, max_k=16, seed=0)
    assert pair.fwd.band_fraction > 0.9


def test_attn_grad_mixed_band_fallback():
    """Out-of-band + transpose-cap-overflow edges exercise the segment
    fallback gradients and the symmetric split."""
    rng = np.random.default_rng(11)
    n = 500
    src, dst = make_graph(n, 6, 90, rng, frac_far=0.25)
    # hub column: many rows attend to node 250 -> transpose cap spills
    hub_dst = np.clip(250 + rng.integers(-90, 91, 40), 0, n - 1).astype(np.int32)
    src = np.concatenate([src, np.full(40, 250, np.int32)])
    dst = np.concatenate([dst, hub_dst])
    pair = _check_grads(n, 128, src, dst, block_rows=128, max_k=8, seed=1)
    assert 0.0 < pair.fwd.band_fraction < 1.0


def test_attn_pair_partitions_all_edges():
    """Band + fallback together cover every edge exactly once.  With
    bit planes (3R <= 1024) no transpose structures are built (the
    one-pass backward needs only the forward orientation — ADVICE r4);
    without bits the transpose ELL covers exactly the band edge set."""
    rng = np.random.default_rng(12)
    n = 300
    src, dst = make_graph(n, 5, 60, rng, frac_far=0.2)
    indptr, indices, _ = build_csr(dst, src, n)
    pair = build_attention_slab_pair(indptr, indices, block_rows=128, max_k=8)
    g = pair.fwd
    ell = np.asarray(g.ell)
    n_band = int((ell >= 0).sum())
    n_fb = int((np.asarray(g.fb_src) >= 0).sum())
    assert n_band + n_fb == len(indices)
    assert g.ell_bits is not None
    assert pair.t_ell is None and pair.t_bits is None

    # no-bits split (3R > 1024): symmetric partition with a matching
    # transpose ELL
    pair2 = build_attention_slab_pair(indptr, indices, block_rows=512,
                                      max_k=8)
    g2 = pair2.fwd
    assert g2.ell_bits is None
    ell2 = np.asarray(g2.ell)
    n_band2 = int((ell2 >= 0).sum())
    n_fb2 = int((np.asarray(g2.fb_src) >= 0).sum())
    assert n_band2 + n_fb2 == len(indices)
    assert int((np.asarray(pair2.t_ell) >= 0).sum()) == n_band2
    r_blk = g2.block_rows
    fr, fk = np.nonzero(ell2 >= 0)
    f_edges = sorted(zip(
        fr.tolist(),
        (ell2[fr, fk] + (fr // r_blk) * r_blk - r_blk).tolist()))
    t = np.asarray(pair2.t_ell)
    tr, tk = np.nonzero(t >= 0)
    t_edges = sorted(zip(
        (t[tr, tk] + (tr // r_blk) * r_blk - r_blk).tolist(),
        tr.tolist()))
    assert f_edges == t_edges


def _check_mh(n, f, heads, src, dst, block_rows, max_k, seed, tol=2e-4):
    """Multi-head fused path == stacked single-head paths == autodiff
    of the segment reference, forward and all three gradients."""
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        differentiable_slab_attention_mh)
    indptr, indices, _ = build_csr(dst, src, n)
    pair = build_attention_slab_pair(indptr, indices, block_rows=block_rows,
                                     max_k=max_k)
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, heads)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, heads, f)).astype(np.float32))

    fn_mh = differentiable_slab_attention_mh(pair)
    fn_sh = differentiable_slab_attention(pair)
    ref1 = _ref_attention(indptr, indices)

    out_mh = fn_mh(x, a_d, a_s)
    for h in range(heads):
        np.testing.assert_allclose(
            np.asarray(out_mh[:, h]),
            np.asarray(fn_sh(x[:, h], a_d[:, h], a_s[:, h])),
            rtol=tol, atol=tol, err_msg=f"fwd head {h}")

    loss = lambda fn: lambda *a: jnp.sum(fn(*a) * g)
    got = jax.grad(loss(fn_mh), argnums=(0, 1, 2))(x, a_d, a_s)
    ref_stack = lambda x, a_d, a_s: jnp.stack(
        [ref1(x[:, h], a_d[:, h], a_s[:, h]) for h in range(heads)], axis=1)
    want = jax.grad(loss(ref_stack), argnums=(0, 1, 2))(x, a_d, a_s)
    for gi, wi, name in zip(got, want, ("dx", "dalpha_dst", "dalpha_src")):
        np.testing.assert_allclose(np.asarray(gi), np.asarray(wi),
                                   rtol=tol, atol=tol, err_msg=name)
    return pair


def test_attn_mh_band_only():
    rng = np.random.default_rng(20)
    n = 384
    src, dst = make_graph(n, 5, 50, rng)
    pair = _check_mh(n, 16, 4, src, dst, block_rows=128, max_k=16, seed=2)
    assert pair.fwd.band_fraction > 0.9


def test_attn_mh_mixed_band_fallback():
    rng = np.random.default_rng(21)
    n = 500
    src, dst = make_graph(n, 6, 90, rng, frac_far=0.25)
    hub_dst = np.clip(250 + rng.integers(-90, 91, 40), 0, n - 1).astype(
        np.int32)
    src = np.concatenate([src, np.full(40, 250, np.int32)])
    dst = np.concatenate([dst, hub_dst])
    pair = _check_mh(n, 8, 8, src, dst, block_rows=128, max_k=8, seed=3)
    assert 0.0 < pair.fwd.band_fraction < 1.0


def test_attn_mh_head_cap():
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        MAX_PACKED_HEADS, slab_attention_bwd_mh)
    rng = np.random.default_rng(22)
    n, f, h = 128, 4, MAX_PACKED_HEADS + 1
    src, dst = make_graph(n, 3, 20, rng)
    indptr, indices, _ = build_csr(dst, src, n)
    pair = build_attention_slab_pair(indptr, indices, block_rows=128)
    z = jnp.zeros
    with pytest.raises(ValueError, match="heads"):
        slab_attention_bwd_mh(pair, z((n, h, f)), z((n, h)), z((n, h)),
                              z((n, h)), jnp.ones((n, h)), z((n, h)),
                              z((n, h, f)))


def test_attn_grad_under_jit():
    rng = np.random.default_rng(13)
    n, f = 256, 32
    src, dst = make_graph(n, 4, 40, rng)
    indptr, indices, _ = build_csr(dst, src, n)
    pair = build_attention_slab_pair(indptr, indices, block_rows=128)
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    fn = differentiable_slab_attention(pair)

    @jax.jit
    def step(x, a_d, a_s):
        return jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                        argnums=(0, 1, 2))(x, a_d, a_s)

    eager = jax.grad(lambda *a: jnp.sum(fn(*a) ** 2),
                     argnums=(0, 1, 2))(x, a_d, a_s)
    jitted = step(x, a_d, a_s)
    for e, j in zip(eager, jitted):
        np.testing.assert_allclose(np.asarray(e), np.asarray(j),
                                   rtol=1e-5, atol=1e-5)
