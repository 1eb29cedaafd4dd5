"""Distributed full-batch slab SpMM (ops/dist_full_batch.py): sharded
halo-exchange aggregation must match the single-device path exactly,
forward and backward, including fallback (off-band) edges."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from cugraph_gnn_tpu.native import build_csr
from cugraph_gnn_tpu.ops.dist_full_batch import DistFullBatchGraph
from cugraph_gnn_tpu.ops.full_batch import FullBatchGraph
from cugraph_gnn_tpu.parallel import STORE_AXIS
from tests.test_slab_spmm import make_graph


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()[:8]), (STORE_AXIS,))


@pytest.mark.parametrize("frac_far", [0.0, 0.25])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_dist_spmm_matches_single(mesh, frac_far, reduce):
    rng = np.random.default_rng(7)
    n, f = 900, 32
    src, dst = make_graph(n, 5, 60, rng, frac_far=frac_far)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=128)
    fbg = FullBatchGraph(indptr, indices, reorder="none", block_rows=128,
                         min_band_fraction=0.0)
    assert dfbg.band_fraction == pytest.approx(fbg.band_fraction)
    x = rng.standard_normal((n, f)).astype(np.float32)
    out = dfbg.unshard(dfbg.spmm(dfbg.shard(x), reduce=reduce))
    want = np.asarray(fbg.spmm(jnp.asarray(x), reduce=reduce))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("frac_far", [0.0, 0.25])
def test_dist_spmm_weighted_matches_single(mesh, frac_far):
    """Weighted sharded aggregation == single-device weighted slab,
    forward and gradient (weights ride the ELL + fallback layouts)."""
    rng = np.random.default_rng(17)
    n, f = 700, 16
    src, dst = make_graph(n, 5, 60, rng, frac_far=frac_far)
    w = rng.uniform(0.1, 2.0, len(src)).astype(np.float32)
    indptr, indices, perm = build_csr(dst, src, n)
    w_csr = w[np.asarray(perm)]
    dfbg = DistFullBatchGraph(indptr, indices, mesh, weights=w_csr,
                              reorder="none", block_rows=128)
    fbg = FullBatchGraph(indptr, indices, w_csr, reorder="none",
                         block_rows=128, min_band_fraction=0.0)
    x = rng.standard_normal((n, f)).astype(np.float32)
    out = dfbg.unshard(dfbg.spmm(dfbg.shard(x), reduce="sum"))
    want = np.asarray(fbg.spmm(jnp.asarray(x), reduce="sum"))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)

    g_out = rng.standard_normal((n, f)).astype(np.float32)
    g_pad = dfbg.shard(g_out)
    got = dfbg.unshard(jax.grad(
        lambda xs: jnp.sum(dfbg.spmm(xs, reduce="sum") * g_pad))(
        dfbg.shard(x)))
    want_g = np.asarray(jax.grad(
        lambda xs: jnp.sum(fbg.spmm(xs, reduce="sum") * jnp.asarray(g_out))
    )(jnp.asarray(x)))
    np.testing.assert_allclose(got, want_g, rtol=1e-4, atol=1e-4)


def test_dist_spmm_grad_matches_single(mesh):
    rng = np.random.default_rng(8)
    n, f = 640, 16
    src, dst = make_graph(n, 4, 50, rng, frac_far=0.2)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=128)
    fbg = FullBatchGraph(indptr, indices, reorder="none", block_rows=128,
                         min_band_fraction=0.0)
    x = rng.standard_normal((n, f)).astype(np.float32)
    g_out = rng.standard_normal((n, f)).astype(np.float32)
    g_pad = dfbg.shard(g_out)

    def loss_d(xs):
        return jnp.sum(dfbg.spmm(xs, reduce="mean") * g_pad)

    def loss_s(xs):
        return jnp.sum(fbg.spmm(xs, reduce="mean") * jnp.asarray(g_out))

    got = dfbg.unshard(jax.grad(loss_d)(dfbg.shard(x)))
    want = np.asarray(jax.grad(loss_s)(jnp.asarray(x)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_dist_spmm_rcm_and_order_maps(mesh):
    """reorder='rcm': results in graph order must match the single-chip
    RCM path (same deterministic ordering)."""
    rng = np.random.default_rng(9)
    n, f = 500, 8
    src, dst = make_graph(n, 4, 30, rng)
    # scramble ids so RCM has something to do
    perm = rng.permutation(n).astype(np.int32)
    src, dst = perm[src], perm[dst]
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="rcm",
                              block_rows=128)
    fbg = FullBatchGraph(indptr, indices, reorder="rcm", block_rows=128,
                         min_band_fraction=0.0)
    np.testing.assert_array_equal(np.asarray(dfbg.order),
                                  np.asarray(fbg.order))
    x = rng.standard_normal((n, f)).astype(np.float32)
    x_g = dfbg.to_graph_order(x)
    out = dfbg.unshard(dfbg.spmm(dfbg.shard(x_g), reduce="sum"))
    want = np.asarray(fbg.spmm(jnp.asarray(x_g), reduce="sum"))
    np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("frac_far", [0.0, 0.25])
def test_dist_attention_matches_single(mesh, frac_far):
    """Sharded fused attention forward == single-device fused path."""
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
        build_attention_slab_pair)
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm

    rng = np.random.default_rng(11)
    n, f = 700, 16
    src, dst = make_graph(n, 5, 60, rng, frac_far=frac_far)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=128)
    pair = build_attention_slab_pair(indptr, indices, block_rows=128,
                                     max_k=64)
    x = rng.standard_normal((n, f)).astype(np.float32)
    a_d = rng.standard_normal(n).astype(np.float32)
    a_s = rng.standard_normal(n).astype(np.float32)
    out = dfbg.unshard(dfbg.attention_spmm(
        dfbg.shard(x), dfbg.shard(a_d), dfbg.shard(a_s)))
    want = np.asarray(slab_attention_spmm(
        pair.fwd, jnp.asarray(x), jnp.asarray(a_d), jnp.asarray(a_s)))
    np.testing.assert_allclose(out, want, rtol=2e-4, atol=2e-4)


def test_dist_attention_grads_match_reference(mesh):
    """All three sharded attention gradients == jax autodiff of the
    segment-op reference."""
    rng = np.random.default_rng(12)
    n, f = 512, 8
    src, dst = make_graph(n, 4, 50, rng, frac_far=0.2)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=128)
    x = rng.standard_normal((n, f)).astype(np.float32)
    a_d = rng.standard_normal(n).astype(np.float32)
    a_s = rng.standard_normal(n).astype(np.float32)
    g = rng.standard_normal((n, f)).astype(np.float32)
    g_pad = dfbg.shard(g)

    def loss_d(xs, ad, asx):
        return jnp.sum(dfbg.attention_spmm(xs, ad, asx) * g_pad)

    got = jax.grad(loss_d, argnums=(0, 1, 2))(
        dfbg.shard(x), dfbg.shard(a_d), dfbg.shard(a_s))

    rows = jnp.asarray(np.repeat(np.arange(n), np.diff(indptr)), jnp.int32)
    cols = jnp.asarray(indices, jnp.int32)

    def ref(x, ad, asx):
        e = ad[rows] + asx[cols]
        e = jnp.where(e >= 0, e, 0.2 * e)
        m = jax.ops.segment_max(e, rows, num_segments=n)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(e - m[rows])
        s = jax.ops.segment_sum(p, rows, num_segments=n)
        u = jax.ops.segment_sum(p[:, None] * x[cols], rows, num_segments=n)
        return u / jnp.maximum(s, 1e-16)[:, None]

    def loss_s(x, ad, asx):
        return jnp.sum(ref(x, ad, asx) * jnp.asarray(g))

    want = jax.grad(loss_s, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(a_d), jnp.asarray(a_s))
    for gi, wi, name in zip(got, want, ("dx", "dalpha_dst", "dalpha_src")):
        np.testing.assert_allclose(dfbg.unshard(gi), np.asarray(wi),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dist_attention_mh_matches_per_head(mesh):
    """Fused sharded multi-head path == per-head sharded calls, fwd and
    all three gradients."""
    rng = np.random.default_rng(14)
    n, f, h = 500, 8, 3
    src, dst = make_graph(n, 4, 50, rng, frac_far=0.2)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=128)
    x = rng.standard_normal((n, h, f)).astype(np.float32)
    a_d = rng.standard_normal((n, h)).astype(np.float32)
    a_s = rng.standard_normal((n, h)).astype(np.float32)
    g = rng.standard_normal((n, h, f)).astype(np.float32)
    xs, ads, ass = dfbg.shard(x), dfbg.shard(a_d), dfbg.shard(a_s)
    g_pad = dfbg.shard(g)

    out_mh = dfbg.unshard(dfbg.attention_spmm_mh(xs, ads, ass))
    for hh in range(h):
        want = dfbg.unshard(dfbg.attention_spmm(
            xs[:, hh], ads[:, hh], ass[:, hh]))
        np.testing.assert_allclose(out_mh[:, hh], want, rtol=2e-4,
                                   atol=2e-4, err_msg=f"fwd head {hh}")

    def loss_mh(xs, ad, asx):
        return jnp.sum(dfbg.attention_spmm_mh(xs, ad, asx) * g_pad)

    def loss_ph(xs, ad, asx):
        return sum(
            jnp.sum(dfbg.attention_spmm(xs[:, hh], ad[:, hh], asx[:, hh])
                    * g_pad[:, hh])
            for hh in range(h))

    got = jax.grad(loss_mh, argnums=(0, 1, 2))(xs, ads, ass)
    want = jax.grad(loss_ph, argnums=(0, 1, 2))(xs, ads, ass)
    for gi, wi, name in zip(got, want, ("dx", "dalpha_dst", "dalpha_src")):
        np.testing.assert_allclose(dfbg.unshard(gi), dfbg.unshard(wi),
                                   rtol=2e-4, atol=2e-4, err_msg=name)


def test_dist_gat_full_graph_trains(mesh):
    """GAT.full_graph (multi-head surface) trains over the mesh."""
    import optax

    from cugraph_gnn_tpu.models import GAT

    rng = np.random.default_rng(13)
    n, f, classes = 512, 8, 3
    src, dst = make_graph(n, 4, 40, rng)
    dfbg = DistFullBatchGraph.from_coo(src, dst, n, mesh, reorder="none",
                                       block_rows=128)
    x = dfbg.shard(rng.standard_normal((n, f)).astype(np.float32))
    y_host = np.zeros(dfbg._n_pad, np.int32)
    y_host[:n] = (np.arange(n) * classes) // n
    y = dfbg.shard(y_host)
    valid = dfbg.shard((np.arange(dfbg._n_pad) < n).astype(np.float32))

    model = GAT(hidden_features=8, out_features=classes, num_layers=2,
                heads=2)
    params = model.init(jax.random.PRNGKey(0), x, dfbg,
                        method=GAT.full_graph)
    tx = optax.adam(2e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, x, dfbg, method=GAT.full_graph)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * valid) / jnp.sum(valid)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(40):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.8, (losses[0], losses[-1])


def test_dist_full_batch_model_trains(mesh):
    """GCN.full_graph runs unchanged on the sharded graph: full-batch
    distributed training end-to-end."""
    import optax

    from cugraph_gnn_tpu.models import GCN

    rng = np.random.default_rng(10)
    n, f, classes = 768, 16, 4
    src, dst = make_graph(n, 5, 40, rng)
    dfbg = DistFullBatchGraph.from_coo(src, dst, n, mesh, reorder="none",
                                       block_rows=128)
    x = dfbg.shard(rng.standard_normal((n, f)).astype(np.float32))
    y_host = np.zeros(dfbg._n_pad, np.int32)
    y_host[:n] = (np.arange(n) * classes) // n
    y = dfbg.shard(y_host)
    valid = dfbg.shard((np.arange(dfbg._n_pad) < n).astype(np.float32))

    model = GCN(hidden_features=16, out_features=classes, num_layers=2)
    params = model.init(jax.random.PRNGKey(0), x, dfbg,
                        method=GCN.full_graph)
    tx = optax.adam(2e-2)
    opt = tx.init(params)

    @jax.jit
    def step(params, opt):
        def loss_fn(p):
            logits = model.apply(p, x, dfbg, method=GCN.full_graph)
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(ls * valid) / jnp.sum(valid)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    losses = []
    for _ in range(60):
        params, opt, loss = step(params, opt)
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.7, (losses[0], losses[-1])


def test_dist_attention_mh_head_chunking(mesh):
    """heads > MAX_PACKED_HEADS run as head-group chunks of the fused
    sharded kernel: forward matches per-head sharded calls."""
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import MAX_PACKED_HEADS

    rng = np.random.default_rng(15)
    n, f, h = 400, 4, MAX_PACKED_HEADS + 2
    src, dst = make_graph(n, 3, 40, rng, frac_far=0.15)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=128)
    x = rng.standard_normal((n, h, f)).astype(np.float32)
    a_d = rng.standard_normal((n, h)).astype(np.float32)
    a_s = rng.standard_normal((n, h)).astype(np.float32)
    xs, ads, ass = dfbg.shard(x), dfbg.shard(a_d), dfbg.shard(a_s)

    out_mh = dfbg.unshard(dfbg.attention_spmm_mh(xs, ads, ass))
    for hh in (0, MAX_PACKED_HEADS - 1, MAX_PACKED_HEADS, h - 1):
        want = dfbg.unshard(dfbg.attention_spmm(
            xs[:, hh], ads[:, hh], ass[:, hh]))
        np.testing.assert_allclose(out_mh[:, hh], want, rtol=2e-4,
                                   atol=2e-4, err_msg=f"fwd head {hh}")


def test_dist_attention_grads_no_bits_path(mesh):
    """block_rows > 341 disables the bit-packed planes, so the sharded
    backward falls to the retained two-orientation kernels — still must
    match autodiff of the segment reference (the default tests now
    exercise only the one-pass reverse-halo route)."""
    rng = np.random.default_rng(31)
    n, f = 8 * 384, 8
    src, dst = make_graph(n, 3, 120, rng, frac_far=0.15)
    indptr, indices, _ = build_csr(dst, src, n)
    dfbg = DistFullBatchGraph(indptr, indices, mesh, reorder="none",
                              block_rows=384)
    assert dfbg._attn_structs()["bits"] is None
    x = rng.standard_normal((n, f)).astype(np.float32)
    a_d = rng.standard_normal(n).astype(np.float32)
    a_s = rng.standard_normal(n).astype(np.float32)
    g = rng.standard_normal((n, f)).astype(np.float32)
    g_pad = dfbg.shard(g)

    def loss_d(xs, ad, asx):
        return jnp.sum(dfbg.attention_spmm(xs, ad, asx) * g_pad)

    got = jax.grad(loss_d, argnums=(0, 1, 2))(
        dfbg.shard(x), dfbg.shard(a_d), dfbg.shard(a_s))

    rows = jnp.asarray(np.repeat(np.arange(n), np.diff(indptr)), jnp.int32)
    cols = jnp.asarray(indices, jnp.int32)

    def ref(x, ad, asx):
        e = ad[rows] + asx[cols]
        e = jnp.where(e >= 0, e, 0.2 * e)
        m = jax.ops.segment_max(e, rows, num_segments=n)
        m = jnp.where(jnp.isfinite(m), m, 0.0)
        p = jnp.exp(e - m[rows])
        s = jax.ops.segment_sum(p, rows, num_segments=n)
        u = jax.ops.segment_sum(p[:, None] * x[cols], rows, num_segments=n)
        return u / jnp.maximum(s, 1e-16)[:, None]

    def loss_s(x, ad, asx):
        return jnp.sum(ref(x, ad, asx) * jnp.asarray(g))

    want = jax.grad(loss_s, argnums=(0, 1, 2))(
        jnp.asarray(x), jnp.asarray(a_d), jnp.asarray(a_s))
    for gi, wi, name in zip(got, want, ("dx", "dalpha_dst", "dalpha_src")):
        np.testing.assert_allclose(dfbg.unshard(gi), np.asarray(wi),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
