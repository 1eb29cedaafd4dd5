"""FullBatchGraph (ops/full_batch.py): the product full-batch pipeline
(reorder -> slab split -> MXU aggregate) matches the conv COO paths."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.models import GATConv, GCNConv, GINConv, SAGEConv
from cugraph_gnn_tpu.ops import FullBatchGraph


def scrambled_band_graph(n, deg, band, rng):
    scram = rng.permutation(n)
    src, dst = [], []
    for i in range(n):
        for _ in range(deg):
            j = int(np.clip(i + rng.integers(-band, band + 1), 0, n - 1))
            src.append(scram[j])
            dst.append(scram[i])
    return np.asarray(src, np.int32), np.asarray(dst, np.int32)


@pytest.fixture(scope="module")
def graph():
    rng = np.random.default_rng(0)
    n, f = 600, 64
    src, dst = scrambled_band_graph(n, 5, 60, rng)
    fbg = FullBatchGraph.from_coo(src, dst, n, reorder="auto")
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    return fbg, x, src, dst, n


def test_auto_reorder_recovers_band(graph):
    fbg, *_ = graph
    assert fbg.order is not None          # auto picked RCM
    assert fbg.band_fraction > 0.9
    assert fbg.use_slab


def test_order_roundtrip_and_id_map(graph):
    fbg, x, _, _, n = graph
    xg = fbg.to_graph_order(x)
    np.testing.assert_array_equal(np.asarray(fbg.to_input_order(xg)),
                                  np.asarray(x))
    ids = jnp.asarray([0, 5, -1, n - 1], jnp.int32)
    m = np.asarray(fbg.map_ids(ids))
    assert m[2] == -1
    np.testing.assert_array_equal(np.asarray(fbg.order)[m[[0, 1, 3]]],
                                  [0, 5, n - 1])


@pytest.mark.parametrize("conv_cls,kw", [
    (SAGEConv, {}),
    (GCNConv, {}),
    (GINConv, {}),
    (GATConv, {"heads": 2}),
])
def test_full_graph_matches_full(graph, conv_cls, kw):
    fbg, x, src, dst, n = graph
    conv = conv_cls(32, **kw)
    params = conv.init(jax.random.PRNGKey(0), x[:4], x[:4, None, :],
                       jnp.ones((4, 1), bool))
    ref = conv.apply(params, x, jnp.asarray(src), jnp.asarray(dst), n,
                     method=conv_cls.full)
    xg = fbg.to_graph_order(x)
    out_g = conv.apply(params, xg, fbg, method=conv_cls.full_graph)
    out = fbg.to_input_order(out_g)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=3e-4, atol=3e-4)


def test_random_graph_keeps_composite():
    rng = np.random.default_rng(1)
    n = 6000
    src = rng.integers(0, n, 30000).astype(np.int32)
    dst = rng.integers(0, n, 30000).astype(np.int32)
    fbg = FullBatchGraph.from_coo(src, dst, n, reorder="auto")
    assert not fbg.use_slab            # no locality to recover
    x = jnp.asarray(rng.standard_normal((n, 32)).astype(np.float32))
    out = fbg.spmm(fbg.to_graph_order(x), reduce="mean")
    from cugraph_gnn_tpu.ops.spmm import segment_spmm
    ref = segment_spmm(x, jnp.asarray(src), jnp.asarray(dst), n,
                       reduce="mean")
    np.testing.assert_allclose(
        np.asarray(fbg.to_input_order(out)), np.asarray(ref),
        rtol=1e-4, atol=1e-4)


def test_gat_full_graph_gradient_matches_full(graph):
    """Full-batch GAT trains through the fused slab attention kernel:
    parameter gradients via full_graph == gradients via the COO full
    path (the fused custom VJP of ops/pallas/slab_attn_grad.py)."""
    fbg, x, src, dst, n = graph
    conv = GATConv(32, heads=2)
    params = conv.init(jax.random.PRNGKey(2), x[:4], x[:4, None, :],
                       jnp.ones((4, 1), bool))
    tgt = jax.random.normal(jax.random.PRNGKey(3), (n, 64))
    xg = fbg.to_graph_order(x)
    tgt_g = fbg.to_graph_order(tgt)

    def loss_slab(p):
        out = conv.apply(p, xg, fbg, method=GATConv.full_graph)
        return jnp.sum((out - tgt_g) ** 2)

    def loss_coo(p):
        out = conv.apply(p, x, jnp.asarray(src), jnp.asarray(dst), n,
                         method=GATConv.full)
        return jnp.sum((out - tgt) ** 2)

    g_slab = jax.grad(loss_slab)(params)
    g_coo = jax.grad(loss_coo)(params)
    flat_s, _ = jax.tree_util.tree_flatten(g_slab)
    flat_c, _ = jax.tree_util.tree_flatten(g_coo)
    for a, b in zip(flat_s, flat_c):
        scale = max(float(jnp.max(jnp.abs(b))), 1.0)
        np.testing.assert_allclose(np.asarray(a) / scale,
                                   np.asarray(b) / scale,
                                   rtol=2e-3, atol=2e-3)


def test_spmm_gradient_matches_segment(graph):
    """custom_vjp through the slab kernel: grads == the differentiable
    segment path's grads (transpose-graph backward, incl. fallback)."""
    from cugraph_gnn_tpu.ops.spmm import segment_spmm

    fbg, x, src, dst, n = graph
    xg = fbg.to_graph_order(x)
    tgt = jax.random.normal(jax.random.PRNGKey(1), xg.shape)

    def loss_slab(z):
        return jnp.sum((fbg.spmm(z, reduce="mean") - tgt) ** 2)

    # same graph in graph order, via the segment path
    sg = fbg.map_ids(jnp.asarray(src))
    dg = fbg.map_ids(jnp.asarray(dst))

    def loss_seg(z):
        return jnp.sum((segment_spmm(z, sg, dg, n, reduce="mean") - tgt) ** 2)

    g_slab = jax.grad(loss_slab)(xg)
    g_seg = jax.grad(loss_seg)(xg)
    np.testing.assert_allclose(np.asarray(g_slab), np.asarray(g_seg),
                               rtol=3e-4, atol=3e-4)


def test_attention_mh_head_chunking_matches_per_head(graph):
    """heads > MAX_PACKED_HEADS route through head-group chunks of the
    fused kernel (not a per-head loop): fwd + all grads == the
    single-head fused path stacked."""
    from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import MAX_PACKED_HEADS

    fbg, x, src, dst, n = graph
    h, f = MAX_PACKED_HEADS + 3, 4
    rng = np.random.default_rng(9)
    xh = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal((n, h)).astype(np.float32))
    g = jnp.asarray(rng.standard_normal((n, h, f)).astype(np.float32))

    out = fbg.attention_spmm_mh(xh, a_d, a_s)
    want = jnp.stack([fbg.attention_spmm(xh[:, i], a_d[:, i], a_s[:, i])
                      for i in range(h)], axis=1)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=2e-4, atol=2e-4)

    loss = lambda fn: lambda *a: jnp.sum(fn(*a) * g)
    per_head = lambda xh, a_d, a_s: jnp.stack(
        [fbg.attention_spmm(xh[:, i], a_d[:, i], a_s[:, i])
         for i in range(h)], axis=1)
    got = jax.grad(loss(fbg.attention_spmm_mh), argnums=(0, 1, 2))(
        xh, a_d, a_s)
    ref = jax.grad(loss(per_head), argnums=(0, 1, 2))(xh, a_d, a_s)
    for a, b, name in zip(got, ref, ("dx", "dad", "das")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=2e-4, err_msg=name)
