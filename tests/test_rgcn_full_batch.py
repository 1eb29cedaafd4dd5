"""RGCN full-batch slab path (round 5 / VERDICT r4 #6): per-relation
banded slabs over a shared union-RCM order, parity-checked against the
exact segment path (RGCNConv.full) for values and gradients."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.models import RGCN
from cugraph_gnn_tpu.models.conv import RGCNConv
from cugraph_gnn_tpu.ops import RelationalFullBatch

N = 300
R = 3
F = 8


@pytest.fixture
def rel_graph(rng):
    # locality-ish graph: neighbors near the node id, plus random tail
    src, dst, et = [], [], []
    for i in range(N):
        for _ in range(4):
            j = (i + int(rng.integers(-20, 21))) % N
            src.append(j)
            dst.append(i)
            et.append(int(rng.integers(0, R - 1)))  # relation R-1 stays EMPTY
    return (np.asarray(src, np.int32), np.asarray(dst, np.int32),
            np.asarray(et, np.int32))


def test_rgcn_conv_full_graph_matches_segment(rel_graph, rng):
    src, dst, et = rel_graph
    rfb = RelationalFullBatch(src, dst, et, R, N)
    x = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    conv = RGCNConv(16, num_relations=R)
    # init via the segment path (same params serve both methods)
    params = conv.init(
        jax.random.PRNGKey(0), x, jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(et), N, method=RGCNConv.full)

    ref = conv.apply(params, x, jnp.asarray(src), jnp.asarray(dst),
                     jnp.asarray(et), N, method=RGCNConv.full)
    x_g = rfb.to_graph_order(x)
    out = conv.apply(params, x_g, rfb, method=RGCNConv.full_graph)
    out = rfb.to_input_order(out)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_rgcn_conv_full_graph_grads_match(rel_graph, rng):
    src, dst, et = rel_graph
    rfb = RelationalFullBatch(src, dst, et, R, N)
    x = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    conv = RGCNConv(16, num_relations=R)
    params = conv.init(
        jax.random.PRNGKey(0), x, jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(et), N, method=RGCNConv.full)
    tgt = jnp.asarray(rng.standard_normal((N, 16)), jnp.float32)

    def loss_seg(p, xx):
        o = conv.apply(p, xx, jnp.asarray(src), jnp.asarray(dst),
                       jnp.asarray(et), N, method=RGCNConv.full)
        return jnp.mean((o - tgt) ** 2)

    def loss_slab(p, xx):
        o = conv.apply(p, rfb.to_graph_order(xx), rfb,
                       method=RGCNConv.full_graph)
        return jnp.mean((rfb.to_input_order(o) - tgt) ** 2)

    g_ref = jax.grad(loss_seg, argnums=(0, 1))(params, x)
    g_new = jax.grad(loss_slab, argnums=(0, 1))(params, x)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_new)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-4)


def test_rgcn_model_full_graph(rel_graph, rng):
    src, dst, et = rel_graph
    rfb = RelationalFullBatch(src, dst, et, R, N)
    x = jnp.asarray(rng.standard_normal((N, F)), jnp.float32)
    model = RGCN(num_relations=R, hidden_features=16, out_features=4)
    params = model.init(
        jax.random.PRNGKey(1), x, jnp.asarray(src), jnp.asarray(dst),
        jnp.asarray(et), N, method=RGCN.full)
    ref = model.apply(params, x, jnp.asarray(src), jnp.asarray(dst),
                      jnp.asarray(et), N, method=RGCN.full)
    out = rfb.to_input_order(model.apply(
        params, rfb.to_graph_order(x), rfb, method=RGCN.full_graph))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-3, atol=2e-3)


def test_relational_full_batch_shape_checks(rel_graph):
    src, dst, et = rel_graph
    rfb = RelationalFullBatch(src, dst, et, R, N)
    assert len(rfb.graphs) == R
    # relation R-1 has zero edges and must still aggregate to zeros
    x = jnp.ones((N, F), jnp.float32)
    agg = rfb.graphs[R - 1].spmm(x, reduce="sum")
    np.testing.assert_allclose(np.asarray(agg), 0.0)
    conv = RGCNConv(8, num_relations=R - 1)
    with pytest.raises(ValueError):
        conv.apply({}, x, rfb, method=RGCNConv.full_graph)
