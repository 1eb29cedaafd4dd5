"""Slab SpMM (banded MXU kernel, ops/pallas/slab_kernel.py): exactness
vs the segment reference on banded, mixed, and weighted graphs."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.native import build_csr
from cugraph_gnn_tpu.ops.pallas.slab_kernel import build_slab_graph, slab_spmm
from cugraph_gnn_tpu.ops.spmm import segment_spmm


def make_graph(n, deg, band, rng, frac_far=0.0, simple=False):
    src, dst = [], []
    for i in range(n):
        for _ in range(int(deg)):
            if rng.random() < frac_far:
                j = int(rng.integers(0, n))
            else:
                j = int(np.clip(i + rng.integers(-band, band + 1), 0, n - 1))
            src.append(j)
            dst.append(i)
    src = np.asarray(src, np.int32)
    dst = np.asarray(dst, np.int32)
    if simple:
        # drop parallel edges: build_slab_graph dedupes the band (the
        # bit-packed adjacency is multiplicity-free), so only simple
        # graphs can have band_fraction == 1.0
        _, ix = np.unique(src.astype(np.int64) * n + dst,
                          return_index=True)
        src, dst = src[np.sort(ix)], dst[np.sort(ix)]
    return src, dst


@pytest.mark.parametrize("frac_far", [0.0, 0.3])
@pytest.mark.parametrize("reduce", ["sum", "mean"])
def test_slab_matches_segment(frac_far, reduce):
    rng = np.random.default_rng(0)
    n, f = 700, 128
    src, dst = make_graph(n, 6, 100, rng, frac_far=frac_far,
                          simple=frac_far == 0.0)
    indptr, indices, _ = build_csr(dst, src, n)
    g = build_slab_graph(indptr, indices, block_rows=256)
    if frac_far == 0.0:
        assert g.band_fraction == 1.0
        assert g.ell_bits is not None
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    out = slab_spmm(g, x, reduce=reduce, compute_dtype=jnp.float32)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    ref = segment_spmm(x, jnp.asarray(indices), jnp.asarray(rows, jnp.int32),
                       n, reduce=reduce)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_slab_weighted_and_overflow():
    """Weighted edges + rows overflowing max_k land exactly (overflow
    spills to the fallback)."""
    rng = np.random.default_rng(1)
    n, f = 300, 64
    src, dst = make_graph(n, 5, 40, rng)
    # one hub row with 30 in-band edges (> max_k=8)
    hub_src = np.clip(150 + rng.integers(-40, 41, 30), 0, n - 1).astype(np.int32)
    src = np.concatenate([src, hub_src])
    dst = np.concatenate([dst, np.full(30, 150, np.int32)])
    indptr, indices, perm = build_csr(dst, src, n)
    w = rng.uniform(0.5, 2.0, len(src)).astype(np.float32)
    w_csr = w[perm]
    g = build_slab_graph(indptr, indices, weights=w_csr, block_rows=128,
                         max_k=8)
    assert g.band_fraction < 1.0
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    out = slab_spmm(g, x, reduce="sum", compute_dtype=jnp.float32)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    ref = segment_spmm(x, jnp.asarray(indices), jnp.asarray(rows, jnp.int32),
                       n, reduce="sum", edge_weight=jnp.asarray(w_csr))
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_slab_after_rcm_reorder():
    """End-to-end with ops/reorder: a scrambled band graph recovers a
    high band fraction after RCM, and results map back exactly."""
    from cugraph_gnn_tpu.ops.reorder import reorder_csr

    rng = np.random.default_rng(2)
    n, f = 512, 32
    scram = rng.permutation(n)
    src, dst = make_graph(n, 5, 20, rng)
    src, dst = scram[src], scram[dst]
    indptr, indices, _ = build_csr(dst, src, n)
    # scrambled: nearly everything out of band
    g_bad = build_slab_graph(indptr, indices, block_rows=128)
    rg = reorder_csr(indptr, indices)
    g_rcm = build_slab_graph(rg.indptr, rg.indices, block_rows=128)
    assert g_rcm.band_fraction > 0.9 > g_bad.band_fraction
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    # aggregate in the reordered space, map back via rg.order
    out_r = slab_spmm(g_rcm, x[jnp.asarray(rg.order)], reduce="sum",
                      compute_dtype=jnp.float32)
    out = jnp.zeros_like(out_r).at[jnp.asarray(rg.order)].set(out_r)
    rows = np.repeat(np.arange(n), np.diff(indptr))
    ref = segment_spmm(x, jnp.asarray(indices), jnp.asarray(rows, jnp.int32),
                       n, reduce="sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_slab_attention_matches_coo():
    """Fused slab attention == COO sddmm + segment softmax + weighted
    segment SpMM, including the out-of-band log-sum-exp merge."""
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm
    from cugraph_gnn_tpu.ops.sddmm import coo_edge_softmax

    rng = np.random.default_rng(3)
    n, f = 500, 128
    src, dst = make_graph(n, 6, 90, rng, frac_far=0.25)
    indptr, indices, _ = build_csr(dst, src, n)
    g = build_slab_graph(indptr, indices, block_rows=128, max_k=8)
    assert 0.0 < g.band_fraction < 1.0
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    out = slab_attention_spmm(g, x, a_d, a_s, negative_slope=0.2)

    rows = np.repeat(np.arange(n), np.diff(indptr)).astype(np.int32)
    e = np.asarray(a_d)[rows] + np.asarray(a_s)[indices]
    e = np.where(e >= 0, e, 0.2 * e).astype(np.float32)
    p = coo_edge_softmax(jnp.asarray(e), jnp.asarray(rows), n)
    ref = segment_spmm(x, jnp.asarray(indices), jnp.asarray(rows), n,
                       reduce="sum", edge_weight=p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)


def test_slab_attention_band_only():
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm
    from cugraph_gnn_tpu.ops.sddmm import coo_edge_softmax

    rng = np.random.default_rng(4)
    n, f = 384, 64
    src, dst = make_graph(n, 5, 50, rng, simple=True)
    indptr, indices, _ = build_csr(dst, src, n)
    g = build_slab_graph(indptr, indices, block_rows=128)
    assert g.band_fraction == 1.0
    x = jnp.asarray(rng.standard_normal((n, f)).astype(np.float32))
    a_d = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    a_s = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    out = slab_attention_spmm(g, x, a_d, a_s)
    rows = np.repeat(np.arange(n), np.diff(indptr)).astype(np.int32)
    e = np.asarray(a_d)[rows] + np.asarray(a_s)[indices]
    e = np.where(e >= 0, e, 0.2 * e).astype(np.float32)
    p = coo_edge_softmax(jnp.asarray(e), jnp.asarray(rows), n)
    ref = segment_spmm(x, jnp.asarray(indices), jnp.asarray(rows), n,
                       reduce="sum", edge_weight=p)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-4, atol=2e-4)
