"""SpMM / SDDMM tests vs NumPy references."""

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.ops import (
    coo_edge_softmax,
    coo_sddmm,
    coo_to_csr_np,
    csr_spmm,
    fanout_aggregate,
    fanout_attention_softmax,
    fanout_sddmm,
    segment_spmm,
)


def ref_segment_spmm(x, src, dst, num_out, reduce, w=None):
    out = np.zeros((num_out, x.shape[1]), dtype=np.float64)
    cnt = np.zeros(num_out)
    if reduce == "max":
        out[:] = -np.inf
    for e in range(len(src)):
        if src[e] < 0 or dst[e] < 0:
            continue
        msg = x[src[e]] * (w[e] if w is not None else 1.0)
        if reduce == "max":
            out[dst[e]] = np.maximum(out[dst[e]], msg)
        else:
            out[dst[e]] += msg
        cnt[dst[e]] += 1
    if reduce == "mean":
        out /= np.maximum(cnt, 1)[:, None]
    if reduce == "max":
        out[~np.isfinite(out).all(axis=1)] = 0
        out[cnt == 0] = 0
    return out


def test_segment_spmm_all_reduces(rng):
    n, e, f = 50, 300, 16
    x = rng.standard_normal((n, f)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    src[::17] = -1  # padding entries
    for reduce in ("sum", "mean", "max"):
        out = segment_spmm(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst),
                           n, reduce=reduce)
        ref = ref_segment_spmm(x, src, dst, n, reduce)
        np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_segment_spmm_weighted(rng):
    n, e, f = 30, 200, 8
    x = rng.standard_normal((n, f)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    w = rng.random(e).astype(np.float32)
    out = segment_spmm(jnp.asarray(x), jnp.asarray(src), jnp.asarray(dst), n,
                       reduce="sum", edge_weight=jnp.asarray(w))
    ref = ref_segment_spmm(x, src, dst, n, "sum", w)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_csr_spmm_matches_segment(rng):
    n, e, f = 40, 250, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    # CSR rows = dst, cols = src
    out = csr_spmm(jnp.asarray(indptr), jnp.asarray(indices), jnp.asarray(x),
                   reduce="mean")
    ref = ref_segment_spmm(x, src, dst, n, "mean")
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_fanout_aggregate(rng):
    s, k, f = 20, 7, 12
    x = rng.standard_normal((s, k, f)).astype(np.float32)
    mask = rng.random((s, k)) < 0.6
    for reduce in ("sum", "mean", "max"):
        out = np.asarray(fanout_aggregate(
            jnp.asarray(x), jnp.asarray(mask), reduce))
        for r in range(s):
            rows = x[r][mask[r]]
            if len(rows) == 0:
                np.testing.assert_allclose(out[r], 0)
            elif reduce == "sum":
                np.testing.assert_allclose(out[r], rows.sum(0), rtol=1e-5)
            elif reduce == "mean":
                np.testing.assert_allclose(out[r], rows.mean(0), rtol=1e-5)
            else:
                np.testing.assert_allclose(out[r], rows.max(0), rtol=1e-5)


def test_fanout_sddmm_softmax(rng):
    s, k, f = 10, 5, 8
    xd = rng.standard_normal((s, f)).astype(np.float32)
    xn = rng.standard_normal((s, k, f)).astype(np.float32)
    mask = rng.random((s, k)) < 0.7
    mask[0] = False  # row with no valid neighbors
    e = np.asarray(fanout_sddmm(jnp.asarray(xd), jnp.asarray(xn),
                                jnp.asarray(mask)))
    for r in range(s):
        for j in range(k):
            if mask[r, j]:
                np.testing.assert_allclose(e[r, j], xd[r] @ xn[r, j], rtol=1e-4)
            else:
                assert e[r, j] == -np.inf
    a = np.asarray(fanout_attention_softmax(jnp.asarray(e), jnp.asarray(mask)))
    sums = a.sum(1)
    np.testing.assert_allclose(sums[mask.any(1)], 1.0, rtol=1e-5)
    np.testing.assert_allclose(sums[~mask.any(1)], 0.0, atol=1e-7)


def test_coo_sddmm_and_softmax(rng):
    n, e, f = 25, 100, 6
    x = rng.standard_normal((n, f)).astype(np.float32)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    scores = np.asarray(coo_sddmm(jnp.asarray(x), jnp.asarray(x),
                                  jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(
        scores, (x[src] * x[dst]).sum(-1), rtol=1e-4, atol=1e-5)
    alpha = np.asarray(coo_edge_softmax(jnp.asarray(scores), jnp.asarray(dst), n))
    for v in range(n):
        sel = dst == v
        if sel.any():
            np.testing.assert_allclose(alpha[sel].sum(), 1.0, rtol=1e-5)


def test_ell_spmm_matches_segment(rng):
    from cugraph_gnn_tpu.ops.spmm import EllBuckets, ell_spmm
    n, f = 60, 16
    # skewed degrees incl. zero-degree rows and heavy rows (> max_k)
    src = np.concatenate([
        rng.integers(0, n, 400),
        np.full(50, 7),          # heavy row 7
    ])
    dst = np.concatenate([
        rng.integers(0, n // 2, 400),   # rows n//2.. have degree 0
        np.full(50, 3),                 # row 3 heavy (deg > 16)
    ])
    x = rng.standard_normal((n, f)).astype(np.float32)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    buckets = EllBuckets(indptr, indices, max_k=16)
    for reduce in ("sum", "mean", "max"):
        out = ell_spmm(buckets, jnp.asarray(x), reduce=reduce)
        ref = csr_spmm(jnp.asarray(indptr), jnp.asarray(indices),
                       jnp.asarray(x), reduce=reduce)
        np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                                   rtol=1e-5, atol=1e-5)
