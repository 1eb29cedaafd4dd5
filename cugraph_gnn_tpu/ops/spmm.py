"""SpMM: sparse (graph) × dense (features) aggregation.

The reference delegates message passing to PyG; here it is first-class
(per BASELINE.json north star: "CSR/COO graph store in TPU HBM with
Pallas gather/scatter SpMM (mean/sum/max)").

Two layouts, matching how graphs appear in the pipeline:

1. **Fixed-fanout (ELL) blocks** ``neighbors (S, k)`` from the sampler —
   the hot training path.  Aggregation is a dense gather + masked
   reduction over the fanout axis: pure MXU/VPU food, zero raggedness.
2. **Sorted-COO / CSR segments** for full-batch graphs — `segment_sum`
   (XLA scatter-add) fallback, with a Pallas kernel for the
   gather+reduce fusion in ops/pallas/spmm_kernel.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# Fixed-fanout (sampled) aggregation
# ---------------------------------------------------------------------------


def fanout_aggregate(x_neigh, mask, reduce: str = "mean"):
    """Aggregate neighbor features over the fanout axis.

    x_neigh: (S, k, F) gathered neighbor features (padded rows arbitrary).
    mask:    (S, k) bool validity.
    reduce:  'sum' | 'mean' | 'max'.
    Returns (S, F).
    """
    m = mask[..., None]
    if reduce == "sum":
        return jnp.sum(jnp.where(m, x_neigh, 0), axis=1)
    if reduce == "mean":
        s = jnp.sum(jnp.where(m, x_neigh, 0), axis=1)
        n = jnp.maximum(jnp.sum(mask, axis=1, keepdims=True), 1)
        return s / n.astype(s.dtype)
    if reduce == "max":
        neg = jnp.asarray(jnp.finfo(x_neigh.dtype).min, x_neigh.dtype)
        r = jnp.max(jnp.where(m, x_neigh, neg), axis=1)
        # Rows with zero valid neighbors -> 0 (SAGE convention).
        any_valid = jnp.any(mask, axis=1, keepdims=True)
        return jnp.where(any_valid, r, 0)
    raise ValueError(f"unknown reduce {reduce!r}")


# ---------------------------------------------------------------------------
# Segment (COO/CSR) aggregation
# ---------------------------------------------------------------------------


def segment_spmm(x, src, dst, num_out: int, reduce: str = "mean",
                 edge_weight: Optional[jax.Array] = None,
                 indices_are_sorted: bool = False):
    """out[d] = reduce_{e: dst[e]=d} (w_e * x[src[e]]).

    Pure-XLA path (scatter-add); works on any backend.  -1 entries in
    ``src``/``dst`` are treated as padding and ignored.
    """
    valid = (src >= 0) & (dst >= 0)
    s = jnp.where(valid, src, 0)
    d = jnp.where(valid, dst, num_out)  # route pad to an overflow bucket
    msgs = x[s]
    if edge_weight is not None:
        msgs = msgs * edge_weight[:, None].astype(msgs.dtype)
    if reduce in ("sum", "mean"):
        msgs = jnp.where(valid[:, None], msgs, 0)
        out = jax.ops.segment_sum(
            msgs, d, num_segments=num_out + 1,
            indices_are_sorted=indices_are_sorted)[:num_out]
        if reduce == "mean":
            ones = jnp.where(valid, 1, 0).astype(x.dtype)
            cnt = jax.ops.segment_sum(
                ones, d, num_segments=num_out + 1,
                indices_are_sorted=indices_are_sorted)[:num_out]
            out = out / jnp.maximum(cnt, 1)[:, None]
        return out
    if reduce == "max":
        neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)
        msgs = jnp.where(valid[:, None], msgs, neg)
        out = jax.ops.segment_max(
            msgs, d, num_segments=num_out + 1,
            indices_are_sorted=indices_are_sorted)[:num_out]
        return jnp.where(jnp.isfinite(out), out, 0)
    raise ValueError(f"unknown reduce {reduce!r}")


# ---------------------------------------------------------------------------
# Degree-bucketed ELL SpMM — the TPU-idiomatic full-batch path
# ---------------------------------------------------------------------------


class EllBuckets:
    """Host-side preprocessing for :func:`ell_spmm`.

    Rows are partitioned into power-of-two degree buckets; each bucket
    stores a dense (rows_b, K_b) neighbor matrix (-1 padded) — turning
    the ragged CSR reduction into the dense fixed-fanout pattern that
    runs at ~675 GB/s on v5e, with **gather-based reassembly** instead
    of scatter-add (XLA scatter is ~10 GB/s on TPU):

    - rows with degree <= max_k produce exactly one partial, and the
      final output is `concat(bucket_partials)[gather_pos]` — a pure
      row gather;
    - heavier rows split into ceil(deg/max_k) chunks combined by a
      small scatter-add touching only those rows (rare by construction).
    Padding waste is bounded by 2x.
    """

    def __init__(self, indptr, indices, max_k: int = 64):
        indptr = np.asarray(indptr)
        indices = np.asarray(indices)
        n = len(indptr) - 1
        deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
        self.num_rows = n
        self.degrees = jnp.asarray(np.maximum(deg, 1).astype(np.float32))
        # Fine-grained widths: composite throughput is pad-ratio bound.
        # Measured on v5e at products scale (30.5M-edge power-law, f32
        # F=128): the composite (R,K,F) gather+reduce sustains ~67-81
        # GB/s *padded* regardless of width set, select-mask fusion
        # (where / take-fill / zero-row identical), program splitting
        # (multi-call, optimization_barrier identical) — so minimum
        # padding (1.09x with these steps vs 1.31x with power-of-two-ish
        # sets) wins: 62 vs 58 GB/s effective.  Isolated single-bucket
        # runs reach 104-113 GB/s padded; the composite gap is an XLA
        # scheduling property, not a width-tiling one (bf16 rows are
        # ~25% slower in ms; per-column unrolling everywhere is worse).
        ks = sorted({*range(4, 33, 4), 2, 1, 48, 64, 128, 256})
        ks = [k for k in ks if k <= max_k]
        if not ks or ks[-1] != max_k:
            ks.append(max_k)

        def dense_rows(sel_rows, starts, counts, k):
            """Vectorized (len(sel), k) neighbor block with -1 pad."""
            offs = starts[:, None] + np.arange(k)[None, :]
            ok = np.arange(k)[None, :] < counts[:, None]
            return np.where(
                ok, indices[np.minimum(offs, len(indices) - 1)], -1
            ).astype(np.int32)

        self.buckets = []        # single-chunk rows: (neigh (R, K),)
        gather_pos = np.full(n, -1, np.int64)
        pos = 0
        single = deg <= max_k
        for bi, k in enumerate(ks):
            lo = 0 if bi == 0 else ks[bi - 1]
            sel = np.nonzero(single & (deg > lo) & (deg <= k))[0]
            if len(sel) == 0:
                continue
            neigh = dense_rows(sel, indptr[sel].astype(np.int64),
                               deg[sel], k)
            gather_pos[sel] = pos + np.arange(len(sel))
            pos += len(sel)
            self.buckets.append(jnp.asarray(neigh))
        self.gather_pos = jnp.asarray(gather_pos.astype(np.int32))

        # heavy rows -> fixed-size chunks + small scatter
        heavy = np.nonzero(deg > max_k)[0]
        if len(heavy):
            n_chunks = -(-deg[heavy] // max_k)
            rows = np.repeat(heavy, n_chunks).astype(np.int64)
            # chunk index within its row
            ci = np.concatenate([np.arange(c) for c in n_chunks])
            starts = indptr[rows].astype(np.int64) + ci * max_k
            counts = np.minimum(deg[rows] - ci * max_k, max_k)
            self.heavy_neigh = jnp.asarray(
                dense_rows(rows, starts, counts, max_k))
            self.heavy_rows = jnp.asarray(rows.astype(np.int32))
        else:
            self.heavy_neigh = None
            self.heavy_rows = None


def ell_spmm(buckets: EllBuckets, x, reduce: str = "sum",
             unroll_threshold: int = 4):
    """out[r] = reduce over CSR row r of x[cols], via degree buckets.

    Two bucket-partial forms, both measured on v5e at products scale
    (2.45M x 128 f32 table):

    * k <= 4: per-column flat gathers + unrolled accumulate — K separate
      (R, F) gathers fuse into the running sum (K=2: 66 -> 103 GB/s,
      K=4: 88 -> 111 GB/s effective).
    * k > 4: the 3-D (R, K, F) gather + masked axis reduce (the mask
      select fuses into the gather — a zero-row no-select variant
      measured identical); the unrolled form regressed the composite
      62.8 -> 54 GB/s when applied everywhere."""
    n = buckets.num_rows
    f = x.shape[1]
    neg = jnp.asarray(jnp.finfo(x.dtype).min, x.dtype)

    def bucket_partial(neigh):
        k = neigh.shape[1]
        if k <= unroll_threshold:
            acc = None
            fill = neg if reduce == "max" else jnp.asarray(0, x.dtype)
            for j in range(k):
                nj = neigh[:, j]
                ok = (nj >= 0)[:, None]
                xj = jnp.where(ok, x[jnp.clip(nj, 0)], fill)
                if acc is None:
                    acc = xj
                elif reduce == "max":
                    acc = jnp.maximum(acc, xj)
                else:
                    acc = acc + xj
            return acc
        mask = neigh >= 0
        xn = x[jnp.clip(neigh, 0)]
        if reduce == "max":
            return jnp.max(jnp.where(mask[..., None], xn, neg), axis=1)
        return jnp.sum(jnp.where(mask[..., None], xn, 0), axis=1)

    parts = [bucket_partial(nb) for nb in buckets.buckets]
    cat = (jnp.concatenate(parts) if parts
           else jnp.zeros((1, f), x.dtype))
    gp = buckets.gather_pos
    fill = neg if reduce == "max" else jnp.asarray(0, x.dtype)
    out = jnp.where((gp >= 0)[:, None], cat[jnp.clip(gp, 0)], fill)

    if buckets.heavy_neigh is not None:
        hp = bucket_partial(buckets.heavy_neigh)
        if reduce == "max":
            out = out.at[buckets.heavy_rows].max(hp)
        else:
            out = out.at[buckets.heavy_rows].add(hp)
    if reduce == "mean":
        out = out / buckets.degrees[:, None]
    if reduce == "max":
        out = jnp.where(out == neg, 0, out)
    return out


def csr_spmm(indptr, indices, x, reduce: str = "mean",
             edge_weight: Optional[jax.Array] = None):
    """out[r] = reduce over CSR row r of x[indices].  XLA path: expand to
    sorted COO (dst = row id per edge is already sorted by construction)
    then segment reduce.
    """
    n = indptr.shape[0] - 1
    e = indices.shape[0]
    row_of_edge = (
        jnp.searchsorted(indptr, jnp.arange(e, dtype=indptr.dtype), side="right") - 1
    ).astype(jnp.int32)
    return segment_spmm(
        x, indices, row_of_edge, n, reduce=reduce, edge_weight=edge_weight,
        indices_are_sorted=True)
