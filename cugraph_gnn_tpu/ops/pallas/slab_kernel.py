"""Slab SpMM: banded-graph aggregation at MXU speed.

Why: on TPU, any SpMM formulation that fetches each edge's source row
individually is bound by the gather row-rate wall (~227M rows/s x 512B
= ~116 GB/s effective on v5e, measured in PERF_NOTES.md) — and on a
random graph there is no reuse to exploit, so that wall is the ceiling.
Real graphs are different: after RCM reordering (ops/reorder.py)
neighbors get nearby ids, so a block of output rows reads from a small
contiguous slab of input rows.  This kernel exploits that:

1. rows are processed in blocks of R; block b's in-band neighbors lie
   in the 3R-row slab [b*R - R, b*R + 2R) (bandwidth <= R after RCM);
2. the slab arrives by **contiguous DMA** (no gather at all);
3. the block's adjacency is built as a dense one-hot matrix A (R, 3R)
   on the VPU from ELL indices (K compare-accumulate passes);
4. aggregation is ONE MXU matmul: out_block = A @ x_slab.

Out-of-band / overflow edges (power-law tails) fall back to the
segment-sum path outside the kernel, so the result is exact for any
graph; the kernel only accelerates the in-band fraction.

The reference has no counterpart (GPU L2 absorbs locality; its SpMM is
PyG's). This is the TPU-first replacement for that cache, per
BASELINE.json's "SpMM at HBM speed-of-light" north star.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class SlabGraph(NamedTuple):
    """Host-preprocessed banded-ELL + fallback-COO split of a CSR graph.

    ell:        (n_blocks * R, K) int32 slab-local neighbor ids in
                [0, 3R), -1 padded.  Row i of block b is global row
                b*R + i; slab-local id j means global column
                b*R - R + j.
    ell_w:      optional (n_blocks * R, K) f32 edge weights.
    fb_src/fb_dst/fb_w: out-of-band + overflow edges as COO (global
                ids, -1 padded to a lane multiple); fb_w None when the
                graph is unweighted.
    degrees:    (num_rows,) total degree (band + fallback) for 'mean'.
    """

    ell: jax.Array
    ell_w: Optional[jax.Array]
    fb_src: jax.Array
    fb_dst: jax.Array
    fb_w: Optional[jax.Array]
    degrees: jax.Array
    num_rows: int
    block_rows: int
    n_blocks: int
    # Bit-packed adjacency (n_blocks * R, 128) int8: column c of the 3R
    # slab lives at byte c % 128, bit c // 128 (bit-plane layout chosen
    # so the in-kernel decode is tile-repeat + shift + mask — ~4 VPU
    # passes instead of K compare-accumulate passes, the round-2 VPU
    # bound; VERDICT r2 #3).  Requires 3R <= 1024 and a deduplicated
    # in-band edge set (duplicates ride the fallback).  None when
    # unavailable (large blocks).
    ell_bits: Optional[jax.Array] = None

    @property
    def band_fraction(self) -> float:
        """Fraction of edges served by the MXU slab path."""
        e_fb = int(np.asarray(self.fb_src >= 0).sum())
        e_all = int(np.asarray(self.degrees).sum())
        return 1.0 - e_fb / max(e_all, 1)


def build_slab_graph(indptr, indices, weights=None, *, block_rows: int = 256,
                     max_k: int = 64) -> SlabGraph:
    """Split a CSR into the banded ELL (|col - row| <= block_rows, up to
    max_k per row) and fallback COO.  One-time host preprocessing, like
    the reference's graph construction (ref data/graph_store.py:263-329).
    Use after :func:`cugraph_gnn_tpu.ops.reorder.reorder_csr` — RCM is
    what makes the band fraction high on real graphs."""
    indptr = np.asarray(indptr, np.int64)
    indices = np.asarray(indices, np.int32)
    n = len(indptr) - 1
    r_blk = int(block_rows)
    n_blocks = max(-(-n // r_blk), 1)
    n_pad = n_blocks * r_blk
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    rows = np.repeat(np.arange(n, dtype=np.int64), deg)
    cols = indices.astype(np.int64)
    valid = (cols >= 0) & (cols < n)
    inband = valid & (np.abs(cols - rows) <= r_blk)
    # rank of each in-band edge within its row (CSR edge order)
    cs = np.cumsum(inband.astype(np.int64))
    cs0 = np.concatenate([[0], cs])
    rank = cs0[1:] - cs0[indptr[rows]]  # 1-based among in-band
    keep = inband & (rank <= max_k)
    # dedupe parallel in-band edges: only the first (r, c) instance
    # stays in the band; duplicates ride the exact fallback (required
    # by the multiplicity-free bit-packed decode, and harmless for the
    # one-hot path — cnt folds into the fallback contribution)
    keep &= _first_occurrence_mask(rows, cols, keep, n)
    k_eff = int(rank[keep].max()) if keep.any() else 1
    k_eff = max(-(-k_eff // 8) * 8, 8)

    ell = np.full((n_pad, k_eff), -1, np.int32)
    blk = rows[keep] // r_blk
    slab_local = (cols[keep] - blk * r_blk + r_blk).astype(np.int32)
    ell[rows[keep], rank[keep] - 1] = slab_local
    ell_bits = _pack_bits(rows[keep], slab_local, n_pad, r_blk)
    ell_w = None
    if weights is not None:
        weights = np.asarray(weights, np.float32)
        ell_w = np.zeros((n_pad, k_eff), np.float32)
        ell_w[rows[keep], rank[keep] - 1] = weights[keep]

    fb = valid & ~keep
    pad = (-int(fb.sum())) % 128
    fb_src = np.concatenate([cols[fb].astype(np.int32),
                             np.full(pad, -1, np.int32)])
    fb_dst = np.concatenate([rows[fb].astype(np.int32),
                             np.full(pad, -1, np.int32)])
    fb_w = None
    if weights is not None:
        fb_w = np.concatenate([weights[fb], np.zeros(pad, np.float32)])
    return SlabGraph(
        ell=jnp.asarray(ell), ell_w=None if ell_w is None else jnp.asarray(ell_w),
        fb_src=jnp.asarray(fb_src), fb_dst=jnp.asarray(fb_dst),
        fb_w=None if fb_w is None else jnp.asarray(fb_w),
        degrees=jnp.asarray(np.bincount(
            rows[valid], minlength=n).astype(np.int32)),
        num_rows=n, block_rows=r_blk, n_blocks=n_blocks,
        ell_bits=None if ell_bits is None else jnp.asarray(ell_bits))


def _first_occurrence_mask(rows, cols, keep, n):
    """True at the first instance of each kept (row, col) pair."""
    first = np.ones(len(rows), bool)
    idx = np.nonzero(keep)[0]
    if len(idx):
        key = rows[idx] * np.int64(n) + cols[idx]
        order = np.argsort(key, kind="stable")
        dup = np.zeros(len(idx), bool)
        dup[order[1:]] = key[order[1:]] == key[order[:-1]]
        first[idx[dup]] = False
    return first


def _pack_bits(kept_rows, slab_local, n_pad, r_blk):
    """Bit-plane packing of the in-band adjacency: slab column c ->
    byte c % 128, bit c // 128 (decoded in-kernel by tile-repeat +
    per-lane shift).  None when 3R exceeds the 8-plane capacity."""
    if 3 * r_blk > 1024:
        return None
    bits = np.zeros((n_pad, 128), np.uint8)
    c = slab_local.astype(np.int64)
    np.bitwise_or.at(bits, (kept_rows, c % 128),
                     (1 << (c // 128)).astype(np.uint8))
    return bits.view(np.int8)


def _decode_bits(bits_block, r_blk):
    """(R, 128) int8 bit planes -> (R, 3R) float32 0/1 adjacency."""
    b = bits_block.astype(jnp.int32) & 0xFF
    n_rep = (3 * r_blk + 127) // 128
    rep = pltpu.repeat(b, repeats=n_rep, axis=1)
    bitpos = jax.lax.broadcasted_iota(
        jnp.int32, (r_blk, rep.shape[1]), 1) // 128
    a = ((rep >> bitpos) & 1).astype(jnp.float32)
    return a[:, : 3 * r_blk]


def _slab_kernel(k_width: int, weighted: bool, compute_dtype, *refs):
    if weighted:
        ell_ref, w_ref, x0, x1, x2, o_ref = refs
    else:
        ell_ref, x0, x1, x2, o_ref = refs
        w_ref = None
    idx = ell_ref[...]                              # (R, K)
    r_blk = idx.shape[0]
    slab = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)  # (3R, F)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk, 3 * r_blk), 1)
    a = jnp.zeros((r_blk, 3 * r_blk), jnp.float32)
    one = jnp.float32(1.0)
    for k in range(k_width):
        sel = iota == idx[:, k][:, None]
        wk = w_ref[...][:, k][:, None] if weighted else one
        a = a + jnp.where(sel, wk, 0.0)
    out = jnp.dot(a.astype(compute_dtype), slab.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _slab_bits_kernel(r_blk: int, g_stack: int, compute_dtype,
                      bits_ref, xm0, xc, xm1, o_ref):
    """Unweighted slab aggregation with the bit-packed adjacency.

    Round-4 plane-matmul form: the bit-plane layout (slab column c at
    byte c % 128, bit c // 128) means plane b's (R, 128) 0/1 matrix
    multiplies exactly the 128-row x stripe [b*128, (b+1)*128) — so the
    aggregation is 3R/128 small MXU dots with `(bits >> b) & 1` as the
    left operand.  No dense (R, 3R) one-hot is ever built: one bit-
    extract pass per plane and every dot has the MXU-native 128
    contraction.

    Round-5 G-stacking: each grid step processes ``g_stack`` R-row
    sub-blocks from ONE (G+2)R-row slab (xm0 | xc | xm1) — the 3-part
    layout re-fetched every row 3x; the stacked slab's margin amortizes
    to (G+2)/G, taking the kernel from DMA-amplification-bound to near
    the HBM roofline (chain-timed, PERF_NOTES round 5).  Sub-block j's
    3R window is slab rows [jR, jR + 3R).  Requires R % 128 == 0 (the
    builder's block sizes); falls back to decode + one big dot for
    g_stack == 1 otherwise."""
    f = o_ref.shape[1]
    if r_blk % 128 == 0:
        v = jnp.concatenate([xm0[...], xc[...], xm1[...]], axis=0)
        bits_all = bits_ref[...].astype(jnp.int32) & 0xFF
        for j in range(g_stack):
            bits = bits_all[j * r_blk:(j + 1) * r_blk]
            acc = jnp.zeros((r_blk, f), jnp.float32)
            for b in range(3 * r_blk // 128):
                m_b = ((bits >> b) & 1).astype(compute_dtype)  # (R, 128)
                x_b = v[j * r_blk + b * 128:
                        j * r_blk + b * 128 + 128]            # (128, F)
                acc = acc + jnp.dot(m_b, x_b.astype(compute_dtype),
                                    preferred_element_type=jnp.float32)
            o_ref[j * r_blk:(j + 1) * r_blk] = acc.astype(o_ref.dtype)
        return
    assert g_stack == 1, "non-128-multiple blocks use the decode path"
    slab = jnp.concatenate([xm0[...], xc[...], xm1[...]], axis=0)  # (3R, F)
    a = _decode_bits(bits_ref[...], r_blk)
    out = jnp.dot(a.astype(compute_dtype), slab.astype(compute_dtype),
                  preferred_element_type=jnp.float32)
    o_ref[...] = out.astype(o_ref.dtype)


def _g_stack_for(nb: int, g_max: int = 8) -> int:
    """Largest G in {8, 4, 2, 1} dividing the block count."""
    for g in (8, 4, 2):
        if g <= g_max and nb % g == 0:
            return g
    return 1


def _attn_g_stack(nb: int, r_blk: int, hf: int, x_item: int,
                  adj_row_bytes: int, budget: int = 3 << 20) -> int:
    """Largest G dividing the block count whose attention-forward block
    set ((G+2)R x HF slab, G*R x HF f32 output, adjacency + packed
    stats) fits the VMEM budget.  The budget is deliberately tight:
    double-buffered blocks PLUS the kernel's per-sub-block (R, 3R)
    score/softmax scratch must fit the 16MB/core scoped VMEM (g=8 at
    R=256, HF=128 compiles to 18.2MB — over)."""
    for g in (8, 4, 2, 1):
        if nb % g:
            continue
        need = ((g + 2) * r_blk * hf * x_item + g * r_blk * hf * 4
                + g * r_blk * (4 * 128 + 4 * 128 + adj_row_bytes))
        if need <= budget:
            return g
    return 1


def slab_spmm(graph: SlabGraph, x, reduce: str = "sum", *,
              compute_dtype=jnp.bfloat16, interpret: Optional[bool] = None):
    """out[r] = reduce over CSR row r of w * x[cols] via the slab MXU
    kernel + segment fallback.  reduce: 'sum' | 'mean'.  x: (N, F).

    Pass bf16 ``x`` for bf16 slab DMA (halves the dominant HBM
    traffic); the MXU accumulates f32 either way and the output is
    returned in x's dtype."""
    if reduce not in ("sum", "mean"):
        raise ValueError(f"slab_spmm supports sum/mean, got {reduce!r}")
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, f = x.shape
    r_blk = graph.block_rows
    nb = graph.n_blocks
    n_pad = nb * r_blk
    # x at n_pad rows, no +-R slab margin: slab margins use CLAMPED
    # block indices — out-of-range slab rows carry neighbor-block data
    # but no ELL entry / adjacency bit ever references them
    # (|col-row| <= R and cols in [0, n)), so their coefficient is 0.
    # Saves a full (N, F) copy per call (round-4 glue discipline).
    x_pad = x if n == n_pad else jnp.pad(x, ((0, n_pad - n), (0, 0)))

    weighted = graph.ell_w is not None
    if not weighted and graph.ell_bits is not None:
        # bit-packed fast path: 128B of adjacency per row + G-stacked
        # slabs (round 5: margin amplification (G+2)/G instead of 3x)
        g = _g_stack_for(nb) if r_blk % 128 == 0 else 1
        kern = functools.partial(_slab_bits_kernel, r_blk, g,
                                 compute_dtype)
        in_specs = [
            pl.BlockSpec((g * r_blk, 128), lambda b: (b, 0)),
            # leading margin (R rows), center (G*R rows), trailing (R)
            pl.BlockSpec((r_blk, f),
                         lambda b: (jnp.clip(b * g - 1, 0, nb - 1), 0)),
            pl.BlockSpec((g * r_blk, f), lambda b: (b, 0)),
            pl.BlockSpec((r_blk, f),
                         lambda b: (jnp.clip((b + 1) * g, 0, nb - 1), 0)),
        ]
        args = [graph.ell_bits, x_pad, x_pad, x_pad]
        grid = (nb // g,)
        out_spec = pl.BlockSpec((g * r_blk, f), lambda b: (b, 0))
        # bf16 x -> bf16 band output (f32 accumulation in-kernel; the
        # fallback add and mean divide below promote back to f32):
        # halves the output write on the bf16 training path
        out_dtype = x.dtype if x.dtype == jnp.bfloat16 else jnp.float32
    else:
        kern = functools.partial(
            _slab_kernel, graph.ell.shape[1], weighted, compute_dtype)
        in_specs = [pl.BlockSpec((r_blk, graph.ell.shape[1]),
                                 lambda b: (b, 0))]
        args = [graph.ell]
        if weighted:
            in_specs.append(
                pl.BlockSpec((r_blk, graph.ell.shape[1]),
                             lambda b: (b, 0)))
            args.append(graph.ell_w)
        in_specs += [
            pl.BlockSpec((r_blk, f),
                         lambda b, o=o: (jnp.clip(b + o - 1, 0, nb - 1), 0))
            for o in range(3)
        ]
        args += [x_pad, x_pad, x_pad]
        grid = (nb,)
        out_spec = pl.BlockSpec((r_blk, f), lambda b: (b, 0))
        out_dtype = jnp.float32
    out = pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, f), out_dtype),
        interpret=interpret,
    )(*args)[:n]

    if graph.fb_src.shape[0]:
        from cugraph_gnn_tpu.ops.spmm import segment_spmm
        fb = segment_spmm(x.astype(jnp.float32), graph.fb_src, graph.fb_dst,
                          n, reduce="sum", edge_weight=graph.fb_w)
        out = out + fb
    if reduce == "mean":
        out = out / jnp.maximum(graph.degrees[:n], 1)[:, None]
    return out.astype(x.dtype)


# ---------------------------------------------------------------------------
# Fused attention (SDDMM + edge softmax + weighted SpMM) over the slab
# ---------------------------------------------------------------------------


def lane_pack(cols, total_lanes: int, num_rows: int):
    """(num_rows, total_lanes) f32 with ``cols[j]`` ((N,) or (N,1)
    vectors) in lane j and zeros elsewhere, built as ONE fused
    select pass.  NEVER build such stats arrays with a concat of
    narrow columns: XLA materializes one full-array pass PER OPERAND
    (~20 ms at 2.45M rows on v5e — measured round 5, the single
    largest cost of the attention backward call).  Input vectors
    shorter than num_rows are zero-padded (rank-1 pads are compact)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, (num_rows, total_lanes), 1)
    out = jnp.zeros((num_rows, total_lanes), jnp.float32)
    for j, v in enumerate(cols):
        v = v.astype(jnp.float32).reshape(-1)
        if v.shape[0] != num_rows:
            v = jnp.pad(v, (0, num_rows - v.shape[0]))
        out = jnp.where(lane == j, v[:, None], out)
    return out


def _attn_cnt(ell_or_bits, r_blk, k_width, use_bits):
    """Block adjacency as f32 0/1 (bits) or multiplicity (ELL loop)."""
    if use_bits:
        return _decode_bits(ell_or_bits, r_blk)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk, 3 * r_blk), 1)
    cnt = jnp.zeros((r_blk, 3 * r_blk), jnp.float32)
    for k in range(k_width):
        cnt = cnt + jnp.where(iota == ell_or_bits[:, k][:, None], 1.0, 0.0)
    return cnt


def _slab_attn_fwd_kernel(k_width: int, use_bits: bool, heads: int, f: int,
                          r_blk: int, g_stack: int,
                          negative_slope: float, compute_dtype,
                          ell_ref, ad_ref, as0, as1, as2, x0, x1, x2,
                          u_ref, ms_ref):
    """Multi-head fused attention forward: the adjacency (the VPU-
    expensive part) is built ONCE per block — from the bit-packed
    planes when available — and reused by every head.  alpha_src
    arrives PRE-TRANSPOSED as (sub, R-multiple) column blocks (sublane
    h = head h) — no in-kernel (3R, 128) transpose and ~16x less stats
    DMA (round-4 glue discipline).  Softmax stats pack into ONE output:
    ms_ref (R, 128) lanes [0, H) = m, [64, 64 + H) = s (H <= 64).

    Round-5 G-stacking (same shape as _slab_bits_kernel's): one grid
    step processes ``g_stack`` R-row sub-blocks from ONE (G+2)R-row
    slab — the per-sub-block softmax/VPU work is unchanged but the
    dominant x-slab DMA amortizes from 3x to (G+2)/G.  Sub-block j's
    3R window is slab rows/cols [jR, jR + 3R)."""
    slab = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)  # ((G+2)R, HF)
    as_all = jnp.concatenate([as0[...], as1[...], as2[...]],
                             axis=1)                          # (sub, (G+2)R)
    ad_all = ad_ref[...]                                 # (GR, 128) lane h
    adj_all = ell_ref[...]
    ninf = jnp.float32(-jnp.inf)
    for j in range(g_stack):
        ad = ad_all[j * r_blk:(j + 1) * r_blk]
        cnt = _attn_cnt(adj_all[j * r_blk:(j + 1) * r_blk], r_blk,
                        k_width, use_bits)
        has_edge = cnt > 0
        as_t = as_all[:, j * r_blk:j * r_blk + 3 * r_blk]
        win = slab[j * r_blk:j * r_blk + 3 * r_blk]
        us, ms, ss = [], [], []
        for h in range(heads):
            e = ad[:, h:h + 1] + as_t[h:h + 1]           # (R, 3R)
            e = jnp.where(e >= 0, e, jnp.float32(negative_slope) * e)
            e = jnp.where(has_edge, e, ninf)
            m = jnp.max(e, axis=1, keepdims=True)        # (R, 1)
            m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
            p = jnp.where(has_edge, cnt * jnp.exp(e - m_safe), 0.0)
            ss.append(jnp.sum(p, axis=1, keepdims=True))
            ms.append(m_safe)
            us.append(jnp.dot(
                p.astype(compute_dtype),
                win[:, h * f:(h + 1) * f].astype(compute_dtype),
                preferred_element_type=jnp.float32))
        u_ref[j * r_blk:(j + 1) * r_blk] = jnp.concatenate(us, axis=1)
        pad_m = jnp.zeros((r_blk, 64 - heads), jnp.float32)
        pad_s = jnp.zeros((r_blk, 64 - heads), jnp.float32)
        ms_ref[j * r_blk:(j + 1) * r_blk] = jnp.concatenate(
            ms + [pad_m] + ss + [pad_s], axis=1)


def slab_attention_spmm_mh(graph: SlabGraph, x, alpha_dst, alpha_src, *,
                           negative_slope: float = 0.2,
                           compute_dtype=jnp.float32,
                           interpret: Optional[bool] = None,
                           return_stats: bool = False):
    """Multi-head fused attention aggregate: all H heads in ONE kernel
    pass (adjacency reconstruction amortized across heads, single
    dispatch).  x: (N, H, F); alpha_dst/alpha_src: (N, H).  Returns
    (N, H, F) f32 (+ per-head merged softmax stats (m, s), each (N, H),
    with ``return_stats``).  H <= 64 (packed stats output; callers
    with more heads chunk — ops/full_batch.py head groups)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    n, heads, f = x.shape
    if heads > 64:
        raise ValueError(f"slab_attention_spmm_mh supports <=64 heads, "
                         f"got {heads}")
    r_blk = graph.block_rows
    nb = graph.n_blocks
    n_pad = nb * r_blk
    ninf = jnp.float32(-jnp.inf)

    # round-4 glue discipline (see slab_attn_grad._onepass_bwd): all
    # arrays at n_pad rows, NO +-R slab margin — slab parts use CLAMPED
    # block indices (out-of-range slab rows are masked by the
    # adjacency); alpha_src rides pre-transposed (sub, n_pad); center
    # alpha_dst is one lane-layout block; m/s pack into one output.
    def _rows_to_npad(v, dtype=jnp.float32):
        # x keeps its own dtype (bf16 features ride bf16 slab DMA; the
        # f32 round-trip materialized a full (N, H*F) f32 copy per call
        # even when n == n_pad — ADVICE r4); stats stay f32
        v = v.astype(dtype).reshape(n, -1)
        return v if n == n_pad else jnp.pad(v, ((0, n_pad - n), (0, 0)))

    x_pad = _rows_to_npad(x, x.dtype)
    ad2 = alpha_dst.astype(jnp.float32).reshape(n, heads)
    ad_pad = lane_pack([ad2[:, h] for h in range(heads)], 128, n_pad)
    sub = max(-(-heads // 8) * 8, 8)
    as_t = jnp.zeros((sub, n_pad), jnp.float32)
    as_t = jax.lax.dynamic_update_slice(
        as_t, alpha_src.astype(jnp.float32).reshape(n, heads).T, (0, 0))

    k_w = graph.ell.shape[1]
    use_bits = graph.ell_bits is not None
    adj = graph.ell_bits if use_bits else graph.ell
    hf = heads * f
    # G-stacking (round 5): amortize the x-slab DMA to (G+2)/G, capped
    # by a VMEM budget (~6MB of blocks; x2 for pipelining stays well
    # under the 16MB/core VMEM).
    g = _attn_g_stack(nb, r_blk, hf, x_pad.dtype.itemsize,
                      adj.shape[1] * adj.dtype.itemsize)
    kern = functools.partial(_slab_attn_fwd_kernel, k_w, use_bits, heads,
                             f, r_blk, g, negative_slope, compute_dtype)
    lead = lambda b: (jnp.clip(b * g - 1, 0, nb - 1), 0)
    trail = lambda b: (jnp.clip((b + 1) * g, 0, nb - 1), 0)
    lead_c = lambda b: (0, jnp.clip(b * g - 1, 0, nb - 1))
    trail_c = lambda b: (0, jnp.clip((b + 1) * g, 0, nb - 1))
    ell_spec = pl.BlockSpec((g * r_blk, adj.shape[1]), lambda b: (b, 0))
    ad_spec = pl.BlockSpec((g * r_blk, 128), lambda b: (b, 0))
    as_specs = [pl.BlockSpec((sub, r_blk), lead_c),
                pl.BlockSpec((sub, g * r_blk), lambda b: (0, b)),
                pl.BlockSpec((sub, r_blk), trail_c)]
    x_specs = [pl.BlockSpec((r_blk, hf), lead),
               pl.BlockSpec((g * r_blk, hf), lambda b: (b, 0)),
               pl.BlockSpec((r_blk, hf), trail)]
    u, ms_b = pl.pallas_call(
        kern,
        grid=(nb // g,),
        in_specs=[ell_spec, ad_spec] + as_specs + x_specs,
        out_specs=[pl.BlockSpec((g * r_blk, hf), lambda b: (b, 0)),
                   pl.BlockSpec((g * r_blk, 128), lambda b: (b, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_pad, hf), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)],
        interpret=interpret,
    )(adj, ad_pad, as_t, as_t, as_t, x_pad, x_pad, x_pad)
    u = u[:n].reshape(n, heads, f)
    m_b, s_b = ms_b[:n, :heads], ms_b[:n, 64:64 + heads]
    m_out = m_b

    src, dst = graph.fb_src, graph.fb_dst
    if src.shape[0]:
        valid = (src >= 0) & (dst >= 0)
        sv = jnp.where(valid, src, 0)
        dv = jnp.where(valid, dst, n)
        d0 = jnp.where(valid, dst, 0)
        e_fb = (alpha_dst.astype(jnp.float32)[d0]
                + alpha_src.astype(jnp.float32)[sv])       # (E, H)
        e_fb = jnp.where(e_fb >= 0, e_fb, jnp.float32(negative_slope) * e_fb)
        e_fb = jnp.where(valid[:, None], e_fb, ninf)
        m_f_seg = jax.ops.segment_max(e_fb, dv, num_segments=n + 1)[:n]
        m_f = jnp.where(jnp.isfinite(m_f_seg), m_f_seg, 0.0)
        p_fb = jnp.where(valid[:, None], jnp.exp(e_fb - m_f[d0]), 0.0)
        s_f = jax.ops.segment_sum(p_fb, dv, num_segments=n + 1)[:n]
        u_f = jax.ops.segment_sum(
            p_fb[:, :, None] * x.astype(jnp.float32)[sv], dv,
            num_segments=n + 1)[:n]
        m = jnp.maximum(m_b, m_f)
        wb = jnp.where(s_b > 0, jnp.exp(m_b - m), 0.0)
        wf = jnp.where(s_f > 0, jnp.exp(m_f - m), 0.0)
        u = u * wb[..., None] + u_f * wf[..., None]
        s_b = s_b * wb + s_f * wf
        m_out = m
    out = u / jnp.maximum(s_b, 1e-16)[..., None]
    if return_stats:
        return out, m_out, s_b
    return out


def slab_attention_spmm(graph: SlabGraph, x, alpha_dst, alpha_src, *,
                        negative_slope: float = 0.2,
                        compute_dtype=jnp.float32,
                        interpret: Optional[bool] = None,
                        return_stats: bool = False):
    """Fused GAT-style attention aggregate over the banded slab:

        e_rc   = leakyrelu(alpha_dst[r] + alpha_src[c])   (edges only)
        out[r] = sum_c softmax_r(e_r:)_c * x[c]

    PyG GATConv scoring (additive attention), softmax over ALL of row
    r's edges — in-band scores/aggregates run on the MXU in one pass;
    out-of-band/overflow edges go through the segment path and merge
    into the same numerically-stable softmax (log-sum-exp merge), so
    the result is exact for any graph.  x: (N, F); alpha_*: (N,).
    Returns (N, F) f32; with ``return_stats`` also the merged softmax
    stats (m, s) per row — the residuals the backward pass
    (ops/pallas/slab_attn_grad.py) needs to reconstruct per-edge
    attention from per-node scalars.

    Implemented as the H=1 case of the multi-head kernel (one shared
    glue-optimized path; round 4).
    """
    res = slab_attention_spmm_mh(
        graph, x[:, None, :], alpha_dst[:, None], alpha_src[:, None],
        negative_slope=negative_slope, compute_dtype=compute_dtype,
        interpret=interpret, return_stats=return_stats)
    if return_stats:
        out, m, s = res
        return out[:, 0], m[:, 0], s[:, 0]
    return res[:, 0]
