"""Backward pass for the fused slab attention kernel.

Forward (ops/pallas/slab_kernel.py::slab_attention_spmm) computes, per
destination row r over its edges (r <- c):

    z_rc   = alpha_dst[r] + alpha_src[c]
    e_rc   = leakyrelu(z_rc)
    out[r] = sum_c softmax_r(e_r:)_c * x[c]

The backward pass needs three gradients.  With a = p/s the normalized
attention (p = exp(e - m), s = row softmax denominator) and
t[r] = g[r] . out[r]:

    dx[c]         = sum_r a_rc * g[r]                       (transpose SpMM)
    de_rc         = a_rc * (g[r].x[c] - t[r]) * lrelu'(z)   (softmax bwd)
    dalpha_dst[r] = sum_c de_rc
    dalpha_src[c] = sum_r de_rc

Everything is a per-edge quantity reconstructible from PER-NODE scalars
(alpha_dst, alpha_src, m, s, t) — so the backward rides the same banded
slab structure as the forward, with g[r].x[c] as one extra MXU matmul
per block (g_block @ slab_x^T).  Two kernels:

  * dst-kernel over the forward band: row sums -> dalpha_dst;
  * src-kernel over the TRANSPOSE band: dx = a^T @ g_slab and row sums
    of de^T -> dalpha_src.

For the two orientations to cover exactly the same edges, the band
split must be symmetric: `build_attention_slab_pair` keeps an edge
in-band only if it fits the per-row cap in BOTH orientations (hub
columns spill to the segment fallback, which computes all three
gradients exactly for the leftover edges).

Reference analog: none — the reference's GAT backward is PyG/cuDNN
autograd; this is the TPU-first equivalent of that fused attention
backward (ref model math comes from PyG per SURVEY.md §2.2 "GNN model
zoo").
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
    SlabGraph,
    _decode_bits,
    _first_occurrence_mask,
    _pack_bits,
)

# packed per-node stats lanes (one lane-replicated f32 array, 128 lanes):
_AD, _M, _S, _T, _AS = 0, 1, 2, 3, 4


class AttnSlabPair(NamedTuple):
    """Banded split for attention: `fwd` is a regular SlabGraph
    (consumable by slab_attention_spmm).  When the bit-packed adjacency
    is available (3R <= 1024) the one-pass backward needs ONLY the
    forward orientation, so `t_ell`/`t_bits` are None and edges are
    kept by forward rank alone (hub columns stay on the fast path —
    ADVICE r4).  Without bits, `t_ell` is the transpose-orientation ELL
    over the SAME in-band edge set (row = source node, entries =
    slab-local destination rows) with a symmetric per-row cap so the
    two-orientation kernels cover identical edges."""

    fwd: SlabGraph
    t_ell: Optional[jax.Array] = None
    t_bits: Optional[jax.Array] = None


def build_attention_slab_pair(indptr, indices, *, block_rows: int = 256,
                              max_k: int = 64,
                              to_device: bool = True) -> AttnSlabPair:
    """Split a CSR into a banded ELL plus fallback COO for the fused
    attention kernels.  One-time host preprocessing.

    With bit planes available (3R <= 1024): forward-rank cap only, no
    transpose structures (the one-pass backward runs over the forward
    orientation; building and device-placing t_ell/t_bits wasted host
    time + device memory and the symmetric cap spilled hub columns to
    the fallback unnecessarily — ADVICE r4).  Otherwise: the cap
    applies in BOTH orientations so the two-orientation backward covers
    exactly the banded edges.

    to_device=False keeps every array as host numpy (callers that place
    the structures themselves — e.g. the sharded path — and callers
    that may run inside a jit trace, where jnp.asarray would yield
    tracers)."""
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
    # forward rank within row (CSR edge order), 1-based among in-band
    cs0 = np.concatenate([[0], np.cumsum(inband.astype(np.int64))])
    rank_f = cs0[1:] - cs0[indptr[rows]]
    cand = inband & (rank_f <= max_k)
    # dedupe parallel in-band edges (multiplicity-free bit decode);
    # duplicates ride the exact fallback
    cand &= _first_occurrence_mask(rows, cols, cand, n)

    def _width(r):
        return max(-(-max(int(r), 1) // 8) * 8, 8)

    bits_ok = 3 * r_blk <= 1024
    if bits_ok:
        # one-pass backward: forward orientation only
        keep = cand
        t_ell = t_bits = None
        k_t = None
    else:
        # transpose rank within column among candidates (stable CSR
        # order); symmetric cap for the two-orientation kernels
        pos = np.nonzero(cand)[0]
        order = np.argsort(cols[pos], kind="stable")
        pc = pos[order]
        colc = cols[pc]
        starts = np.concatenate(
            [[0], np.nonzero(colc[1:] != colc[:-1])[0] + 1])
        run_start = np.zeros(len(pc), np.int64)
        run_start[starts] = starts
        run_start = np.maximum.accumulate(run_start)
        rank_t = np.arange(len(pc), dtype=np.int64) - run_start  # 0-based
        keep = np.zeros(len(rows), bool)
        kept_pc = pc[rank_t < max_k]
        keep[kept_pc] = True
        k_t = _width((rank_t[rank_t < max_k].max() + 1) if keep.any()
                     else 1)
        t_ell = np.full((n_pad, k_t), -1, np.int32)
        kt = rank_t[rank_t < max_k]
        t_blk = cols[kept_pc] // r_blk
        t_slab_local = (rows[kept_pc] - t_blk * r_blk
                        + r_blk).astype(np.int32)
        t_ell[cols[kept_pc], kt] = t_slab_local
        t_bits = None

    k_f = _width(rank_f[keep].max()) if keep.any() else 8
    ell = np.full((n_pad, k_f), -1, np.int32)
    blk = rows[keep] // r_blk
    ell[rows[keep], rank_f[keep] - 1] = (
        cols[keep] - blk * r_blk + r_blk).astype(np.int32)
    ell_bits = _pack_bits(
        rows[keep], (cols[keep] - (rows[keep] // r_blk) * r_blk
                     + r_blk).astype(np.int32), n_pad, r_blk)

    fb = valid & ~keep
    pad = (-int(fb.sum())) % 128
    fb_src = np.concatenate([cols[fb].astype(np.int32),
                             np.full(pad, -1, np.int32)])
    fb_dst = np.concatenate([rows[fb].astype(np.int32),
                             np.full(pad, -1, np.int32)])
    degrees = np.bincount(rows[valid], minlength=n).astype(np.int32)
    conv = jnp.asarray if to_device else np.asarray
    copt = lambda a: None if a is None else conv(a)
    fwd = SlabGraph(
        ell=conv(ell), ell_w=None,
        fb_src=conv(fb_src), fb_dst=conv(fb_dst), fb_w=None,
        degrees=conv(degrees),
        num_rows=n, block_rows=r_blk, n_blocks=n_blocks,
        ell_bits=copt(ell_bits))
    return AttnSlabPair(fwd=fwd, t_ell=copt(t_ell), t_bits=copt(t_bits))


def _bwd_onepass_kernel(heads, f, sub, r_blk, g_stack, negative_slope,
                        compute_dtype,
                        bits_ref, stc_ref, as0, as1, as2, x0, x1, x2,
                        gc_ref, dad_ref, dxc_ref, dxm_ref, das_ref):
    """One-pass backward over the FORWARD orientation only (round 4).

    The two-orientation scheme decodes two adjacencies, runs two
    softmax reconstructions and three block matmuls per head.  But all
    three gradients are functions of the same per-edge de_rc:

        dad[r] = sum_c de_rc      (row sums    -> direct)
        das[c] = sum_r de_rc      (COLUMN sums -> per-slab-column sums,
                                   accumulated in VMEM, margins merged
                                   by the epilogue)
        dx[c]  = sum_r a_rc g[r]  (alpha^T @ g_center, accumulated the
                                   same way)

    so one decode + one exp + TWO matmuls per head suffice, the
    transpose adjacency disappears, and g is read as the center block
    only (not a 3R slab).  The slab side needs only alpha_src, which
    arrives PRE-TRANSPOSED (sublane h = head h, lanes = node rows) as
    (sub, R-multiple) column blocks — no in-kernel transpose and no
    128-lane stats slab.  Center stats ride one (R, 128) lane block
    (slot*H + h for slot in AD, M, S, T).

    Round-5 G-stacking: each grid step processes ``g_stack`` R-row
    sub-blocks from ONE (G+2)R slab, and — the bigger win — the
    per-sub-block dx/das slab contributions ACCUMULATE in VMEM across
    sub-blocks, so the dx output traffic drops from three full planes
    (3x N*H*F) to one center plane plus two R-row margins per grid step
    ((1 + 2/G)x), and the x slab DMA from 3x to (G+2)/G.  Outputs:
      dad_ref (G*R, 128)       lane h = head h row sums
      dxc_ref (G*R, H*F)       center dx plane (global rows directly)
      dxm_ref (R, 2*H*F)       lanes [0, HF) = leading-margin plane
                               (global block b*G - 1), [HF, 2HF) =
                               trailing (block (b+1)*G)
      das_ref (sub, (G+2)*R)   sublane h = head h column sums over the
                               full slab (center cols [R, (G+1)R))
    """
    cd = compute_dtype
    slab_x = jnp.concatenate([x0[...], x1[...], x2[...]],
                             axis=0)                         # ((G+2)R, HF)
    as_all = jnp.concatenate([as0[...], as1[...], as2[...]],
                             axis=1)                         # (sub, (G+2)R)
    stc_all = stc_ref[...]
    gc_all = gc_ref[...]                                     # (GR, HF)
    bits_all = bits_ref[...]
    ns = jnp.float32(negative_slope)
    hf = heads * f
    if g_stack > 1:
        acc_dx = jnp.zeros(((g_stack + 2) * r_blk, hf), jnp.float32)
        acc_das = jnp.zeros((sub, (g_stack + 2) * r_blk), jnp.float32)
    for j in range(g_stack):
        a = _decode_bits(bits_all[j * r_blk:(j + 1) * r_blk],
                         r_blk)                              # (R, 3R)
        blk = stc_all[j * r_blk:(j + 1) * r_blk]
        gc = gc_all[j * r_blk:(j + 1) * r_blk]               # (R, HF)
        win_x = slab_x[j * r_blk:j * r_blk + 3 * r_blk]      # (3R, HF)
        as_t = as_all[:, j * r_blk:j * r_blk + 3 * r_blk]    # (sub, 3R)
        dads, dxs, dass = [], [], []
        for h in range(heads):
            ad = blk[:, 0 * heads + h:0 * heads + h + 1]     # (R, 1)
            m = blk[:, 1 * heads + h:1 * heads + h + 1]
            s = blk[:, 2 * heads + h:2 * heads + h + 1]
            t = blk[:, 3 * heads + h:3 * heads + h + 1]
            as_row = as_t[h:h + 1]                           # (1, 3R)
            z = ad + as_row                                  # (R, 3R)
            lr = jnp.where(z >= 0, z, ns * z)
            alpha = jnp.where(a > 0, jnp.exp(lr - m), 0.0) / s
            gh = gc[:, h * f:(h + 1) * f]
            xh = win_x[:, h * f:(h + 1) * f]
            gx = jax.lax.dot_general(
                gh.astype(cd), xh.astype(cd),
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)          # (R, 3R)
            de = alpha * (gx - t) * jnp.where(z >= 0, 1.0, ns)
            dads.append(jnp.sum(de, axis=1, keepdims=True))
            dxs.append(jax.lax.dot_general(
                alpha.astype(cd), gh.astype(cd),
                dimension_numbers=(((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32))         # (3R, F)
            dass.append(jnp.sum(de, axis=0, keepdims=True))  # (1, 3R)
        lane_pad = jnp.zeros((r_blk, 128 - heads), jnp.float32)
        dad_ref[j * r_blk:(j + 1) * r_blk] = jnp.concatenate(
            dads + [lane_pad], axis=1)
        dx_j = jnp.concatenate(dxs, axis=1)                  # (3R, HF)
        das_pad = jnp.zeros((sub - heads, 3 * r_blk), jnp.float32)
        das_j = jnp.concatenate(dass + [das_pad], axis=0)    # (sub, 3R)
        if g_stack == 1:
            # direct write — the VMEM accumulator's copy passes cost
            # real time at large HF (the mh case runs g=1)
            dxc_ref[...] = dx_j[r_blk:2 * r_blk]
            dxm_ref[...] = jnp.concatenate(
                [dx_j[:r_blk], dx_j[2 * r_blk:]], axis=1)
            das_ref[...] = das_j
            return
        # static-slice accumulate via concat (jnp .at[].add lowers to a
        # scatter whose empty index constants pallas rejects;
        # lax.dynamic_slice has no Mosaic TC lowering)
        mid = acc_dx[j * r_blk:j * r_blk + 3 * r_blk] + dx_j
        acc_dx = jnp.concatenate(
            [p for p in (acc_dx[:j * r_blk], mid,
                         acc_dx[j * r_blk + 3 * r_blk:])
             if p.shape[0]], axis=0)
        dmid = acc_das[:, j * r_blk:j * r_blk + 3 * r_blk] + das_j
        acc_das = jnp.concatenate(
            [p for p in (acc_das[:, :j * r_blk], dmid,
                         acc_das[:, j * r_blk + 3 * r_blk:])
             if p.shape[1]], axis=1)
    dxc_ref[...] = acc_dx[r_blk:(g_stack + 1) * r_blk]
    dxm_ref[...] = jnp.concatenate(
        [acc_dx[:r_blk], acc_dx[(g_stack + 1) * r_blk:]], axis=1)
    das_ref[...] = acc_das


def _bwd_g_stack(nb: int, r_blk: int, hf: int, xg_item: int,
                 budget: int = (9 << 20) // 2) -> int:
    """Largest G dividing the block count whose one-pass-backward block
    set ((G+2)R x HF x slab + G*R x HF g/dxc + margins + stats/adj) and
    (G+2)R x HF f32 VMEM accumulator fit the budget (x2 for pipelining
    plus the (R, 3R) softmax scratch must stay under 16MB/core)."""
    for g in (8, 4, 2, 1):
        if nb % g:
            continue
        need = ((g + 2) * r_blk * hf * xg_item      # x slab
                + g * r_blk * hf * xg_item          # g center
                + (g + 2) * r_blk * hf * 4          # acc_dx (+ dxc out)
                + g * r_blk * hf * 4                # dxc out block
                + g * r_blk * (4 * 128 + 4 * 128 + 128))  # stats/dad/bits
        if need <= budget:
            return g
    return 1


def _merge_gstack_margins(center, lead, trail, r_blk, g_stack):
    """Epilogue of the G-stacked one-pass backward: add each grid
    step's leading-margin plane to the previous step's last R center
    rows and its trailing plane to the next step's first R rows
    (out-of-range margins — grid 0's lead, last grid's trail — carry
    only adjacency-masked zeros and are dropped).  center: (n_pad, W)
    viewed as (nbg, G*R, W); lead/trail: (nbg*R, W).  Pure pad/concat
    adds — an .at[].add here lowers to a scatter, which costs several
    ms at full scale."""
    w = center.shape[1]
    gr = g_stack * r_blk
    nbg = center.shape[0] // gr
    c = center.reshape(nbg, gr, w)
    lead = lead.reshape(nbg, r_blk, w)
    trail = trail.reshape(nbg, r_blk, w)
    if nbg > 1:
        # the .at form measures ~3 ms faster than pad/concat adds at
        # full scale (the concats materialize (n_pad, W) temporaries)
        c = c.at[:-1, gr - r_blk:].add(lead[1:])
        c = c.at[1:, :r_blk].add(trail[:-1])
    return c.reshape(nbg * gr, w)


def _onepass_bwd(graph: SlabGraph, x, alpha_dst, alpha_src, m, s, t, g,
                 *, negative_slope, compute_dtype, interpret):
    """Band-edge gradients via the one-pass kernel.  x/g (N, H, F);
    alpha_*/m/s/t (N, H).  Returns (dx (N,H,F), dad (N,H), das (N,H))
    for the IN-BAND edges only (caller adds the fallback terms)."""
    n, heads, f = x.shape
    r_blk = graph.block_rows
    nb = graph.n_blocks
    n_pad = nb * r_blk
    hf = heads * f
    s_safe = jnp.maximum(s, 1e-16)

    # Glue discipline (the bare kernel is ~5x cheaper than naive XLA
    # prep/epilogue — benchmarks/attn_bwd_probe.py): every array lives
    # at n_pad rows with NO +-R slab margin; slab parts use CLAMPED
    # block indices instead (out-of-range slab rows carry neighbor-
    # block data but their alpha is 0 — bits only mark real edges).
    def _rows_to_npad(v, dtype=jnp.float32):
        # x/g keep their dtype (bf16 activations halve the slab DMA;
        # the kernel casts at the dots) — stats stay f32
        v = v.astype(dtype).reshape(n, -1)
        return v if n == n_pad else jnp.pad(v, ((0, n_pad - n), (0, 0)))

    # center stats, lane layout slot*H + h, built as ONE fused select
    # pass (lane_pack; a concat of narrow columns costs one full-array
    # pass PER OPERAND — ~20 ms of the 47 ms r4 backward, measured
    # round 5).  s rides with padding rows forced to 1 (divisor).
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import lane_pack
    cols = []
    for slot, v in enumerate((alpha_dst, m, s_safe, t)):
        vv = v.astype(jnp.float32).reshape(n, heads)
        if slot == 2 and n != n_pad:
            vv = jnp.pad(vv, ((0, n_pad - n), (0, 0)),
                         constant_values=1.0)
        cols.extend([vv[:, h] for h in range(heads)])
    st_pad = lane_pack(cols, 128, n_pad)
    sub = max(-(-heads // 8) * 8, 8)
    # slab-side alpha_src, PRE-transposed: (sub, n_pad), sublane h
    as_t = jnp.zeros((sub, n_pad), jnp.float32)
    as_t = jax.lax.dynamic_update_slice(
        as_t, alpha_src.astype(jnp.float32).reshape(n, heads).T, (0, 0))
    x_pad = _rows_to_npad(x, x.dtype)
    g_pad = _rows_to_npad(g, g.dtype)

    gst = _bwd_g_stack(nb, r_blk, hf,
                       max(x_pad.dtype.itemsize, g_pad.dtype.itemsize))
    nbg = nb // gst
    lead = lambda b: (jnp.clip(b * gst - 1, 0, nb - 1), 0)
    trail = lambda b: (jnp.clip((b + 1) * gst, 0, nb - 1), 0)
    lead_c = lambda b: (0, jnp.clip(b * gst - 1, 0, nb - 1))
    trail_c = lambda b: (0, jnp.clip((b + 1) * gst, 0, nb - 1))
    slab_specs = lambda width: [
        pl.BlockSpec((r_blk, width), lead),
        pl.BlockSpec((gst * r_blk, width), lambda b: (b, 0)),
        pl.BlockSpec((r_blk, width), trail)]
    as_specs = [pl.BlockSpec((sub, r_blk), lead_c),
                pl.BlockSpec((sub, gst * r_blk), lambda b: (0, b)),
                pl.BlockSpec((sub, r_blk), trail_c)]
    dad_b, dxc, dxm, das_g = pl.pallas_call(
        functools.partial(_bwd_onepass_kernel, heads, f, sub, r_blk,
                          gst, negative_slope, compute_dtype),
        grid=(nbg,),
        in_specs=[pl.BlockSpec((gst * r_blk, graph.ell_bits.shape[1]),
                               lambda b: (b, 0)),
                  pl.BlockSpec((gst * r_blk, 128), lambda b: (b, 0))]
        + as_specs + slab_specs(hf)
        + [pl.BlockSpec((gst * r_blk, hf), lambda b: (b, 0))],
        out_specs=[pl.BlockSpec((gst * r_blk, 128), lambda b: (b, 0)),
                   pl.BlockSpec((gst * r_blk, hf), lambda b: (b, 0)),
                   pl.BlockSpec((r_blk, 2 * hf), lambda b: (b, 0)),
                   pl.BlockSpec((sub, (gst + 2) * r_blk),
                                lambda b: (b, 0))],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, hf), jnp.float32),
                   jax.ShapeDtypeStruct((nbg * r_blk, 2 * hf),
                                        jnp.float32),
                   jax.ShapeDtypeStruct((nbg * sub, (gst + 2) * r_blk),
                                        jnp.float32)],
        interpret=interpret,
    )(graph.ell_bits, st_pad, as_t, as_t, as_t, x_pad, x_pad, x_pad,
      g_pad)
    dad = dad_b[:n, :heads]
    dx = _merge_gstack_margins(dxc, dxm[:, :hf], dxm[:, hf:], r_blk,
                               gst)[:n].reshape(n, heads, f)
    # das: sublane h of each (sub, (G+2)R) grid block holds head h's
    # column sums over the slab; split center/margins and merge.
    das3 = das_g.reshape(nbg, sub, gst + 2, r_blk)[:, :heads]
    das_c = jnp.transpose(das3[:, :, 1:gst + 1], (0, 2, 3, 1)) \
        .reshape(n_pad, heads)
    das_l = jnp.transpose(das3[:, :, 0], (0, 2, 1)).reshape(-1, heads)
    das_t = jnp.transpose(das3[:, :, gst + 1], (0, 2, 1)) \
        .reshape(-1, heads)
    das = _merge_gstack_margins(das_c, das_l, das_t, r_blk, gst)[:n]
    return dx, dad, das


def _onehot_expzm(idx, z, m_row_or_col, negative_slope, k_width):
    """a[r, c] = adjacency * exp(lrelu(z) - m), adjacency accumulated
    from ELL entries (K passes).  Only the no-bits fallback kernels use
    this — with bit planes the one-pass backward intercepts (ADVICE
    r4: the bits branch here was unreachable)."""
    r_blk = idx.shape[0]
    lr = jnp.where(z >= 0, z, jnp.float32(negative_slope) * z)
    expzm = jnp.exp(lr - m_row_or_col)
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk, z.shape[1]), 1)
    p = jnp.zeros(z.shape, jnp.float32)
    for k in range(k_width):
        p = p + jnp.where(iota == idx[:, k][:, None], expzm, 0.0)
    return p


def _bwd_fused_kernel(k_f, k_t, negative_slope, compute_dtype,
                      ellf_ref, ellt_ref, st0, st1, st2,
                      x0, x1, x2, g0, g1, g2,
                      dad_ref, dx_ref, das_ref):
    """Fused backward: both orientations in ONE grid pass so the x, g
    and stats slabs are DMA'd once instead of once per kernel (the
    split dst+src scheme re-reads ~14R rows/block of HBM; fused reads
    ~9R — the round-3 attack on the bwd bandwidth gap).  The center
    blocks (x1, g1, st1) double as the row-block operands.
    compute_dtype: MXU input dtype for the three (R,3R)x(3R,F) dots —
    bf16 runs the MXU at native rate (f32 accumulate either way);
    softmax reconstruction stays f32 on the VPU."""
    cd = compute_dtype
    slab_x = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)   # (3R, F)
    slab_g = jnp.concatenate([g0[...], g1[...], g2[...]], axis=0)   # (3R, F)
    st_s = jnp.concatenate([st0[...], st1[...], st2[...]], axis=0)  # (3R,128)
    st_t = jnp.transpose(st_s, (1, 0))                              # (128,3R)
    st_blk = st1[...]
    ns = jnp.float32(negative_slope)

    # -- dst orientation (fwd adjacency): rows are destinations --------
    as_row = st_t[_AS:_AS + 1]                                      # (1, 3R)
    ad = st_blk[:, _AD:_AD + 1]                                     # (R, 1)
    m = st_blk[:, _M:_M + 1]
    s = st_blk[:, _S:_S + 1]
    t = st_blk[:, _T:_T + 1]
    z = ad + as_row                                                 # (R, 3R)
    alpha = _onehot_expzm(ellf_ref[...], z, m, negative_slope, k_f) / s
    gx = jax.lax.dot_general(
        g1[...].astype(cd), slab_x.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                         # (R, 3R)
    de = alpha * (gx - t) * jnp.where(z >= 0, 1.0, ns)
    dad = jnp.sum(de, axis=1, keepdims=True)
    dad_ref[...] = jnp.broadcast_to(dad, dad_ref.shape)

    # -- src orientation (transpose adjacency): rows are sources -------
    ad_row = st_t[_AD:_AD + 1]
    m_row = st_t[_M:_M + 1]
    s_row = st_t[_S:_S + 1]
    t_row = st_t[_T:_T + 1]
    as_col = st_blk[:, _AS:_AS + 1]                                 # (R, 1)
    z2 = as_col + ad_row                                            # (R, 3R)
    alpha_t = _onehot_expzm(ellt_ref[...], z2, m_row, negative_slope,
                            k_t) / s_row
    dx = jnp.dot(alpha_t.astype(cd), slab_g.astype(cd),
                 preferred_element_type=jnp.float32)                # (R, F)
    gx_t = jax.lax.dot_general(
        x1[...].astype(cd), slab_g.astype(cd),
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)                         # (R, 3R)
    de_t = alpha_t * (gx_t - t_row) * jnp.where(z2 >= 0, 1.0, ns)
    das = jnp.sum(de_t, axis=1, keepdims=True)
    dx_ref[...] = dx
    das_ref[...] = jnp.broadcast_to(das, das_ref.shape)


def _pad_rows(x, r_blk, n_pad, fill=0.0):
    n, f = x.shape
    out = jnp.full((n_pad + 2 * r_blk, f), jnp.asarray(fill, x.dtype))
    return jax.lax.dynamic_update_slice(out, x, (r_blk, 0))


def slab_attention_bwd(pair: AttnSlabPair, x, alpha_dst, alpha_src,
                       m, s, t, g, *, negative_slope: float = 0.2,
                       compute_dtype=jnp.float32, interpret=None):
    """Gradients (dx, dalpha_dst, dalpha_src) of the fused attention
    aggregate, given the forward's merged softmax stats (m, s) and
    t[r] = g[r] . out[r].  Band edges run on the MXU slab kernels;
    fallback edges through segment ops.  Outputs f32; compute_dtype
    sets the MXU input precision of the block dots (bf16 = native MXU
    rate, f32 accumulate)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    graph = pair.fwd
    n, f = x.shape
    if graph.ell_bits is not None:
        dx_b, dad_b, das_b = _onepass_bwd(
            graph, x[:, None, :], alpha_dst[:, None], alpha_src[:, None],
            m[:, None], s[:, None], t[:, None], g[:, None, :],
            negative_slope=negative_slope, compute_dtype=compute_dtype,
            interpret=interpret)
        dx_b, dad_b, das_b = dx_b[:, 0], dad_b[:, 0], das_b[:, 0]
        return _add_fallback_grads(graph, x, alpha_dst, alpha_src, m,
                                   jnp.maximum(s, 1e-16), t, g,
                                   negative_slope, dx_b, dad_b, das_b)
    r_blk = graph.block_rows
    nb = graph.n_blocks
    n_pad = nb * r_blk
    s_safe = jnp.maximum(s, 1e-16)
    stats = jnp.zeros((n, 128), jnp.float32)
    for lane, v in ((_AD, alpha_dst), (_M, m), (_S, s_safe), (_T, t),
                    (_AS, alpha_src)):
        stats = stats.at[:, lane].set(v.astype(jnp.float32))
    st_pad = _pad_rows(stats, r_blk, n_pad)
    # lane _S must stay safe (nonzero) in padding rows too
    st_pad = st_pad.at[:r_blk, _S].set(1.0)
    st_pad = st_pad.at[r_blk + n:, _S].set(1.0)
    x_pad = _pad_rows(x.astype(jnp.float32), r_blk, n_pad)
    g_pad = _pad_rows(g.astype(jnp.float32), r_blk, n_pad)

    k_f = graph.ell.shape[1]
    k_t = pair.t_ell.shape[1]
    slab_specs = lambda width: [
        pl.BlockSpec((r_blk, width), lambda b, o=o: (b + o, 0))
        for o in range(3)]
    ell_spec = lambda width: pl.BlockSpec((r_blk, width), lambda b: (b, 0))
    out_spec = lambda width: pl.BlockSpec((r_blk, width), lambda b: (b, 0))

    adj_f, adj_t = graph.ell, pair.t_ell
    dad_b, dx_b, das_b = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, k_f, k_t,
                          negative_slope, compute_dtype),
        grid=(nb,),
        in_specs=[ell_spec(adj_f.shape[1]), ell_spec(adj_t.shape[1])]
        + slab_specs(128) + slab_specs(f) + slab_specs(f),
        out_specs=[out_spec(128), out_spec(f), out_spec(128)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, f), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)],
        interpret=interpret,
    )(adj_f, adj_t, st_pad, st_pad, st_pad,
      x_pad, x_pad, x_pad, g_pad, g_pad, g_pad)
    dad_b, dx_b, das_b = dad_b[:n, 0], dx_b[:n], das_b[:n, 0]
    return _add_fallback_grads(graph, x, alpha_dst, alpha_src, m, s_safe,
                               t, g, negative_slope, dx_b, dad_b, das_b)


def _add_fallback_grads(graph, x, alpha_dst, alpha_src, m, s_safe, t, g,
                        negative_slope, dx_b, dad_b, das_b):
    """Add the out-of-band (segment-path) edge gradients to the band
    kernel's (dx, dad, das).  Single-head: x/g (N, F), stats (N,)."""
    n = x.shape[0]
    src, dst = graph.fb_src, graph.fb_dst
    if src.shape[0]:
        valid = (src >= 0) & (dst >= 0)
        sv = jnp.where(valid, src, 0)
        dv = jnp.where(valid, dst, 0)
        seg_d = jnp.where(valid, dst, n)
        seg_s = jnp.where(valid, src, n)
        ad32 = alpha_dst.astype(jnp.float32)
        as32 = alpha_src.astype(jnp.float32)
        z = ad32[dv] + as32[sv]
        lr = jnp.where(z >= 0, z, jnp.float32(negative_slope) * z)
        a_e = jnp.where(valid, jnp.exp(lr - m[dv]) / s_safe[dv], 0.0)
        g32 = g.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        gx_e = jnp.sum(g32[dv] * x32[sv], axis=-1)
        dz = jnp.where(z >= 0, 1.0, jnp.float32(negative_slope))
        de = a_e * (gx_e - t[dv]) * dz
        dx_b = dx_b + jax.ops.segment_sum(
            a_e[:, None] * g32[dv], seg_s, num_segments=n + 1)[:n]
        dad_b = dad_b + jax.ops.segment_sum(
            de, seg_d, num_segments=n + 1)[:n]
        das_b = das_b + jax.ops.segment_sum(
            de, seg_s, num_segments=n + 1)[:n]
    return dx_b, dad_b, das_b


# ---------------------------------------------------------------------------
# Multi-head: all H heads in one kernel pass.  Per-head stats pack into
# lanes of one 128-lane array (5 stats x H heads -> H <= 25): lane layout
# slot*H + h for slot in (AD, M, S, T, AS).
# ---------------------------------------------------------------------------

MAX_PACKED_HEADS = 25


def _mh_cnt(idx, r_blk, k_width):
    iota = jax.lax.broadcasted_iota(jnp.int32, (r_blk, 3 * r_blk), 1)
    cnt = jnp.zeros((r_blk, 3 * r_blk), jnp.float32)
    for k in range(k_width):
        cnt = cnt + jnp.where(iota == idx[:, k][:, None], 1.0, 0.0)
    return cnt


def _bwd_fused_kernel_mh(k_f, k_t, heads, f, negative_slope,
                         compute_dtype,
                         ellf_ref, ellt_ref, st0, st1, st2,
                         x0, x1, x2, g0, g1, g2,
                         dad_ref, dx_ref, das_ref):
    """Fused multi-head backward: one grid pass over both orientations
    — the (3R, H*F) x and g slabs, and the packed-stats slab, are DMA'd
    once and shared by all heads AND both orientations (the split mh
    scheme re-read every slab twice).  compute_dtype sets the MXU input
    precision of the per-head dots (f32 accumulate either way)."""
    cd = compute_dtype
    r_blk = st1.shape[0]
    slab_x = jnp.concatenate([x0[...], x1[...], x2[...]], axis=0)   # (3R,H*F)
    slab_g = jnp.concatenate([g0[...], g1[...], g2[...]], axis=0)   # (3R,H*F)
    st_s = jnp.concatenate([st0[...], st1[...], st2[...]], axis=0)
    st_t = jnp.transpose(st_s, (1, 0))                              # (128,3R)
    blk = st1[...]
    cnt_f = _mh_cnt(ellf_ref[...], r_blk, k_f)
    cnt_t = _mh_cnt(ellt_ref[...], r_blk, k_t)
    edge_f = cnt_f > 0
    edge_t = cnt_t > 0
    ninf = jnp.float32(-jnp.inf)
    ns = jnp.float32(negative_slope)
    g = g1[...].astype(jnp.float32)
    x = x1[...].astype(jnp.float32)
    dads, dxs, dass = [], [], []
    for h in range(heads):
        # dst orientation
        ad = blk[:, 0 * heads + h:0 * heads + h + 1]                # (R, 1)
        m = blk[:, 1 * heads + h:1 * heads + h + 1]
        s = blk[:, 2 * heads + h:2 * heads + h + 1]
        t = blk[:, 3 * heads + h:3 * heads + h + 1]
        as_row = st_t[4 * heads + h:4 * heads + h + 1]              # (1, 3R)
        z = ad + as_row                                             # (R, 3R)
        e = jnp.where(z >= 0, z, ns * z)
        e = jnp.where(edge_f, e, ninf)
        alpha = cnt_f * jnp.exp(e - m) / s
        xh = slab_x[:, h * f:(h + 1) * f].astype(cd)
        gx = jax.lax.dot_general(
            g[:, h * f:(h + 1) * f].astype(cd), xh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (R, 3R)
        de = alpha * (gx - t) * jnp.where(z >= 0, 1.0, ns)
        dads.append(jnp.sum(de, axis=1, keepdims=True))
        # src orientation
        as_col = blk[:, 4 * heads + h:4 * heads + h + 1]            # (R, 1)
        ad_row = st_t[0 * heads + h:0 * heads + h + 1]              # (1, 3R)
        m_row = st_t[1 * heads + h:1 * heads + h + 1]
        s_row = st_t[2 * heads + h:2 * heads + h + 1]
        t_row = st_t[3 * heads + h:3 * heads + h + 1]
        z2 = as_col + ad_row                                        # (R, 3R)
        e2 = jnp.where(z2 >= 0, z2, ns * z2)
        e2 = jnp.where(edge_t, e2, ninf)
        alpha_t = cnt_t * jnp.exp(e2 - m_row) / s_row
        gh = slab_g[:, h * f:(h + 1) * f].astype(cd)
        dxs.append(jnp.dot(alpha_t.astype(cd), gh,
                           preferred_element_type=jnp.float32))     # (R, F)
        gx_t = jax.lax.dot_general(
            x[:, h * f:(h + 1) * f].astype(cd), gh,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)                     # (R, 3R)
        de_t = alpha_t * (gx_t - t_row) * jnp.where(z2 >= 0, 1.0, ns)
        dass.append(jnp.sum(de_t, axis=1, keepdims=True))
    pad = jnp.zeros((r_blk, 128 - heads), jnp.float32)
    dad_ref[...] = jnp.concatenate(dads + [pad], axis=1)
    dx_ref[...] = jnp.concatenate(dxs, axis=1)
    das_ref[...] = jnp.concatenate(dass + [pad], axis=1)


def slab_attention_bwd_mh(pair: AttnSlabPair, x, alpha_dst, alpha_src,
                          m, s, t, g, *, negative_slope: float = 0.2,
                          compute_dtype=jnp.float32, interpret=None):
    """Multi-head backward: x/g (N, H, F); alpha_*/m/s/t (N, H).
    Returns (dx (N,H,F), dalpha_dst (N,H), dalpha_src (N,H)).
    H <= MAX_PACKED_HEADS (5 packed stat lanes per head).
    compute_dtype: MXU input precision of the block dots."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    graph = pair.fwd
    n, heads, f = x.shape
    if heads > MAX_PACKED_HEADS:
        raise ValueError(f"slab_attention_bwd_mh supports "
                         f"<={MAX_PACKED_HEADS} heads, got {heads}")
    if graph.ell_bits is not None:
        dx_b, dad_b, das_b = _onepass_bwd(
            graph, x, alpha_dst, alpha_src, m, s, t, g,
            negative_slope=negative_slope, compute_dtype=compute_dtype,
            interpret=interpret)
        return _add_fallback_grads_mh(graph, x, alpha_dst, alpha_src, m,
                                      jnp.maximum(s, 1e-16), t, g,
                                      negative_slope, dx_b, dad_b, das_b)
    r_blk = graph.block_rows
    nb = graph.n_blocks
    n_pad = nb * r_blk
    s_safe = jnp.maximum(s, 1e-16)
    stats = jnp.zeros((n, 128), jnp.float32)
    for slot, v in ((0, alpha_dst), (1, m), (2, s_safe), (3, t),
                    (4, alpha_src)):
        stats = jax.lax.dynamic_update_slice(
            stats, v.astype(jnp.float32), (0, slot * heads))
    st_pad = _pad_rows(stats, r_blk, n_pad)
    # S lanes must stay nonzero in padding rows (divisor)
    ones = jnp.ones((1, heads), jnp.float32)
    st_pad = jax.lax.dynamic_update_slice(
        st_pad, jnp.broadcast_to(ones, (r_blk, heads)), (0, 2 * heads))
    st_pad = jax.lax.dynamic_update_slice(
        st_pad, jnp.broadcast_to(ones, (r_blk + n_pad - n, heads)),
        (r_blk + n, 2 * heads))
    hf = heads * f
    x_pad = _pad_rows(x.reshape(n, hf).astype(jnp.float32), r_blk, n_pad)
    g_pad = _pad_rows(g.reshape(n, hf).astype(jnp.float32), r_blk, n_pad)

    k_f = graph.ell.shape[1]
    k_t = pair.t_ell.shape[1]
    blk_spec = lambda width: pl.BlockSpec((r_blk, width), lambda b: (b + 1, 0))
    slab_specs = lambda width: [
        pl.BlockSpec((r_blk, width), lambda b, o=o: (b + o, 0))
        for o in range(3)]
    ell_spec = lambda width: pl.BlockSpec((r_blk, width), lambda b: (b, 0))
    out_spec = lambda width: pl.BlockSpec((r_blk, width), lambda b: (b, 0))

    adj_f, adj_t = graph.ell, pair.t_ell
    dad_b, dx_b, das_b = pl.pallas_call(
        functools.partial(_bwd_fused_kernel_mh, k_f, k_t,
                          heads, f, negative_slope, compute_dtype),
        grid=(nb,),
        in_specs=[ell_spec(adj_f.shape[1]), ell_spec(adj_t.shape[1])]
        + slab_specs(128) + slab_specs(hf) + slab_specs(hf),
        out_specs=[out_spec(128), out_spec(hf), out_spec(128)],
        out_shape=[jax.ShapeDtypeStruct((n_pad, 128), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, hf), jnp.float32),
                   jax.ShapeDtypeStruct((n_pad, 128), jnp.float32)],
        interpret=interpret,
    )(adj_f, adj_t, st_pad, st_pad, st_pad,
      x_pad, x_pad, x_pad, g_pad, g_pad, g_pad)
    dad_b = dad_b[:n, :heads]
    dx_b = dx_b[:n].reshape(n, heads, f)
    das_b = das_b[:n, :heads]
    return _add_fallback_grads_mh(graph, x, alpha_dst, alpha_src, m,
                                  s_safe, t, g, negative_slope,
                                  dx_b, dad_b, das_b)


def _add_fallback_grads_mh(graph, x, alpha_dst, alpha_src, m, s_safe, t,
                           g, negative_slope, dx_b, dad_b, das_b):
    """Multi-head fallback-edge gradients: x/g (N, H, F), stats (N, H)."""
    n = x.shape[0]
    src, dst = graph.fb_src, graph.fb_dst
    if src.shape[0]:
        valid = (src >= 0) & (dst >= 0)
        sv = jnp.where(valid, src, 0)
        dv = jnp.where(valid, dst, 0)
        seg_d = jnp.where(valid, dst, n)
        seg_s = jnp.where(valid, src, n)
        ad32 = alpha_dst.astype(jnp.float32)
        as32 = alpha_src.astype(jnp.float32)
        z = ad32[dv] + as32[sv]                                     # (E, H)
        lr = jnp.where(z >= 0, z, jnp.float32(negative_slope) * z)
        a_e = jnp.where(valid[:, None],
                        jnp.exp(lr - m[dv]) / s_safe[dv], 0.0)
        g32 = g.astype(jnp.float32)
        x32 = x.astype(jnp.float32)
        gx_e = jnp.sum(g32[dv] * x32[sv], axis=-1)                  # (E, H)
        dz = jnp.where(z >= 0, 1.0, jnp.float32(negative_slope))
        de = a_e * (gx_e - t[dv]) * dz
        dx_b = dx_b + jax.ops.segment_sum(
            a_e[..., None] * g32[dv], seg_s, num_segments=n + 1)[:n]
        dad_b = dad_b + jax.ops.segment_sum(
            de, seg_d, num_segments=n + 1)[:n]
        das_b = das_b + jax.ops.segment_sum(
            de, seg_s, num_segments=n + 1)[:n]
    return dx_b, dad_b, das_b


def differentiable_slab_attention_mh(pair: AttnSlabPair, *,
                                     negative_slope: float = 0.2,
                                     bwd_compute_dtype=jnp.float32):
    """Multi-head differentiable fused attention:
    f(x (N,H,F), alpha_dst (N,H), alpha_src (N,H)) -> (N, H, F) f32.
    Forward and backward each run ONE kernel pass over all heads
    (adjacency reconstruction amortized; per-head stats in packed
    lanes).  H <= MAX_PACKED_HEADS.  bwd_compute_dtype=bf16 runs the
    backward's MXU dots at native rate (f32 accumulate) — standard
    mixed-precision gradient noise, default stays f32-exact."""
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm_mh

    @jax.custom_vjp
    def f(x, alpha_dst, alpha_src):
        return slab_attention_spmm_mh(pair.fwd, x, alpha_dst, alpha_src,
                                      negative_slope=negative_slope)

    def fwd(x, alpha_dst, alpha_src):
        out, m, s = slab_attention_spmm_mh(pair.fwd, x, alpha_dst, alpha_src,
                                           negative_slope=negative_slope,
                                           return_stats=True)
        return out, (x, alpha_dst, alpha_src, out, m, s)

    def bwd(res, g):
        x, alpha_dst, alpha_src, out, m, s = res
        t = jnp.sum(g.astype(jnp.float32) * out, axis=-1)           # (N, H)
        dx, dad, das = slab_attention_bwd_mh(
            pair, x, alpha_dst, alpha_src, m, s, t, g,
            negative_slope=negative_slope,
            compute_dtype=bwd_compute_dtype)
        return (dx.astype(x.dtype), dad.astype(alpha_dst.dtype),
                das.astype(alpha_src.dtype))

    f.defvjp(fwd, bwd)
    return f


def differentiable_slab_attention(pair: AttnSlabPair, *,
                                  negative_slope: float = 0.2,
                                  bwd_compute_dtype=jnp.float32):
    """Returns f(x, alpha_dst, alpha_src) -> (N, F) f32: the fused slab
    attention aggregate with a custom VJP (both passes on the MXU slab
    kernels).  Build once per graph and reuse under jit.
    bwd_compute_dtype=bf16 runs the backward dots at native MXU rate."""
    from cugraph_gnn_tpu.ops.pallas.slab_kernel import slab_attention_spmm

    @jax.custom_vjp
    def f(x, alpha_dst, alpha_src):
        return slab_attention_spmm(pair.fwd, x, alpha_dst, alpha_src,
                                   negative_slope=negative_slope)

    def fwd(x, alpha_dst, alpha_src):
        out, m, s = slab_attention_spmm(pair.fwd, x, alpha_dst, alpha_src,
                                        negative_slope=negative_slope,
                                        return_stats=True)
        return out, (x, alpha_dst, alpha_src, out, m, s)

    def bwd(res, g):
        x, alpha_dst, alpha_src, out, m, s = res
        t = jnp.sum(g.astype(jnp.float32) * out, axis=-1)
        dx, dad, das = slab_attention_bwd(
            pair, x, alpha_dst, alpha_src, m, s, t, g,
            negative_slope=negative_slope,
            compute_dtype=bwd_compute_dtype)
        return (dx.astype(x.dtype), dad.astype(alpha_dst.dtype),
                das.astype(alpha_src.dtype))

    f.defvjp(fwd, bwd)
    return f
