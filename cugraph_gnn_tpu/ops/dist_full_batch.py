"""Distributed full-batch slab SpMM: banded aggregation over a mesh.

The single-chip slab path (ops/pallas/slab_kernel.py) turns full-batch
aggregation on RCM-reordered graphs into contiguous-DMA + MXU matmuls.
This module shards it row-wise over a device mesh:

* After the banded split (|col - row| <= R), a shard owning rows
  [w*rs, (w+1)*rs) only ever reads x rows [w*rs - R, (w+1)*rs + R) for
  its in-band edges — the halo is ONE R-row block from each adjacent
  shard, exchanged with `lax.ppermute` over ICI.  Compare the
  reference's hot path, which must bucket/exchange per-edge ids every
  call (ref gather_op_impl_nccl.cu:89-157): the banded structure makes
  the communication volume O(R * F) per shard, independent of E.
* Off-band / overflow (fallback) edges are bucketed by DESTINATION
  shard at build time; their source rows are fetched inside the same
  shard_map body with the store's distributed-gather exchange
  (store/dist_array.py::_dist_gather_shard) and reduced locally — so
  the result is exact for any graph.  Memory model: shard_map needs
  equal per-shard buffers, so dst-bucketing pads to the max shard
  count — fine when fallback dsts are even, O(W * max) on hub-
  concentrated fallbacks.  _plan_fallback therefore switches to even
  E_fb/W chunks with global dst ids + one distributed scatter-add when
  max > 2x mean, bounding fallback memory at O(E_fb / W) per shard
  (VERDICT r4 weak #5; test_fallback_balance.py pins both regimes).
* Differentiable: d/dx (A @ x) = A^T @ g, and the transpose of a
  banded graph is banded with the same bandwidth, so the backward pass
  is the same sharded routine over the transposed structures
  (custom_vjp, mirroring ops/full_batch.py::_diff_slab_spmm).

The reference has no full-batch compute of its own (model math is
PyG's, SURVEY.md §2.2); this is TPU-first capability beyond parity —
full-batch GNN training sharded over a pod slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.store.dist_array import (
    _dist_gather_shard,
    _dist_scatter_shard,
    put_global,
)
from cugraph_gnn_tpu.store.partition import PartitionBook


def _bucket_fallback(fb_src, fb_dst, rows_per_shard: int, world: int,
                     bucket_by: str = "dst", localize: str = "dst",
                     fb_w=None):
    """Host-side: group fallback edges by ``bucket_by`` ('dst' or 'src')
    shard, pad every shard to the max count (shard_map needs equal
    per-shard shapes), and localize the ``localize`` side's ids to
    shard-relative offsets (the other side stays global for the a2a
    exchange).  Returns (W * cap,) src / dst arrays, -1 padded (plus a
    0-padded weight array when ``fb_w`` is given); all shape (0,) when
    the graph has no fallback edges at all (so the distributed-exchange
    branch compiles out)."""
    fb_src = np.asarray(fb_src)
    fb_dst = np.asarray(fb_dst)
    valid = (fb_src >= 0) & (fb_dst >= 0)
    fb_src, fb_dst = fb_src[valid], fb_dst[valid]
    if fb_w is not None:
        fb_w = np.asarray(fb_w, np.float32)[valid]
    if not len(fb_src):
        out = (np.zeros(0, np.int32),) * 2
        return out + (np.zeros(0, np.float32),) if fb_w is not None else out
    shard = (fb_dst if bucket_by == "dst" else fb_src) // rows_per_shard
    cap = int(np.bincount(shard, minlength=world).max(initial=0))
    cap = max(-(-cap // 128) * 128, 128)
    src_p = np.full((world, cap), -1, np.int32)
    dst_p = np.full((world, cap), -1, np.int32)
    w_p = np.zeros((world, cap), np.float32)
    for w in range(world):
        sel = shard == w
        k = int(sel.sum())
        src_p[w, :k] = fb_src[sel] - (w * rows_per_shard
                                      if localize == "src" else 0)
        dst_p[w, :k] = fb_dst[sel] - (w * rows_per_shard
                                      if localize == "dst" else 0)
        if fb_w is not None:
            w_p[w, :k] = fb_w[sel]
    if fb_w is not None:
        return src_p.reshape(-1), dst_p.reshape(-1), w_p.reshape(-1)
    return src_p.reshape(-1), dst_p.reshape(-1)


def _plan_fallback(fb_src, fb_dst, rows_per_shard: int, world: int,
                   fb_w=None, balance_threshold: float = 2.0):
    """Fallback-edge placement for the SpMM path with bounded memory:

    - When the per-dst-shard counts are roughly even (max <=
      ``balance_threshold`` x mean), bucket by destination shard
      (zero extra comms: contributions reduce locally).
    - On hub-concentrated fallbacks, dst-bucketing pads every shard's
      buffer to the max count — memory O(W * max) instead of O(E_fb)
      (the same max-shard pathology the edge-balanced graph partition
      fixed for sampling in round 3; VERDICT r4 weak #5).  Then edges
      are split into W EQUAL chunks instead (capacity ceil(E_fb / W)),
      dst ids stay GLOBAL, and the per-shard contributions return to
      their owners by one distributed scatter-add.

    Returns (src, dst[, w], balanced) — ids localized to the dst shard
    when ``balanced`` is False, global dst otherwise.
    """
    s = np.asarray(fb_src)
    d = np.asarray(fb_dst)
    valid = (s >= 0) & (d >= 0)
    s, d = s[valid], d[valid]
    w = None if fb_w is None else np.asarray(fb_w, np.float32)[valid]
    e = len(s)
    if e:
        counts = np.bincount(d // rows_per_shard, minlength=world)
        mx, mean = counts.max(), max(e / world, 1.0)
        balanced = mx > balance_threshold * mean
    else:
        balanced = False
    if not balanced:
        out = _bucket_fallback(fb_src, fb_dst, rows_per_shard, world,
                               fb_w=fb_w)
        return out + (False,)
    cap = max(-(-(-(-e // world)) // 128) * 128, 128)
    src_p = np.full((world, cap), -1, np.int32)
    dst_p = np.full((world, cap), -1, np.int32)
    w_p = np.zeros((world, cap), np.float32)
    for i in range(world):
        lo, hi = i * -(-e // world), min((i + 1) * -(-e // world), e)
        k = max(hi - lo, 0)
        src_p[i, :k] = s[lo:hi]
        dst_p[i, :k] = d[lo:hi]
        if w is not None:
            w_p[i, :k] = w[lo:hi]
    if fb_w is not None:
        return (src_p.reshape(-1), dst_p.reshape(-1), w_p.reshape(-1),
                True)
    return src_p.reshape(-1), dst_p.reshape(-1), True


def _halo_exchange(x_local, r_blk: int, axis: str, world: int):
    """x_ext = [prev shard's last R rows | x_local | next shard's first
    R rows]; boundary shards get zeros (ppermute's un-sourced default).
    """
    last = x_local[-r_blk:]
    first = x_local[:r_blk]
    halo_prev = jax.lax.ppermute(
        last, axis, [(w, w + 1) for w in range(world - 1)])
    halo_next = jax.lax.ppermute(
        first, axis, [(w, w - 1) for w in range(1, world)])
    return jnp.concatenate([halo_prev, x_local, halo_next], axis=0)


def _halo_reduce(c_ext, r_blk: int, axis: str, world: int):
    """Inverse of :func:`_halo_exchange` for ACCUMULATION: ``c_ext``
    (rs + 2R, W) holds [contributions to the prev shard's last R rows |
    local rows | contributions to the next shard's first R rows]; the
    margins ride one ppermute each way and are added to the owning
    shard's edge rows.  Boundary shards' outward margins vanish
    (un-sourced ppermute default = zeros received; the global graph
    never references rows beyond its ends, so their outgoing margins
    are zero anyway)."""
    top = c_ext[:r_blk]
    bot = c_ext[-r_blk:]
    from_next = jax.lax.ppermute(
        top, axis, [(w, w - 1) for w in range(1, world)])
    from_prev = jax.lax.ppermute(
        bot, axis, [(w, w + 1) for w in range(world - 1)])
    body = c_ext[r_blk:-r_blk]
    body = body.at[-r_blk:].add(from_next)
    return body.at[:r_blk].add(from_prev)


def _shard_spmm_body(ell_local, x_local, fb_src, fb_dst, ell_w=None,
                     fb_w=None, *, r_blk: int, k_width: int, world: int,
                     axis: str, book, compute_dtype, interpret: bool,
                     use_bits: bool = False, fb_balanced: bool = False):
    """Per-shard body: halo exchange -> slab MXU kernel over local
    blocks -> distributed fallback gather + local segment reduce.
    ``ell_w``/``fb_w``: optional per-edge weights (same layout as the
    ids).  With ``use_bits`` the first operand is the bit-packed
    adjacency (rs, 128) int8 instead of the ELL (decode + one matmul,
    no K compare passes).  ``fb_balanced``: fallback edges are split
    evenly across shards with GLOBAL dst ids (hub-skew memory bound,
    see _plan_fallback) — contributions return to their dst owners by
    one distributed scatter-add instead of the local segment reduce."""
    from jax.experimental import pallas as pl

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
        _slab_bits_kernel,
        _slab_kernel,
    )

    rs, f = x_local.shape[0], x_local.shape[1]
    nb_local = rs // r_blk
    x_ext = _halo_exchange(x_local, r_blk, axis, world)

    weighted = ell_w is not None
    if use_bits:
        # G=1 stacking: the sharded body keeps the 3 R-row slab specs
        # (the halo-extended x makes the (G+2)R center layout awkward
        # across shard boundaries)
        kern = functools.partial(_slab_bits_kernel, r_blk, 1,
                                 compute_dtype)
        ell_spec = pl.BlockSpec((r_blk, 128), lambda b: (b, 0))
    else:
        kern = functools.partial(_slab_kernel, k_width, weighted,
                                 compute_dtype)
        ell_spec = pl.BlockSpec((r_blk, k_width), lambda b: (b, 0))
    x_specs = [pl.BlockSpec((r_blk, f), lambda b, o=o: (b + o, 0))
               for o in range(3)]
    in_specs = [ell_spec] + ([ell_spec] if weighted else []) + x_specs
    args = ([ell_local, ell_w] if weighted else [ell_local]) + [x_ext] * 3
    out = pl.pallas_call(
        kern,
        grid=(nb_local,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((r_blk, f), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((rs, f), jnp.float32),
        interpret=interpret,
    )(*args)

    if fb_src.shape[0]:
        rows = _dist_gather_shard(
            x_local, fb_src, book=book, axis=axis, fill=0)
        rows = rows.astype(jnp.float32)
        if fb_w is not None:
            rows = rows * fb_w[:, None]
        if fb_balanced:
            # one distributed scatter-add returns this chunk's
            # contributions to their dst owners (repeated dsts
            # accumulate; -1 padding is dropped by the scatter)
            out = _dist_scatter_shard(
                out, fb_dst, rows, book=book, axis=axis, mode="add")
        else:
            seg = jnp.where(fb_dst >= 0, fb_dst, rs)
            out = out + jax.ops.segment_sum(
                rows, seg, num_segments=rs + 1)[:rs]
    return out


class DistFullBatchGraph:
    """Row-sharded full-batch message passing over ``mesh``.

    Same surface as :class:`cugraph_gnn_tpu.ops.FullBatchGraph` for the
    pieces that distribute (``spmm`` sum/mean, ``degrees``,
    ``to_graph_order``/``shard``), so the model zoo's ``full_graph``
    paths run unchanged on sharded node arrays.
    """

    def __init__(self, indptr, indices, mesh, *, weights=None,
                 axis: str = STORE_AXIS,
                 reorder: str = "auto", block_rows: int = 256,
                 max_k: int = 64):
        from cugraph_gnn_tpu.native import build_csr
        from cugraph_gnn_tpu.ops.pallas.slab_kernel import build_slab_graph
        from cugraph_gnn_tpu.ops.reorder import reorder_csr

        indptr = np.asarray(indptr)
        indices = np.asarray(indices, np.int32)
        if weights is not None:
            weights = np.asarray(weights, np.float32)
        n = len(indptr) - 1
        self.num_nodes = n
        self.mesh = mesh
        self.axis = axis
        world = mesh.shape[axis]
        self._order = None
        if reorder in ("rcm", "auto"):
            rg = reorder_csr(indptr, indices)
            if reorder == "rcm" or self._band_better(
                    indptr, indices, rg, block_rows):
                self._order = rg
                indptr, indices = rg.indptr, rg.indices
                if weights is not None:
                    weights = weights[np.asarray(rg.edge_perm)]
        elif reorder != "none":
            raise ValueError(f"unknown reorder {reorder!r}")

        slab = build_slab_graph(indptr, indices, weights,
                                block_rows=block_rows, max_k=max_k)
        self.band_fraction = slab.band_fraction
        self._indptr_g = np.asarray(indptr)
        self._indices_g = np.asarray(indices, np.int32)
        self._max_k = max_k
        self._attn = None
        self._diff_attn = {}
        r_blk = block_rows
        # pad the block count to a multiple of the mesh size
        nb_w = -(-slab.n_blocks // world) * world
        rs = (nb_w // world) * r_blk
        n_pad_w = nb_w * r_blk
        ell = np.asarray(slab.ell)
        if ell.shape[0] < n_pad_w:
            ell = np.concatenate([
                ell, np.full((n_pad_w - ell.shape[0], ell.shape[1]), -1,
                             np.int32)])
        self._rs = rs
        self._r_blk = r_blk
        self._n_pad = n_pad_w
        self._world = world
        self._book = PartitionBook.even(n_pad_w, world)
        sh = NamedSharding(mesh, P(axis))
        self._ell = put_global(ell, sh)
        self.weighted = weights is not None

        def pad_bits(bits):
            """Row-shard the bit-packed adjacency (zero rows = no
            in-band edges); None when the slab has no bits form."""
            if bits is None:
                return None
            bits = np.asarray(bits)
            if bits.shape[0] < n_pad_w:
                bits = np.concatenate([
                    bits, np.zeros((n_pad_w - bits.shape[0], 128),
                                   bits.dtype)])
            return put_global(bits, sh)

        # the bits fast path only replaces the unweighted adjacency
        self._ell_bits = (None if self.weighted
                          else pad_bits(slab.ell_bits))

        def pad_w(w_arr):
            w_arr = np.asarray(w_arr, np.float32)
            if w_arr.shape[0] < n_pad_w:
                w_arr = np.concatenate([
                    w_arr, np.zeros((n_pad_w - w_arr.shape[0],
                                     w_arr.shape[1]), np.float32)])
            return put_global(w_arr, sh)

        if self.weighted:
            self._ell_w = pad_w(np.asarray(slab.ell_w))
            fb_src, fb_dst, fb_w, self._fb_balanced = _plan_fallback(
                np.asarray(slab.fb_src), np.asarray(slab.fb_dst), rs,
                world, fb_w=np.asarray(slab.fb_w))
            self._fb_w = put_global(fb_w, sh)
        else:
            self._ell_w = self._fb_w = None
            fb_src, fb_dst, self._fb_balanced = _plan_fallback(
                np.asarray(slab.fb_src), np.asarray(slab.fb_dst), rs,
                world)
        self._fb_src = put_global(fb_src, sh)
        self._fb_dst = put_global(fb_dst, sh)
        deg = np.zeros(n_pad_w, np.int32)
        deg[:n] = np.asarray(slab.degrees)[:n]
        self.degrees = put_global(deg, sh)
        self._sharding = sh

        # transpose structures for the backward pass
        deg_np = indptr[1:] - indptr[:-1]
        rows_np = np.repeat(np.arange(n, dtype=np.int32),
                            deg_np.astype(np.int64))
        ok = (indices >= 0) & (indices < n)
        t_indptr, t_indices, t_perm = build_csr(indices[ok], rows_np[ok], n)
        w_t = (None if weights is None
               else weights[ok][np.asarray(t_perm)])
        slab_t = build_slab_graph(t_indptr, t_indices, w_t,
                                  block_rows=block_rows, max_k=max_k)
        ell_t = np.asarray(slab_t.ell)
        if ell_t.shape[0] < n_pad_w:
            ell_t = np.concatenate([
                ell_t, np.full((n_pad_w - ell_t.shape[0], ell_t.shape[1]),
                               -1, np.int32)])
        self._ell_t = put_global(ell_t, sh)
        self._ell_bits_t = (None if self.weighted
                            else pad_bits(slab_t.ell_bits))
        if self.weighted:
            self._ell_w_t = pad_w(np.asarray(slab_t.ell_w))
            tb_src, tb_dst, tb_w, self._fb_balanced_t = _plan_fallback(
                np.asarray(slab_t.fb_src), np.asarray(slab_t.fb_dst), rs,
                world, fb_w=np.asarray(slab_t.fb_w))
            self._fb_w_t = put_global(tb_w, sh)
        else:
            self._ell_w_t = self._fb_w_t = None
            tb_src, tb_dst, self._fb_balanced_t = _plan_fallback(
                np.asarray(slab_t.fb_src), np.asarray(slab_t.fb_dst), rs,
                world)
        self._fb_src_t = put_global(tb_src, sh)
        self._fb_dst_t = put_global(tb_dst, sh)
        self._diff = {}

    @staticmethod
    def _band_better(indptr, indices, rg, block_rows) -> bool:
        """auto mode: keep RCM only if it raises the in-band fraction."""
        n = len(indptr) - 1

        def frac(ip, ix):
            rows = np.repeat(np.arange(n, dtype=np.int64),
                             (np.asarray(ip)[1:] - np.asarray(ip)[:-1]))
            cols = np.asarray(ix, np.int64)
            ok = (cols >= 0) & (cols < n)
            if not ok.any():
                return 0.0
            return float((np.abs(cols[ok] - rows[ok]) <= block_rows).mean())

        return frac(rg.indptr, rg.indices) > frac(indptr, indices)

    # -- node-order / placement helpers ----------------------------------

    @property
    def order(self):
        return None if self._order is None else self._order.order

    @property
    def inv_order(self):
        return None if self._order is None else self._order.inv_order

    def to_graph_order(self, x):
        x = np.asarray(x)
        return x if self._order is None else x[np.asarray(self._order.order)]

    def shard(self, x, dtype=None):
        """Host node array (graph order, N rows) -> padded row-sharded
        device array (N_pad rows, P(axis))."""
        x = np.asarray(x)
        if dtype is not None:
            x = x.astype(dtype)
        pad = np.zeros((self._n_pad,) + x.shape[1:], x.dtype)
        pad[:self.num_nodes] = x[:self.num_nodes]
        return put_global(pad, self._sharding)

    def unshard(self, x):
        """Sharded padded array -> host array trimmed to N rows."""
        return np.asarray(x)[:self.num_nodes]

    # -- aggregation -------------------------------------------------------

    def spmm_arrays(self, transpose: bool = False):
        """(ell, fb_src, fb_dst) for :meth:`spmm_with_arrays` — pass
        these as jit ARGUMENTS when driving the graph through a
        dispatch tunnel, where closure-captured device arrays are
        re-shipped per dispatch (PERF_NOTES 'tunnel closure constants');
        on directly-attached TPU hosts the closure-based :meth:`spmm`
        is equivalent."""
        if transpose:
            return self._ell_t, self._fb_src_t, self._fb_dst_t
        return self._ell, self._fb_src, self._fb_dst

    def spmm_with_arrays(self, x, ell, fb_s, fb_d, *,
                         compute_dtype=jnp.float32):
        """Forward-only sum aggregation with the structure arrays as
        explicit operands (see :meth:`spmm_arrays`)."""
        return self._spmm_sharded(x, transpose=False,
                                  compute_dtype=compute_dtype,
                                  arrays=(ell, fb_s, fb_d))

    def _spmm_sharded(self, x, *, transpose: bool, compute_dtype,
                      arrays=None):
        interpret = jax.default_backend() != "tpu"
        ell_w = fb_w = bits = None
        if arrays is not None:
            ell, fb_s, fb_d = arrays
        elif transpose:
            ell, fb_s, fb_d = self._ell_t, self._fb_src_t, self._fb_dst_t
            ell_w, fb_w = self._ell_w_t, self._fb_w_t
            bits = self._ell_bits_t
        else:
            ell, fb_s, fb_d = self._ell, self._fb_src, self._fb_dst
            ell_w, fb_w = self._ell_w, self._fb_w
            bits = self._ell_bits
        use_bits = bits is not None and ell_w is None
        # the `arrays` path (spmm_with_arrays) carries THIS graph's
        # structure arrays, so the stored balanced flag still applies
        fb_balanced = (self._fb_balanced_t if transpose
                       else self._fb_balanced)
        body = functools.partial(
            _shard_spmm_body, r_blk=self._r_blk, k_width=ell.shape[1],
            world=self._world, axis=self.axis, book=self._book,
            compute_dtype=compute_dtype, interpret=interpret,
            use_bits=use_bits, fb_balanced=fb_balanced)
        if use_bits:
            ell = bits
        p = P(self.axis)
        # check_vma=False: pallas_call out_shapes don't carry vma
        # annotations yet
        if ell_w is not None:
            return jax.shard_map(
                body, mesh=self.mesh, in_specs=(p,) * 6, out_specs=p,
                check_vma=False,
            )(ell, x, fb_s, fb_d, ell_w, fb_w)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(p, p, p, p), out_specs=p,
            check_vma=False,
        )(ell, x, fb_s, fb_d)

    def spmm(self, x, reduce: str = "mean", *, compute_dtype=jnp.float32):
        """out[r] = reduce over row r's in-neighbors of x[c]; x and out
        are row-sharded (use :meth:`shard`).  Differentiable (transpose-
        graph backward on the same sharded path)."""
        if reduce not in ("sum", "mean"):
            raise ValueError(f"dist slab spmm supports sum/mean, got "
                             f"{reduce!r}")
        key = (reduce, compute_dtype)
        if key not in self._diff:
            deg = jnp.maximum(self.degrees, 1)

            @jax.custom_vjp
            def f(x):
                out = self._spmm_sharded(x, transpose=False,
                                         compute_dtype=compute_dtype)
                if reduce == "mean":
                    out = out / deg[:, None].astype(out.dtype)
                return out.astype(x.dtype)

            def fwd(x):
                return f(x), jnp.zeros((0,), x.dtype)

            def bwd(res, g):
                if reduce == "mean":
                    g = g / deg[:, None].astype(g.dtype)
                gx = self._spmm_sharded(g, transpose=True,
                                        compute_dtype=compute_dtype)
                return (gx.astype(res.dtype),)

            f.defvjp(fwd, bwd)
            self._diff[key] = f
        return self._diff[key](x)

    # -- fused attention over the mesh --------------------------------------

    def _attn_structs(self):
        """Lazily build the sharded symmetric attention split: fwd ELL +
        transpose ELL row-sharded, fallback edges bucketed BY DST (for
        the forward + dst-side backward) and BY SRC (for the src-side
        backward)."""
        if self._attn is None:
            from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                build_attention_slab_pair)
            # to_device=False: this may run lazily inside a user's jit
            # trace, where jnp arrays would be tracers — keep the build
            # pure-host and place shards explicitly below
            pair = build_attention_slab_pair(
                self._indptr_g, self._indices_g, block_rows=self._r_blk,
                max_k=self._max_k, to_device=False)
            sh = self._sharding

            def padded(e):
                e = np.asarray(e)
                if e.shape[0] < self._n_pad:
                    e = np.concatenate([
                        e, np.full((self._n_pad - e.shape[0], e.shape[1]),
                                   -1, np.int32)])
                return put_global(e, sh)

            fb_s = np.asarray(pair.fwd.fb_src)
            fb_d = np.asarray(pair.fwd.fb_dst)
            d_src, d_dst = _bucket_fallback(fb_s, fb_d, self._rs,
                                            self._world)
            # src-bucketed copy: local src ids, GLOBAL dst ids (the
            # src-side backward gathers dst-row quantities remotely)
            s_src, s_dst = _bucket_fallback(fb_s, fb_d, self._rs,
                                            self._world, bucket_by="src",
                                            localize="src")
            def padded_bits(bits):
                if bits is None:
                    return None
                bits = np.asarray(bits)
                if bits.shape[0] < self._n_pad:
                    bits = np.concatenate([
                        bits, np.zeros((self._n_pad - bits.shape[0], 128),
                                       bits.dtype)])
                return put_global(bits, sh)

            # transpose structures exist only on the no-bits fallback
            # path (block_rows > 341): with bits the one-pass backward
            # runs the forward orientation alone, so building and
            # device-placing t_ell would waste host time + (n_pad, K)
            # int32 of HBM per graph (ADVICE r4)
            self._attn = dict(
                ell=padded(np.asarray(pair.fwd.ell)),
                t_ell=(None if pair.t_ell is None
                       else padded(np.asarray(pair.t_ell))),
                bits=padded_bits(pair.fwd.ell_bits),
                fb_dst_bucketed=(put_global(d_src, sh),
                                 put_global(d_dst, sh)),
                fb_src_bucketed=(put_global(s_src, sh),
                                 put_global(s_dst, sh)),
            )
        return self._attn

    def _attn_fwd_sharded(self, x, alpha_dst, alpha_src, negative_slope):
        """Sharded forward: returns (out, m, s) row-sharded; exact LSE
        merge of band and fallback contributions per row."""
        st = self._attn_structs()
        interpret = jax.default_backend() != "tpu"
        r_blk, world, axis, book = (self._r_blk, self._world, self.axis,
                                    self._book)
        k_w = st["ell"].shape[1]
        use_bits = st["bits"] is not None
        adj = st["bits"] if use_bits else st["ell"]
        adj_w = adj.shape[1]
        fb_src, fb_dst = st["fb_dst_bucketed"]

        def body(ell_local, x_local, ad_local, as_local, fb_s, fb_d):
            import functools as ft

            from jax.experimental import pallas as pl

            from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
                _slab_attn_fwd_kernel)

            rs, f = x_local.shape
            nb_local = rs // r_blk
            x_ext = _halo_exchange(x_local, r_blk, axis, world)
            # exchange the (rs,) scalars, then PRE-TRANSPOSE to (8,
            # rs + 2R) column blocks (round-4 glue layout: ~16x less
            # stats DMA than lane-replication, no in-kernel transpose)
            as_e = _halo_exchange(as_local.astype(jnp.float32), r_blk,
                                  axis, world)
            as_t = jnp.zeros((8, rs + 2 * r_blk), jnp.float32)
            as_t = jax.lax.dynamic_update_slice(as_t, as_e[None], (0, 0))
            ad_l = jnp.concatenate(
                [ad_local.astype(jnp.float32)[:, None],
                 jnp.zeros((rs, 127), jnp.float32)], axis=1)
            # G=1 stacking: halo-extended x keeps the 3 R-row slab
            # specs (same reasoning as the sharded SpMM body)
            kern = ft.partial(_slab_attn_fwd_kernel, k_w, use_bits, 1, f,
                              r_blk, 1, negative_slope, jnp.float32)
            as_specs = [pl.BlockSpec((8, r_blk),
                                     lambda b, o=o: (0, b + o))
                        for o in range(3)]
            xl = [pl.BlockSpec((r_blk, f), lambda b, o=o: (b + o, 0))
                  for o in range(3)]
            u, ms_b = pl.pallas_call(
                kern, grid=(nb_local,),
                in_specs=[pl.BlockSpec((r_blk, adj_w), lambda b: (b, 0)),
                          pl.BlockSpec((r_blk, 128), lambda b: (b, 0))]
                + as_specs + xl,
                out_specs=[pl.BlockSpec((r_blk, f), lambda b: (b, 0)),
                           pl.BlockSpec((r_blk, 128), lambda b: (b, 0))],
                out_shape=[jax.ShapeDtypeStruct((rs, f), jnp.float32),
                           jax.ShapeDtypeStruct((rs, 128), jnp.float32)],
                interpret=interpret,
            )(ell_local, ad_l, as_t, as_t, as_t, x_ext, x_ext, x_ext)
            m_b, s_b = ms_b[:, 0], ms_b[:, 64]
            m_out = m_b

            if fb_s.shape[0]:
                # remote src rows: features + alpha_src in one exchange
                xa_local = jnp.concatenate(
                    [x_local.astype(jnp.float32),
                     as_local.astype(jnp.float32)[:, None]], axis=1)
                xa = _dist_gather_shard(xa_local, fb_s, book=book,
                                        axis=axis, fill=0)
                x_fb, as_fb = xa[:, :f], xa[:, f]
                valid = (fb_s >= 0) & (fb_d >= 0)
                dv = jnp.where(valid, fb_d, rs)
                d0 = jnp.where(valid, fb_d, 0)
                e = ad_local.astype(jnp.float32)[d0] + as_fb
                e = jnp.where(e >= 0, e,
                              jnp.float32(negative_slope) * e)
                e = jnp.where(valid, e, -jnp.inf)
                m_f_seg = jax.ops.segment_max(e, dv, num_segments=rs + 1)[
                    :rs]
                m_f = jnp.where(jnp.isfinite(m_f_seg), m_f_seg, 0.0)
                p = jnp.where(valid, jnp.exp(e - m_f[d0]), 0.0)
                s_f = jax.ops.segment_sum(p, dv, num_segments=rs + 1)[:rs]
                u_f = jax.ops.segment_sum(
                    p[:, None] * x_fb, dv, num_segments=rs + 1)[:rs]
                m = jnp.maximum(m_b, m_f)
                wb = jnp.where(s_b > 0, jnp.exp(m_b - m), 0.0)
                wf = jnp.where(s_f > 0, jnp.exp(m_f - m), 0.0)
                u = u * wb[:, None] + u_f * wf[:, None]
                s_b = s_b * wb + s_f * wf
                m_out = m
            out = u / jnp.maximum(s_b, 1e-16)[:, None]
            return out, m_out, s_b

        p = P(self.axis)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(p,) * 6,
            out_specs=(p, p, p), check_vma=False,
        )(adj, x, alpha_dst, alpha_src, fb_src, fb_dst)

    def _attn_bwd_sharded_onepass(self, x2, alpha_dst, alpha_src, m, s,
                                  t, g2, heads, fh, negative_slope):
        """One-pass sharded backward (round 4): single orientation over
        the forward bit-packed adjacency — dad = row sums, das = column
        sums, dx = alpha^T @ g_center, with the das/dx slab-margin
        contributions returned to their owning neighbor shards by ONE
        reverse-halo ppermute pair (replaces the transpose-band kernel,
        its t_bits structure, AND the g halo exchange).  x2/g2
        (N_pad, H*F) row-sharded; stats (N_pad, H).  Requires
        ``ell_bits`` (see slab_attn_grad._onepass_bwd for the scheme).
        """
        st = self._attn_structs()
        interpret = jax.default_backend() != "tpu"
        r_blk, world, axis, book = (self._r_blk, self._world, self.axis,
                                    self._book)
        bits = st["bits"]
        fb_src_l, fb_dst_g = st["fb_src_bucketed"]
        hf = heads * fh

        def body(bits_l, x_l, ad_l, as_l, m_l, s_l, t_l, g_l, fb_s,
                 fb_d):
            import functools as ft

            from jax.experimental import pallas as pl

            from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                _bwd_onepass_kernel)

            rs = x_l.shape[0]
            nb_local = rs // r_blk
            s_safe = jnp.maximum(s_l, 1e-16)
            # center stats (rs, 128), lane layout slot*H + h — LOCAL
            # rows only (the one-pass scheme needs no stats slab)
            stc = jnp.concatenate(
                [v.astype(jnp.float32) for v in (ad_l, m_l, s_safe, t_l)]
                + [jnp.zeros((rs, 128 - 4 * heads), jnp.float32)], axis=1)
            # slab-side alpha_src: halo-exchange (rs + 2R, H), then
            # pre-transpose to (sub, rs + 2R) column blocks
            sub = max(-(-heads // 8) * 8, 8)
            as_e = _halo_exchange(as_l.astype(jnp.float32), r_blk, axis,
                                  world)
            as_t = jnp.zeros((sub, rs + 2 * r_blk), jnp.float32)
            as_t = jax.lax.dynamic_update_slice(as_t, as_e.T, (0, 0))
            x_ext = _halo_exchange(x_l.astype(jnp.float32), r_blk, axis,
                                   world)

            blk = lambda w: pl.BlockSpec((r_blk, w), lambda b: (b, 0))
            slabs = lambda w: [
                pl.BlockSpec((r_blk, w), lambda b, o=o: (b + o, 0))
                for o in range(3)]
            as_specs = [pl.BlockSpec((sub, r_blk),
                                     lambda b, o=o: (0, b + o))
                        for o in range(3)]
            # G=1 stacking: the halo-extended x keeps the 3 R-row slab
            # specs; outputs arrive as center plane + [lead|trail]
            # margin block (round-5 kernel layout)
            dad_b, dxc, dxm, das3 = pl.pallas_call(
                ft.partial(_bwd_onepass_kernel, heads, fh, sub, r_blk,
                           1, negative_slope, jnp.float32),
                grid=(nb_local,),
                in_specs=[blk(128), blk(128)] + as_specs + slabs(hf)
                + [blk(hf)],
                out_specs=[blk(128), blk(hf), blk(2 * hf),
                           pl.BlockSpec((sub, 3 * r_blk),
                                        lambda b: (b, 0))],
                out_shape=[
                    jax.ShapeDtypeStruct((rs, 128), jnp.float32),
                    jax.ShapeDtypeStruct((rs, hf), jnp.float32),
                    jax.ShapeDtypeStruct((rs, 2 * hf), jnp.float32),
                    jax.ShapeDtypeStruct((nb_local * sub, 3 * r_blk),
                                         jnp.float32)],
                interpret=interpret,
            )(bits_l, stc, as_t, as_t, as_t, x_ext, x_ext, x_ext,
              g_l.astype(jnp.float32))
            dad = dad_b[:, :heads]

            # block b's lead plane row j contributes to local row
            # (b-1)R + j, center to bR + j, trail to (b+1)R + j;
            # assemble over the extended range, reverse-halo the
            # margins back to their owners (dx and das ride together)
            def ext_sum3(lead_p, center_p, trail_p):
                return (jnp.pad(lead_p, ((0, 2 * r_blk), (0, 0)))
                        + jnp.pad(center_p, ((r_blk, r_blk), (0, 0)))
                        + jnp.pad(trail_p, ((2 * r_blk, 0), (0, 0))))

            das_blocks = das3.reshape(
                nb_local, sub, 3, r_blk)[:, :heads]        # (nb, H, 3, R)
            das_p3 = jnp.transpose(das_blocks, (0, 3, 2, 1)) \
                .reshape(rs, 3 * heads)                    # [r][(o, h)]
            c_ext = jnp.concatenate(
                [ext_sum3(dxm[:, :hf], dxc, dxm[:, hf:]),
                 ext_sum3(das_p3[:, :heads], das_p3[:, heads:2 * heads],
                          das_p3[:, 2 * heads:])], axis=1)
            c = _halo_reduce(c_ext, r_blk, axis, world)
            dx, das = c[:, :hf], c[:, hf:]

            if fb_s.shape[0]:
                gq_local = jnp.concatenate(
                    [g_l.astype(jnp.float32),
                     ad_l.astype(jnp.float32), m_l, s_safe, t_l], axis=1)
                gq = _dist_gather_shard(gq_local, fb_d, book=book,
                                        axis=axis, fill=0)
                g_d = gq[:, :hf].reshape(-1, heads, fh)
                ad_d = gq[:, hf:hf + heads]
                m_d = gq[:, hf + heads:hf + 2 * heads]
                s_d = gq[:, hf + 2 * heads:hf + 3 * heads]
                t_d = gq[:, hf + 3 * heads:hf + 4 * heads]
                valid = (fb_s >= 0) & (fb_d >= 0)
                sv = jnp.where(valid, fb_s, 0)
                seg_s = jnp.where(valid, fb_s, rs)
                as32 = as_l.astype(jnp.float32)
                z = ad_d + as32[sv]                          # (cap, H)
                lr = jnp.where(z >= 0, z,
                               jnp.float32(negative_slope) * z)
                a_e = jnp.where(valid[:, None],
                                jnp.exp(lr - m_d)
                                / jnp.maximum(s_d, 1e-16), 0.0)
                x_s = x_l.astype(jnp.float32).reshape(
                    rs, heads, fh)[sv]                       # (cap, H, F)
                gx = jnp.sum(g_d * x_s, axis=-1)             # (cap, H)
                dz = jnp.where(z >= 0, 1.0,
                               jnp.float32(negative_slope))
                de = a_e * (gx - t_d) * dz
                dx = dx + jax.ops.segment_sum(
                    (a_e[..., None] * g_d).reshape(-1, hf), seg_s,
                    num_segments=rs + 1)[:rs]
                das = das + jax.ops.segment_sum(
                    de, seg_s, num_segments=rs + 1)[:rs]
                dad = _dist_scatter_shard(
                    dad, fb_d, de, book=book, axis=axis, mode="add")
            return dx, dad, das

        p = P(self.axis)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(p,) * 10,
            out_specs=(p, p, p), check_vma=False,
        )(bits, x2, alpha_dst, alpha_src, m, s, t, g2,
          fb_src_l, fb_dst_g)

    def _attn_bwd_sharded(self, x, alpha_dst, alpha_src, m, s, t, g,
                          negative_slope):
        """Sharded backward: band gradients via the dst/transpose-src
        kernels over halo-exchanged stats slabs; fallback gradients via
        a src-bucketed edge list (remote dst stats + g gathered, dad
        scattered back to dst shards)."""
        st = self._attn_structs()
        if st["bits"] is not None:
            dx, dad, das = self._attn_bwd_sharded_onepass(
                x, alpha_dst[:, None], alpha_src[:, None], m[:, None],
                s[:, None], t[:, None], g, 1, x.shape[1], negative_slope)
            return dx, dad[:, 0], das[:, 0]
        interpret = jax.default_backend() != "tpu"
        r_blk, world, axis, book = (self._r_blk, self._world, self.axis,
                                    self._book)
        # reached only on the no-bits fallback path (the bits check
        # above routed to the one-pass backward), so the adjacencies
        # are always the ELL pair (ADVICE r4: use_bits was dead here)
        k_f = st["ell"].shape[1]
        k_t = st["t_ell"].shape[1]
        adj_f, adj_t = st["ell"], st["t_ell"]
        w_f, w_t = adj_f.shape[1], adj_t.shape[1]
        fb_src_l, fb_dst_g = st["fb_src_bucketed"]
        AD, M, S, T, AS = 0, 1, 2, 3, 4  # lane layout (slab_attn_grad)

        def body(ell_l, tell_l, x_l, ad_l, as_l, m_l, s_l, t_l, g_l,
                 fb_s, fb_d):
            import functools as ft

            from jax.experimental import pallas as pl

            from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                _bwd_fused_kernel)

            rs, f = x_l.shape
            nb_local = rs // r_blk
            s_safe = jnp.maximum(s_l, 1e-16)
            # exchange only the 5 useful stat lanes (padded to 8),
            # widen to the kernel's 128-lane layout after the ppermute
            stats8 = jnp.stack(
                [v.astype(jnp.float32)
                 for v in (ad_l, m_l, s_safe, t_l, as_l)]
                + [jnp.zeros((rs,), jnp.float32)] * 3, axis=1)  # (rs, 8)
            st_e = _halo_exchange(stats8, r_blk, axis, world)
            # halo rows from boundary zeros: keep the S lane nonzero
            st_e = st_e.at[:r_blk, S].set(
                jnp.maximum(st_e[:r_blk, S], 1e-16))
            st_e = st_e.at[-r_blk:, S].set(
                jnp.maximum(st_e[-r_blk:, S], 1e-16))
            st_ext = jnp.pad(st_e, ((0, 0), (0, 120)))
            x_ext = _halo_exchange(x_l.astype(jnp.float32), r_blk, axis,
                                   world)
            g_ext = _halo_exchange(g_l.astype(jnp.float32), r_blk, axis,
                                   world)

            def ell_spec(width):
                return pl.BlockSpec((r_blk, width), lambda b: (b, 0))

            def blk_spec(width):
                return pl.BlockSpec((r_blk, width), lambda b: (b + 1, 0))

            def slabs(width):
                return [pl.BlockSpec((r_blk, width),
                                     lambda b, o=o: (b + o, 0))
                        for o in range(3)]

            # fused: both orientations in one pass, x/g/stats slabs
            # DMA'd once (same win as the single-chip fused bwd)
            dad, dx, das = pl.pallas_call(
                ft.partial(_bwd_fused_kernel, k_f, k_t,
                           negative_slope, jnp.float32),
                grid=(nb_local,),
                in_specs=[ell_spec(w_f), ell_spec(w_t)] + slabs(128)
                + slabs(f) + slabs(f),
                out_specs=[ell_spec(128), ell_spec(f), ell_spec(128)],
                out_shape=[jax.ShapeDtypeStruct((rs, 128), jnp.float32),
                           jax.ShapeDtypeStruct((rs, f), jnp.float32),
                           jax.ShapeDtypeStruct((rs, 128), jnp.float32)],
                interpret=interpret,
            )(ell_l, tell_l, st_ext, st_ext, st_ext,
              x_ext, x_ext, x_ext, g_ext, g_ext, g_ext)
            dad = dad[:, 0]
            das = das[:, 0]

            if fb_s.shape[0]:
                # remote dst quantities: [g row | ad | m | s | t]
                gq_local = jnp.concatenate(
                    [g_l.astype(jnp.float32),
                     ad_l.astype(jnp.float32)[:, None],
                     m_l[:, None], s_safe[:, None], t_l[:, None]], axis=1)
                gq = _dist_gather_shard(gq_local, fb_d, book=book,
                                        axis=axis, fill=0)
                g_d, ad_d = gq[:, :f], gq[:, f]
                m_d, s_d, t_d = gq[:, f + 1], gq[:, f + 2], gq[:, f + 3]
                valid = (fb_s >= 0) & (fb_d >= 0)
                sv = jnp.where(valid, fb_s, 0)
                seg_s = jnp.where(valid, fb_s, rs)
                z = ad_d + as_l.astype(jnp.float32)[sv]
                lr = jnp.where(z >= 0, z, jnp.float32(negative_slope) * z)
                a_e = jnp.where(valid,
                                jnp.exp(lr - m_d) / jnp.maximum(s_d, 1e-16),
                                0.0)
                gx = jnp.sum(g_d * x_l.astype(jnp.float32)[sv], axis=-1)
                dz = jnp.where(z >= 0, 1.0, jnp.float32(negative_slope))
                de = a_e * (gx - t_d) * dz
                dx = dx + jax.ops.segment_sum(
                    a_e[:, None] * g_d, seg_s, num_segments=rs + 1)[:rs]
                das = das + jax.ops.segment_sum(
                    de, seg_s, num_segments=rs + 1)[:rs]
                # dad contributions go to DST rows: distributed
                # scatter-add back to the owning shards
                dad = _dist_scatter_shard(
                    dad[:, None], fb_d, de[:, None], book=book, axis=axis,
                    mode="add")[:, 0]
            return dx, dad, das

        p = P(self.axis)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(p,) * 11,
            out_specs=(p, p, p), check_vma=False,
        )(adj_f, adj_t, x, alpha_dst, alpha_src, m, s, t, g,
          fb_src_l, fb_dst_g)

    def attention_spmm(self, x, alpha_dst, alpha_src, *,
                       negative_slope: float = 0.2):
        """Sharded fused GAT attention aggregate: x (N_pad, F) and
        alpha_* (N_pad,) row-sharded (use :meth:`shard`).  Both passes
        ride the banded kernels with halo-exchanged slabs; exact for
        any graph via the bucketed fallback.  Differentiable."""
        key = ("attn", negative_slope)
        if key not in getattr(self, "_diff_attn", {}):
            self._attn_structs()

            @jax.custom_vjp
            def f(x, ad, asx):
                out, _, _ = self._attn_fwd_sharded(x, ad, asx,
                                                   negative_slope)
                return out

            def fwd(x, ad, asx):
                out, m, s = self._attn_fwd_sharded(x, ad, asx,
                                                   negative_slope)
                return out, (x, ad, asx, out, m, s)

            def bwd(res, g):
                x, ad, asx, out, m, s = res
                t = jnp.sum(g.astype(jnp.float32) * out, axis=-1)
                dx, dad, das = self._attn_bwd_sharded(
                    x, ad, asx, m, s, t, g, negative_slope)
                return (dx.astype(x.dtype), dad.astype(ad.dtype),
                        das.astype(asx.dtype))

            f.defvjp(fwd, bwd)
            self._diff_attn[key] = f
        return self._diff_attn[key](x, alpha_dst, alpha_src)

    def _attn_fwd_sharded_mh(self, x2, alpha_dst, alpha_src, heads, fh,
                             negative_slope):
        """Multi-head sharded forward: x2 (N_pad, H*F) row-sharded,
        alphas (N_pad, H).  One kernel pass over all heads per shard
        (adjacency reconstruction amortized, single halo round)."""
        st = self._attn_structs()
        interpret = jax.default_backend() != "tpu"
        r_blk, world, axis, book = (self._r_blk, self._world, self.axis,
                                    self._book)
        k_w = st["ell"].shape[1]
        use_bits = st["bits"] is not None
        adj = st["bits"] if use_bits else st["ell"]
        adj_w = adj.shape[1]
        fb_src, fb_dst = st["fb_dst_bucketed"]

        def body(ell_local, x_local, ad_local, as_local, fb_s, fb_d):
            import functools as ft

            from jax.experimental import pallas as pl

            from cugraph_gnn_tpu.ops.pallas.slab_kernel import (
                _slab_attn_fwd_kernel)

            rs, hf = x_local.shape
            nb_local = rs // r_blk
            x_ext = _halo_exchange(x_local, r_blk, axis, world)
            # exchange (rs, H) alpha_src, then PRE-TRANSPOSE (round-4
            # glue layout: no lane-replicated slab, no in-kernel
            # transpose, packed m/s output)
            sub = max(-(-heads // 8) * 8, 8)
            as_e = _halo_exchange(as_local.astype(jnp.float32), r_blk,
                                  axis, world)                  # (rs+2R, H)
            as_t = jnp.zeros((sub, rs + 2 * r_blk), jnp.float32)
            as_t = jax.lax.dynamic_update_slice(as_t, as_e.T, (0, 0))
            ad_l = jnp.pad(ad_local.astype(jnp.float32),
                           ((0, 0), (0, 128 - heads)))
            # G=1 stacking: halo-extended x keeps the 3 R-row slab specs
            kern = ft.partial(_slab_attn_fwd_kernel, k_w, use_bits,
                              heads, fh, r_blk, 1, negative_slope,
                              jnp.float32)
            as_specs = [pl.BlockSpec((sub, r_blk),
                                     lambda b, o=o: (0, b + o))
                        for o in range(3)]
            xl = [pl.BlockSpec((r_blk, hf), lambda b, o=o: (b + o, 0))
                  for o in range(3)]
            u, ms_b = pl.pallas_call(
                kern, grid=(nb_local,),
                in_specs=[pl.BlockSpec((r_blk, adj_w), lambda b: (b, 0)),
                          pl.BlockSpec((r_blk, 128), lambda b: (b, 0))]
                + as_specs + xl,
                out_specs=[pl.BlockSpec((r_blk, hf), lambda b: (b, 0)),
                           pl.BlockSpec((r_blk, 128), lambda b: (b, 0))],
                out_shape=[jax.ShapeDtypeStruct((rs, hf), jnp.float32),
                           jax.ShapeDtypeStruct((rs, 128), jnp.float32)],
                interpret=interpret,
            )(ell_local, ad_l, as_t, as_t, as_t, x_ext, x_ext,
              x_ext)
            u = u.reshape(rs, heads, fh)
            m_b, s_b = ms_b[:, :heads], ms_b[:, 64:64 + heads]
            m_out = m_b

            if fb_s.shape[0]:
                xa_local = jnp.concatenate(
                    [x_local.astype(jnp.float32),
                     as_local.astype(jnp.float32)], axis=1)
                xa = _dist_gather_shard(xa_local, fb_s, book=book,
                                        axis=axis, fill=0)
                x_fb = xa[:, :hf].reshape(-1, heads, fh)
                as_fb = xa[:, hf:]                              # (cap, H)
                valid = (fb_s >= 0) & (fb_d >= 0)
                dv = jnp.where(valid, fb_d, rs)
                d0 = jnp.where(valid, fb_d, 0)
                e = ad_local.astype(jnp.float32)[d0] + as_fb    # (cap, H)
                e = jnp.where(e >= 0, e, jnp.float32(negative_slope) * e)
                e = jnp.where(valid[:, None], e, -jnp.inf)
                m_f_seg = jax.ops.segment_max(
                    e, dv, num_segments=rs + 1)[:rs]
                m_f = jnp.where(jnp.isfinite(m_f_seg), m_f_seg, 0.0)
                p = jnp.where(valid[:, None], jnp.exp(e - m_f[d0]), 0.0)
                s_f = jax.ops.segment_sum(p, dv, num_segments=rs + 1)[:rs]
                u_f = jax.ops.segment_sum(
                    p[:, :, None] * x_fb, dv, num_segments=rs + 1)[:rs]
                m = jnp.maximum(m_b, m_f)
                wb = jnp.where(s_b > 0, jnp.exp(m_b - m), 0.0)
                wf = jnp.where(s_f > 0, jnp.exp(m_f - m), 0.0)
                u = u * wb[..., None] + u_f * wf[..., None]
                s_b = s_b * wb + s_f * wf
                m_out = m
            out = u / jnp.maximum(s_b, 1e-16)[..., None]
            return out.reshape(rs, hf), m_out, s_b

        p = P(self.axis)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(p,) * 6,
            out_specs=(p, p, p), check_vma=False,
        )(adj, x2, alpha_dst, alpha_src, fb_src, fb_dst)

    def _attn_bwd_sharded_mh(self, x2, alpha_dst, alpha_src, m, s, t, g2,
                             heads, fh, negative_slope):
        """Multi-head sharded backward: packed per-head stat lanes
        (slot*H + h), single halo round, fused kernels over all heads;
        src-bucketed fallback with remote dst quantities."""
        st = self._attn_structs()
        if st["bits"] is not None:
            return self._attn_bwd_sharded_onepass(
                x2, alpha_dst, alpha_src, m, s, t, g2, heads, fh,
                negative_slope)
        interpret = jax.default_backend() != "tpu"
        r_blk, world, axis, book = (self._r_blk, self._world, self.axis,
                                    self._book)
        # no-bits fallback path only (see one-pass route above)
        k_f = st["ell"].shape[1]
        k_t = st["t_ell"].shape[1]
        adj_fa, adj_ta = st["ell"], st["t_ell"]
        w_f, w_t = adj_fa.shape[1], adj_ta.shape[1]
        fb_src_l, fb_dst_g = st["fb_src_bucketed"]

        def body(ell_l, tell_l, x_l, ad_l, as_l, m_l, s_l, t_l, g_l,
                 fb_s, fb_d):
            import functools as ft

            from jax.experimental import pallas as pl

            from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
                _bwd_fused_kernel_mh)

            rs, hf = x_l.shape
            nb_local = rs // r_blk
            s_safe = jnp.maximum(s_l, 1e-16)
            # lane layout slot*H + h (matches the mh kernels)
            stats = jnp.concatenate(
                [v.astype(jnp.float32)
                 for v in (ad_l, m_l, s_safe, t_l, as_l)],
                axis=1)                                        # (rs, 5H)
            st_e = _halo_exchange(stats, r_blk, axis, world)
            ones = jnp.ones((r_blk, heads), jnp.float32) * 1e-16
            st_e = st_e.at[:r_blk, 2 * heads:3 * heads].set(
                jnp.maximum(st_e[:r_blk, 2 * heads:3 * heads], ones))
            st_e = st_e.at[-r_blk:, 2 * heads:3 * heads].set(
                jnp.maximum(st_e[-r_blk:, 2 * heads:3 * heads], ones))
            st_ext = jnp.pad(st_e, ((0, 0), (0, 128 - 5 * heads)))
            x_ext = _halo_exchange(x_l.astype(jnp.float32), r_blk, axis,
                                   world)
            g_ext = _halo_exchange(g_l.astype(jnp.float32), r_blk, axis,
                                   world)

            def ell_spec(width):
                return pl.BlockSpec((r_blk, width), lambda b: (b, 0))

            def blk_spec(width):
                return pl.BlockSpec((r_blk, width), lambda b: (b + 1, 0))

            def slabs(width):
                return [pl.BlockSpec((r_blk, width),
                                     lambda b, o=o: (b + o, 0))
                        for o in range(3)]

            dad, dx, das = pl.pallas_call(
                ft.partial(_bwd_fused_kernel_mh, k_f, k_t,
                           heads, fh, negative_slope, jnp.float32),
                grid=(nb_local,),
                in_specs=[ell_spec(w_f), ell_spec(w_t)] + slabs(128)
                + slabs(hf) + slabs(hf),
                out_specs=[ell_spec(128), ell_spec(hf), ell_spec(128)],
                out_shape=[jax.ShapeDtypeStruct((rs, 128), jnp.float32),
                           jax.ShapeDtypeStruct((rs, hf), jnp.float32),
                           jax.ShapeDtypeStruct((rs, 128), jnp.float32)],
                interpret=interpret,
            )(ell_l, tell_l, st_ext, st_ext, st_ext,
              x_ext, x_ext, x_ext, g_ext, g_ext, g_ext)
            dad = dad[:, :heads]
            das = das[:, :heads]

            if fb_s.shape[0]:
                gq_local = jnp.concatenate(
                    [g_l.astype(jnp.float32),
                     ad_l.astype(jnp.float32), m_l, s_safe, t_l], axis=1)
                gq = _dist_gather_shard(gq_local, fb_d, book=book,
                                        axis=axis, fill=0)
                g_d = gq[:, :hf].reshape(-1, heads, fh)
                ad_d = gq[:, hf:hf + heads]
                m_d = gq[:, hf + heads:hf + 2 * heads]
                s_d = gq[:, hf + 2 * heads:hf + 3 * heads]
                t_d = gq[:, hf + 3 * heads:hf + 4 * heads]
                valid = (fb_s >= 0) & (fb_d >= 0)
                sv = jnp.where(valid, fb_s, 0)
                seg_s = jnp.where(valid, fb_s, rs)
                as32 = as_l.astype(jnp.float32)
                z = ad_d + as32[sv]                             # (cap, H)
                lr = jnp.where(z >= 0, z, jnp.float32(negative_slope) * z)
                a_e = jnp.where(valid[:, None],
                                jnp.exp(lr - m_d)
                                / jnp.maximum(s_d, 1e-16), 0.0)
                x_s = x_l.astype(jnp.float32).reshape(
                    rs, heads, fh)[sv]                          # (cap,H,F)
                gx = jnp.sum(g_d * x_s, axis=-1)                # (cap, H)
                dz = jnp.where(z >= 0, 1.0, jnp.float32(negative_slope))
                de = a_e * (gx - t_d) * dz
                dx = dx + jax.ops.segment_sum(
                    (a_e[..., None] * g_d).reshape(-1, hf), seg_s,
                    num_segments=rs + 1)[:rs]
                das = das + jax.ops.segment_sum(
                    de, seg_s, num_segments=rs + 1)[:rs]
                dad = _dist_scatter_shard(
                    dad, fb_d, de, book=book, axis=axis, mode="add")
            return dx, dad, das

        p = P(self.axis)
        return jax.shard_map(
            body, mesh=self.mesh, in_specs=(p,) * 11,
            out_specs=(p, p, p), check_vma=False,
        )(adj_fa, adj_ta, x2, alpha_dst, alpha_src, m, s, t, g2,
          fb_src_l, fb_dst_g)

    def attention_spmm_mh(self, x, alpha_dst, alpha_src, *,
                          negative_slope: float = 0.2):
        """Multi-head surface (model-zoo GATConv.full_graph contract):
        x (N_pad, H, F) row-sharded; alphas (N_pad, H).  All heads run
        in ONE sharded kernel pass per direction (single halo round,
        adjacency amortized — same win as the single-chip mh path);
        heads beyond the packed-lane budget run in head-group chunks
        of MAX_PACKED_HEADS (one halo round + one adjacency pass per
        chunk instead of per head)."""
        from cugraph_gnn_tpu.ops.pallas.slab_attn_grad import (
            MAX_PACKED_HEADS)
        heads, fh = x.shape[1], x.shape[2]
        if heads > MAX_PACKED_HEADS:
            return jnp.concatenate([
                self.attention_spmm_mh(
                    x[:, h0:h0 + MAX_PACKED_HEADS],
                    alpha_dst[:, h0:h0 + MAX_PACKED_HEADS],
                    alpha_src[:, h0:h0 + MAX_PACKED_HEADS],
                    negative_slope=negative_slope)
                for h0 in range(0, heads, MAX_PACKED_HEADS)
            ], axis=1)
        key = ("attn_mh", heads, fh, negative_slope)
        if key not in self._diff_attn:
            self._attn_structs()
            n_pad = self._n_pad

            @jax.custom_vjp
            def f(x2, ad, asx):
                out, _, _ = self._attn_fwd_sharded_mh(
                    x2, ad, asx, heads, fh, negative_slope)
                return out

            def fwd(x2, ad, asx):
                out, m, s = self._attn_fwd_sharded_mh(
                    x2, ad, asx, heads, fh, negative_slope)
                return out, (x2, ad, asx, out, m, s)

            def bwd(res, g):
                x2, ad, asx, out, m, s = res
                t = jnp.sum(
                    (g.astype(jnp.float32) * out).reshape(
                        n_pad, heads, fh), axis=-1)             # (N, H)
                dx, dad, das = self._attn_bwd_sharded_mh(
                    x2, ad, asx, m, s, t, g, heads, fh, negative_slope)
                return (dx.astype(x2.dtype), dad.astype(ad.dtype),
                        das.astype(asx.dtype))

            f.defvjp(fwd, bwd)
            self._diff_attn[key] = f
        x2 = x.reshape(x.shape[0], heads * fh)
        out = self._diff_attn[key](x2, alpha_dst, alpha_src)
        return out.reshape(x.shape[0], heads, fh)

    @classmethod
    def from_coo(cls, src, dst, num_nodes: int, mesh, weights=None, **kw):
        from cugraph_gnn_tpu.native import build_csr
        indptr, indices, perm = build_csr(
            np.asarray(dst, np.int32), np.asarray(src, np.int32), num_nodes)
        w = None if weights is None else np.asarray(weights)[perm]
        return cls(indptr, indices, mesh, weights=w, **kw)
