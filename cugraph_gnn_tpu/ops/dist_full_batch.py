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
  the result is exact for any graph.
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
from cugraph_gnn_tpu.store.dist_array import _dist_gather_shard, put_global
from cugraph_gnn_tpu.store.partition import PartitionBook


def _bucket_fallback(fb_src, fb_dst, rows_per_shard: int, world: int):
    """Host-side: group fallback edges by destination shard, pad every
    shard to the max count (shard_map needs equal per-shard shapes).
    Returns (W * cap,) src / local-dst arrays, -1 padded."""
    fb_src = np.asarray(fb_src)
    fb_dst = np.asarray(fb_dst)
    valid = (fb_src >= 0) & (fb_dst >= 0)
    fb_src, fb_dst = fb_src[valid], fb_dst[valid]
    shard = fb_dst // rows_per_shard
    cap = int(np.bincount(shard, minlength=world).max(initial=0))
    cap = max(-(-cap // 128) * 128, 128)
    src_p = np.full((world, cap), -1, np.int32)
    dst_p = np.full((world, cap), -1, np.int32)
    for w in range(world):
        sel = shard == w
        k = int(sel.sum())
        src_p[w, :k] = fb_src[sel]
        dst_p[w, :k] = fb_dst[sel] - w * rows_per_shard
    return src_p.reshape(-1), dst_p.reshape(-1)


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


def _shard_spmm_body(ell_local, x_local, fb_src, fb_dst, *, r_blk: int,
                     k_width: int, world: int, axis: str, book,
                     compute_dtype, interpret: bool):
    """Per-shard body: halo exchange -> slab MXU kernel over local
    blocks -> distributed fallback gather + local segment reduce."""
    from jax.experimental import pallas as pl

    from cugraph_gnn_tpu.ops.pallas.slab_kernel import _slab_kernel

    rs, f = x_local.shape[0], x_local.shape[1]
    nb_local = rs // r_blk
    x_ext = _halo_exchange(x_local, r_blk, axis, world)

    kern = functools.partial(_slab_kernel, k_width, False, compute_dtype)
    x_specs = [pl.BlockSpec((r_blk, f), lambda b, o=o: (b + o, 0))
               for o in range(3)]
    out = pl.pallas_call(
        kern,
        grid=(nb_local,),
        in_specs=[pl.BlockSpec((r_blk, k_width), lambda b: (b, 0))] + x_specs,
        out_specs=pl.BlockSpec((r_blk, f), lambda b: (b, 0)),
        out_shape=jax.ShapeDtypeStruct((rs, f), jnp.float32),
        interpret=interpret,
    )(ell_local, x_ext, x_ext, x_ext)

    if fb_src.shape[0]:
        rows = _dist_gather_shard(
            x_local, fb_src, book=book, axis=axis, fill=0)
        seg = jnp.where(fb_dst >= 0, fb_dst, rs)
        out = out + jax.ops.segment_sum(
            rows.astype(jnp.float32), seg, num_segments=rs + 1)[:rs]
    return out


class DistFullBatchGraph:
    """Row-sharded full-batch message passing over ``mesh``.

    Same surface as :class:`cugraph_gnn_tpu.ops.FullBatchGraph` for the
    pieces that distribute (``spmm`` sum/mean, ``degrees``,
    ``to_graph_order``/``shard``), so the model zoo's ``full_graph``
    paths run unchanged on sharded node arrays.
    """

    def __init__(self, indptr, indices, mesh, *, axis: str = STORE_AXIS,
                 reorder: str = "auto", block_rows: int = 256,
                 max_k: int = 64):
        from cugraph_gnn_tpu.native import build_csr
        from cugraph_gnn_tpu.ops.pallas.slab_kernel import build_slab_graph
        from cugraph_gnn_tpu.ops.reorder import reorder_csr

        indptr = np.asarray(indptr)
        indices = np.asarray(indices, np.int32)
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
        elif reorder != "none":
            raise ValueError(f"unknown reorder {reorder!r}")

        slab = build_slab_graph(indptr, indices, block_rows=block_rows,
                                max_k=max_k)
        self.band_fraction = slab.band_fraction
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
        fb_src, fb_dst = _bucket_fallback(
            np.asarray(slab.fb_src), np.asarray(slab.fb_dst), rs, world)
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
        t_indptr, t_indices, _ = build_csr(indices[ok], rows_np[ok], n)
        slab_t = build_slab_graph(t_indptr, t_indices, block_rows=block_rows,
                                  max_k=max_k)
        ell_t = np.asarray(slab_t.ell)
        if ell_t.shape[0] < n_pad_w:
            ell_t = np.concatenate([
                ell_t, np.full((n_pad_w - ell_t.shape[0], ell_t.shape[1]),
                               -1, np.int32)])
        self._ell_t = put_global(ell_t, sh)
        tb_src, tb_dst = _bucket_fallback(
            np.asarray(slab_t.fb_src), np.asarray(slab_t.fb_dst), rs, world)
        self._fb_src_t = put_global(tb_src, sh)
        self._fb_dst_t = put_global(tb_dst, sh)
        self._diff = {}

    @staticmethod
    def _band_better(indptr, indices, rg, block_rows) -> bool:
        """auto mode: keep RCM only if it raises the in-band fraction."""
        n = len(indptr) - 1
        deg = np.asarray(indptr)[1:] - np.asarray(indptr)[:-1]

        def frac(ip, ix):
            rows = np.repeat(np.arange(n, dtype=np.int64),
                             (np.asarray(ip)[1:] - np.asarray(ip)[:-1]))
            cols = np.asarray(ix, np.int64)
            ok = (cols >= 0) & (cols < n)
            if not ok.any():
                return 0.0
            return float((np.abs(cols[ok] - rows[ok]) <= block_rows).mean())

        del deg
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

    def _spmm_sharded(self, x, *, transpose: bool, compute_dtype):
        interpret = jax.default_backend() != "tpu"
        ell = self._ell_t if transpose else self._ell
        fb_s = self._fb_src_t if transpose else self._fb_src
        fb_d = self._fb_dst_t if transpose else self._fb_dst
        body = functools.partial(
            _shard_spmm_body, r_blk=self._r_blk, k_width=ell.shape[1],
            world=self._world, axis=self.axis, book=self._book,
            compute_dtype=compute_dtype, interpret=interpret)
        p = P(self.axis)
        # check_vma=False: pallas_call out_shapes don't carry vma
        # annotations yet
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

    @classmethod
    def from_coo(cls, src, dst, num_nodes: int, mesh, **kw):
        from cugraph_gnn_tpu.native import build_csr
        indptr, indices, _ = build_csr(
            np.asarray(dst, np.int32), np.asarray(src, np.int32), num_nodes)
        return cls(indptr, indices, mesh, **kw)
