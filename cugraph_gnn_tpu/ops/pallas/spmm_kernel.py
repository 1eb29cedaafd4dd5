"""Pallas TPU CSR SpMM kernel: fused gather + segment-reduce.

Per BASELINE.json north star: SpMM at HBM speed-of-light.  The XLA
fallback (ops/spmm.py) materializes an (E, F) message matrix in HBM
(gather-write + read + scatter ~= 3x E*F traffic).  This kernel streams
edges row-tile by row-tile, DMAs source feature rows HBM->VMEM, and
accumulates into a VMEM tile — ~1x E*F read + N*F write, the HBM lower
bound.

Layout contract: CSR with rows = output (destination) nodes; a static
``row_block`` of rows is processed per grid step, with the rows' edges
padded to ``edge_tile`` chunks (host-side `build_padded_blocks` does
this once per graph — the TPU analog of the reference's one-time CSR
construction).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


class PaddedCSR(NamedTuple):
    """Blocked/padded CSR for the Pallas SpMM kernel.

    cols: (n_blocks * edge_tile,) int32 source node per edge slot, -1 pad.
    rows: same shape, destination row per slot (-1 pad), nondecreasing
          within a block.
    n_blocks: grid size; block b owns edge slots [b*edge_tile,(b+1)*edge_tile).
    """

    cols: jax.Array
    rows: jax.Array
    n_blocks: int
    num_rows: int


def build_padded_blocks(indptr, indices, edge_tile: int = 512) -> PaddedCSR:
    """Host-side: flatten CSR into fixed-size edge tiles carrying their
    destination row ids (segment-style), padded with -1."""
    indptr = np.asarray(indptr)
    indices = np.asarray(indices)
    n = len(indptr) - 1
    e = len(indices)
    rows = np.repeat(np.arange(n, dtype=np.int32),
                     (indptr[1:] - indptr[:-1]).astype(np.int64))
    pad = (-e) % edge_tile
    cols = np.concatenate([indices.astype(np.int32),
                           np.full(pad, -1, np.int32)])
    rows = np.concatenate([rows, np.full(pad, -1, np.int32)])
    return PaddedCSR(jnp.asarray(cols), jnp.asarray(rows),
                     (e + pad) // edge_tile, n)


def _spmm_kernel(cols_ref, rows_ref, x_hbm, out_ref, acc_ref,
                 sem, *, edge_tile, feat, num_rows):
    """One grid step = one edge tile.  Edges are globally sorted by
    destination row, so each output row's contributions are contiguous;
    we accumulate rows in VMEM and flush to out (scatter-add via
    row-major accumulation)."""
    b = pl.program_id(0)

    @pl.when(b == 0)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(i, _):
        c = cols_ref[b * edge_tile + i]
        r = rows_ref[b * edge_tile + i]

        @pl.when(c >= 0)
        def _():
            dma = pltpu.make_async_copy(
                x_hbm.at[pl.ds(jnp.maximum(c, 0), 1), :],
                acc_ref.at[pl.ds(0, 1), :], sem)
            dma.start()
            dma.wait()
            out_ref[pl.ds(jnp.maximum(r, 0), 1), :] += acc_ref[pl.ds(0, 1), :]
        return 0

    jax.lax.fori_loop(0, edge_tile, body, 0)


def csr_spmm_pallas(padded: PaddedCSR, x, reduce: str = "sum"):
    """out[r] = sum over CSR row r of x[cols].  Minimal first version:
    per-edge DMA (correct; the double-buffered batched variant is the
    optimization target measured by bench_spmm)."""
    n, f = padded.num_rows, x.shape[1]
    out = pl.pallas_call(
        functools.partial(_spmm_kernel, edge_tile=padded.cols.shape[0] //
                          padded.n_blocks, feat=f, num_rows=n),
        grid=(padded.n_blocks,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n, f), x.dtype),
        scratch_shapes=[
            pltpu.VMEM((1, f), x.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(padded.cols, padded.rows, x)
    return out
