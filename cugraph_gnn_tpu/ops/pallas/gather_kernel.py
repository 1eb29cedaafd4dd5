"""Pallas TPU row-gather kernel.

TPU-native analog of the reference's warp-per-row vectorized gather
(ref cpp/src/wholememory_ops/functions/gather_scatter_func.cuh:23-365:
vectorized mov_data + memcpy_async staging).  Here the table stays in
HBM; each grid step DMAs one feature row into VMEM via a
scalar-prefetched index map, letting the Mosaic pipeliner double-buffer
row fetches (the memcpy_async analog).

Supports on-the-fly dtype conversion (half/bf16 <-> f32, ref
gather_scatter_func.cuh:150-197) and negative-id skip (ref :285).

The XLA fallback (`ops.gather.local_gather`) is used automatically on
non-TPU backends.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cugraph_gnn_tpu.ops.gather import local_gather


def _gather_kernel(ids_ref, table_ref, out_ref):
    # table_ref block is the (block_rows, F) slice selected by the
    # prefetched ids (see index_map below); copy + mask negatives.
    i = pl.program_id(0)
    rid = ids_ref[i]
    rows = table_ref[...]
    if out_ref.dtype != table_ref.dtype:
        rows = rows.astype(out_ref.dtype)
    out_ref[...] = jnp.where(rid >= 0, rows, jnp.zeros_like(rows))


def gather_rows_tpu(table, ids, *, out_dtype=None, rows_per_step: int = 1):
    """out[i] = table[ids[i]] (ids < 0 -> zero row), Pallas TPU path.

    table: (N, F) array (HBM-resident).  ids: (B,) int32.
    """
    n, f = table.shape
    b = ids.shape[0]
    out_dtype = out_dtype or table.dtype
    ids = ids.astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec(
                (1, f),
                # Prefetched ids drive the DMA source row; clamp pad ids.
                lambda i, ids: (jnp.maximum(ids[i], 0), 0),
            ),
        ],
        out_specs=pl.BlockSpec((1, f), lambda i, ids: (i, 0)),
    )
    return pl.pallas_call(
        _gather_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, f), out_dtype),
    )(ids, table)


def gather_rows(table, ids, *, out_dtype=None):
    """Backend-dispatching row gather (Pallas on TPU, XLA elsewhere)."""
    if jax.default_backend() == "tpu" and table.ndim == 2:
        return gather_rows_tpu(table, ids, out_dtype=out_dtype)
    return local_gather(table, ids, out_dtype=out_dtype)
