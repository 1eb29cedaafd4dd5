"""Pallas TPU row-gather kernel: pipelined row DMAs.

TPU-native analog of the reference's warp-per-row vectorized gather
(ref cpp/src/wholememory_ops/functions/gather_scatter_func.cuh:23-365:
vectorized mov_data + memcpy_async staging).

Design (shaped by Mosaic constraints, found empirically):
- ids are reshaped to (B/128, 128) and delivered as SMEM blocks of
  (8, 128) — SMEM in_specs must satisfy the (8, 128) tile rule.
- grid is (B/1024, 8): each program owns 128 output rows and issues one
  async DMA per row HBM->VMEM through a 32-deep slot pipeline (waits
  trail starts by 32 — the memcpy_async analog).  The loop is a static
  Python unroll: Mosaic rejects cross-iteration outstanding DMAs in
  fori_loop, but unrolled pipelines compile fine.
- negative (padding) ids fetch row 0 and are zeroed afterwards.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cugraph_gnn_tpu.ops.gather import local_gather

ROWS_PER_PROGRAM = 128
SUB_BLOCKS = 8            # SMEM tile sublane requirement
N_SLOTS = 32              # outstanding row DMAs


def _gather_kernel(ids_ref, table_ref, out_ref, sems):
    j = pl.program_id(1)
    copies = []
    for c in range(ROWS_PER_PROGRAM):
        rid = jnp.maximum(ids_ref[j, c], 0)
        cp = pltpu.make_async_copy(
            table_ref.at[pl.ds(rid, 1), :],
            out_ref.at[pl.ds(c, 1), :],
            sems.at[c % N_SLOTS],
        )
        if c >= N_SLOTS:
            copies[c - N_SLOTS].wait()
        cp.start()
        copies.append(cp)
    for cp in copies[-N_SLOTS:]:
        cp.wait()
    # zero rows for negative ids (SMEM allows scalar loads only)
    for c in range(ROWS_PER_PROGRAM):
        keep = (ids_ref[j, c] >= 0).astype(out_ref.dtype)
        out_ref[pl.ds(c, 1), :] = out_ref[pl.ds(c, 1), :] * keep


def gather_rows_tpu(table, ids):
    """out[i] = table[ids[i]] (ids < 0 -> zero row), Pallas DMA path.

    table: (N, F) HBM-resident, F a multiple of 128 preferred.
    ids: (B,) int32, any length (padded internally to 1024).
    """
    n, f = table.shape
    b = ids.shape[0]
    ids = ids.astype(jnp.int32)
    r = ROWS_PER_PROGRAM
    chunk = SUB_BLOCKS * r
    pad = (-b) % chunk
    if pad:
        ids = jnp.concatenate([ids, jnp.full((pad,), -1, jnp.int32)])
    bp = b + pad
    out = pl.pallas_call(
        _gather_kernel,
        grid=(bp // chunk, SUB_BLOCKS),
        in_specs=[
            pl.BlockSpec((SUB_BLOCKS, r), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (r, f), lambda i, j: (i * SUB_BLOCKS + j, 0),
            memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bp, f), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((N_SLOTS,))],
    )(ids.reshape(-1, r), table)
    return out[:b]


def gather_rows(table, ids, *, out_dtype=None, use_pallas: bool = False):
    """Backend-dispatching row gather.

    Measured on v5e (1M random rows x 512B): XLA's native gather reaches
    ~116 GB/s; this DMA kernel saturates the scalar-core DMA issue rate
    at ~25 GB/s (one descriptor per 512B row).  XLA is therefore the
    default; the Pallas path exists for fusion experiments and larger
    rows where per-descriptor overhead amortizes.
    """
    if (use_pallas and jax.default_backend() == "tpu" and table.ndim == 2
            and (out_dtype is None or out_dtype == table.dtype)):
        return gather_rows_tpu(table, ids)
    return local_gather(table, ids, out_dtype=out_dtype)
