"""Pallas TPU fused neighbor-select kernel (window DMA + MXU select).

The sampling hot loop's dominant cost is reading the chosen neighbor
ids from the CSR ``indices`` array (112k scalar random reads ~= 1.5 ms
at hop-2 scale; PERF_NOTES.md).  This kernel fuses that read: for each
seed it DMAs the row's aligned 2x128-int window HBM->VMEM once (the k
sampled positions share it) and selects the k lanes with a one-hot
matmul on the MXU, exact for ids < 2^31 via two 16-bit halves.

Measured on v5e: 1.70 ms vs 1.54 ms for the XLA scalar gather at hop-2
scale — the DMA-issue rate and the VPU one-hot build eat the line-reuse
win, so the XLA path stays the default.  Kept as the starting point for
a multi-row-descriptor variant (round-2 direction) and as the reference
fused-sampler kernel.

Constraint: row degree <= 128 (the window spans two aligned 128-int
rows); callers cap degrees or fall back to the XLA path.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

W = 128                 # indices view width (aligned HBM rows)
SEEDS_PER_PROGRAM = 128
SUB = 8                 # SMEM tile sublanes
N_SLOTS = 32


def _kernel(start_ref, lane_ref, ix_ref, out_ref, win_ref, sems):
    j = pl.program_id(1)
    r = SEEDS_PER_PROGRAM
    cps = []
    for c in range(r):
        s0 = start_ref[j, c]
        r0 = s0 // W
        cp = pltpu.make_async_copy(
            ix_ref.at[pl.ds(r0, 2), :], win_ref.at[pl.ds(2 * c, 2), :],
            sems.at[c % N_SLOTS])
        if c >= N_SLOTS:
            cps[c - N_SLOTS].wait()
        cp.start()
        cps.append(cp)
    for cp in cps[-N_SLOTS:]:
        cp.wait()
    win = win_ref[...].reshape(r, 2 * W)
    lo = (win & 0xFFFF).astype(jnp.float32)
    hi = ((win >> 16) & 0x7FFF).astype(jnp.float32)
    lanes = lane_ref[...]                           # (r, K) in [0, 2W)
    k = lanes.shape[1]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (r, k, 2 * W), 2)
          == lanes[:, :, None]).astype(jnp.float32)
    glo = jnp.einsum("rkw,rw->rk", oh, lo,
                     preferred_element_type=jnp.float32)
    ghi = jnp.einsum("rkw,rw->rk", oh, hi,
                     preferred_element_type=jnp.float32)
    out_ref[...] = (ghi.astype(jnp.int32) << 16) | glo.astype(jnp.int32)


def window_select_neighbors(indices, start, pos):
    """neighbors[s, j] = indices[start[s] + pos[s, j]] with
    pos[s, j] < 128 (fused window DMA + MXU lane select).

    indices: (E,) int32 CSR columns.  start: (S,) row starts.
    pos: (S, K) int32 sampled positions (must be >= 0; mask afterwards).
    S padded internally to a multiple of 1024.
    """
    s_n, k = pos.shape
    chunk = SUB * SEEDS_PER_PROGRAM
    padn = (-s_n) % chunk
    if padn:
        start = jnp.concatenate([start, jnp.zeros((padn,), jnp.int32)])
        pos = jnp.concatenate([pos, jnp.zeros((padn, k), jnp.int32)])
    sp = s_n + padn
    epad = (-indices.shape[0]) % W
    ix2 = jnp.concatenate(
        [indices, jnp.zeros((epad + W,), jnp.int32)]).reshape(-1, W)
    lanes = (start % W)[:, None] + pos
    out = pl.pallas_call(
        _kernel,
        grid=(sp // chunk, SUB),
        in_specs=[
            pl.BlockSpec((SUB, SEEDS_PER_PROGRAM), lambda i, j: (i, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((SEEDS_PER_PROGRAM, k),
                         lambda i, j: (i * SUB + j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec((SEEDS_PER_PROGRAM, k),
                               lambda i, j: (i * SUB + j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((sp, k), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((2 * SEEDS_PER_PROGRAM, W), jnp.int32),
            pltpu.SemaphoreType.DMA((N_SLOTS,)),
        ],
    )(start.reshape(-1, SEEDS_PER_PROGRAM), lanes, ix2)
    return out[:s_n]
