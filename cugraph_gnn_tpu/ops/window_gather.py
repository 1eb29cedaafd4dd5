"""Line-window gathers: scalar CSR-value reads at row-gather bandwidth.

TPU-native replacement for the reference's per-edge scalar reads inside
its sampling kernels (ref cpp/src/wholegraph_ops/
unweighted_sample_without_replacement_func.cuh:121-270 reads chosen
``indices[]`` entries in-kernel; the GPU hides this with its load
coalescer).  On TPU, an XLA scalar gather fetches one 512B HBM line per
element (~37 GB/s effective); but the elements a sampler needs cluster
inside each seed's CSR row.  So instead:

1. view the 1-D value array as (L, 128) int32/float32 **lines** (one
   512B HBM line per row — pad the array to a multiple of 128 first);
2. gather the few lines covering each seed's row window with the fast
   XLA *row* gather (116 GB/s measured on v5e);
3. select the wanted lanes on the VPU (one-hot compare-reduce for
   scattered positions, a binary shifter for contiguous runs).

Measured on v5e (S=11264 seeds, k=10, 490MB indices, degree 50):
scalar gather 1.79 ms -> window one-hot 0.19 ms (9.4x).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

LINE = 128  # elements per 512B line for 4-byte dtypes


def pad_to_lines(values):
    """Pad a 1-D array to a multiple of LINE (device or numpy).  The CSR
    positions of real entries are unchanged (padding is at the end)."""
    n = values.shape[0]
    pad = (-n) % LINE
    if pad == 0:
        return values
    if isinstance(values, np.ndarray):
        return np.concatenate([values, np.zeros((pad,), values.dtype)])
    return jnp.concatenate(
        [values, jnp.zeros((pad,), values.dtype)])


def as_lines(values):
    """(E,) padded-to-LINE array -> (E/LINE, LINE) line view (free)."""
    assert values.shape[0] % LINE == 0, values.shape
    return values.reshape(-1, LINE)


def window_lines_for(max_degree: int) -> int:
    """Lines needed so any row of degree <= max_degree fits a window
    anchored at the row start's line."""
    return -(-(max_degree + LINE - 1) // LINE)


def gather_window(values2d, start, pos, *, lines: int):
    """out[s, i] = values[start[s] + pos[s, i]] via line-window gather +
    one-hot lane select.

    values2d: (L, 128) line view.  start: (S,) row starts.  pos: (S, k)
    in-row positions, -1 for padding (output 0 there — callers mask).
    Requires start % 128 + pos < lines * 128 for all valid entries
    (guaranteed when pos < degree <= window_lines_for^-1(lines)).
    """
    s, k = pos.shape
    nl = values2d.shape[0]
    line0 = start // LINE
    idx = jnp.minimum(line0[:, None] + jnp.arange(lines, dtype=start.dtype),
                      nl - 1)
    w = values2d[idx]                                  # (S, lines, 128)
    off = (start % LINE)[:, None] + pos                # (S, k)
    valid = pos >= 0
    # Hierarchical select (measured 3x over the flat lines*128 one-hot on
    # v5e: the flat form materializes (S, k, lines*128) intermediates —
    # ~230MB of HBM traffic at hop-2 scale): first pick each entry's
    # LINE with a `lines`-way where-chain over 128-wide slices, then
    # one-hot the lane within 128.  Intermediates shrink by `lines`x.
    li = off // LINE                                   # (S, k)
    lane = off % LINE
    wsel = jnp.zeros((s, k, LINE), w.dtype)
    for l in range(lines):
        wsel = jnp.where((li == l)[:, :, None], w[:, None, l, :], wsel)
    j = jnp.arange(LINE, dtype=jnp.int32)
    oh = (lane[..., None] == j) & valid[..., None]
    return jnp.sum(jnp.where(oh, wsel, 0), axis=2)


def gather_lines_per_entry(values2d, eids):
    """Degree-independent variant: one line gather per entry.

    out[s, i] = values[eids[s, i]]; eids < 0 -> 0.  Costs one 512B line
    per element like the scalar gather, but rides the fast row-gather
    path and fuses the lane select.
    """
    nl = values2d.shape[0]
    safe = jnp.clip(eids, 0)
    line = jnp.minimum(safe // LINE, nl - 1)
    lane = safe % LINE
    rows = values2d[line]  # (..., 128)
    j = jnp.arange(LINE, dtype=jnp.int32)
    oh = (lane[..., None] == j) & (eids[..., None] >= 0)
    return jnp.sum(jnp.where(oh, rows, 0), axis=-1)


def shift_window(values2d, base, width: int):
    """out[s, c] = values[base[s] + c] for c in [0, width): contiguous
    run starting at an arbitrary per-row offset, via line gather + a
    7-step binary lane shifter (no one-hot — O(7 * width) VPU work).

    width must be a multiple of LINE.  Out-of-range reads return
    whatever lives in the clamped last line — callers mask with their
    own validity (positions >= degree are masked by the samplers).
    """
    assert width % LINE == 0, width
    s = base.shape[0]
    nl = values2d.shape[0]
    nlines = width // LINE + 1
    line0 = base // LINE
    idx = jnp.minimum(line0[:, None] + jnp.arange(nlines, dtype=base.dtype),
                      nl - 1)
    w = values2d[idx].reshape(s, nlines * LINE)
    sh = (base % LINE).astype(jnp.int32)
    for b in (64, 32, 16, 8, 4, 2, 1):
        rolled = jnp.concatenate([w[:, b:], w[:, :b]], axis=1)
        w = jnp.where((sh & b > 0)[:, None], rolled, w)
    return w[:, :width]


def gather_hub_compact(values2d, start, pos, hub, hub_capacity: int):
    """Per-entry line gather restricted to ``hub`` rows, compacted into a
    fixed (hub_capacity,) buffer so the expensive per-entry traffic is
    proportional to the number of hub rows, not the batch.

    Scatter-free: slots are assigned by cumsum, the slot->row map is a
    vectorized binary search on the cumsum (searchsorted), and results
    land back via a small padded-row gather.  Rows where ``hub`` is
    False (and overflow rows beyond capacity — callers guard with
    lax.cond) return 0.
    """
    s, k = pos.shape
    h = hub_capacity
    # Compaction via nonzero(size=h) + a tiny scatter for the inverse
    # map (measured ~2x cheaper than the previous cumsum+searchsorted
    # machinery, whose log-round binary search dominated the hub path).
    row_of_slot = jnp.nonzero(hub, size=h, fill_value=s)[0].astype(jnp.int32)
    n_hub = jnp.sum(hub.astype(jnp.int32))
    # fill slots carry row s (out of range) and are dropped by the
    # scatter; in-bounds rows are unique by construction of nonzero.
    slot = jnp.full((s,), h, jnp.int32).at[row_of_slot].set(
        jnp.arange(h, dtype=jnp.int32), mode="drop")
    slot = jnp.where(hub, slot, h)
    safe_row = jnp.minimum(row_of_slot, s - 1)
    bstart = start[safe_row]
    live = (jnp.arange(h, dtype=jnp.int32) < n_hub)[:, None]
    bpos = jnp.where(live, pos[safe_row], -1)
    bvals = gather_lines_per_entry(
        values2d, jnp.where(bpos >= 0, bstart[:, None] + bpos, -1))
    # pad buffer rows to a 512B line so the scatter-back is a fast
    # aligned row gather
    bpad = jnp.concatenate(
        [bvals, jnp.zeros((h, LINE - k), bvals.dtype)], axis=1)
    bpad = jnp.concatenate(
        [bpad, jnp.zeros((1, LINE), bvals.dtype)], axis=0)  # slot h = miss
    return bpad[jnp.minimum(slot, h)][:, :k]


def gather_csr_values(values2d, start, pos, *, degrees=None,
                      max_degree=None, max_window_lines: int = 4,
                      hybrid_window_lines: int = 2,
                      hub_capacity=None):
    """Dispatch: window select when the static degree bound fits
    ``max_window_lines`` 512B lines (the 9x fast path); on skewed graphs
    (``degrees`` given, max degree too big) a two-tier hybrid — window
    for the small rows plus a compacted per-entry gather for the hub
    rows (power-law tails must not drag every row onto the slow path).
    The hybrid's window is ``hybrid_window_lines`` wide: narrower than
    the pure path because every line costs gather rows for EVERY seed,
    while hub rows only cost per-entry reads for themselves (measured on
    v5e at bench shapes: 2-line hybrid 0.77 ms vs 4-line 1.03 ms net).
    If a batch lands more hub rows than ``hub_capacity`` (default S//8),
    a lax.cond falls back to the uncompacted per-entry gather — slower,
    never wrong."""
    if max_degree is not None:
        lines = window_lines_for(max_degree)
        if lines <= max_window_lines:
            return gather_window(values2d, start, pos, lines=lines)
    if degrees is None:
        eids = jnp.where(pos >= 0, start[:, None] + pos, -1)
        return gather_lines_per_entry(values2d, eids)
    s = start.shape[0]
    if hub_capacity is None:
        hub_capacity = max(LINE, s // 8)
    cap = hybrid_window_lines * LINE - (LINE - 1)
    hub = degrees > cap
    small = (~hub)[:, None]
    out_small = gather_window(values2d, start, jnp.where(small, pos, -1),
                              lines=hybrid_window_lines)
    n_hub = jnp.sum(hub.astype(jnp.int32))

    def compact_path(_):
        return gather_hub_compact(values2d, start,
                                  jnp.where(small, -1, pos),
                                  hub, hub_capacity)

    def full_path(_):
        eids = jnp.where(small | (pos < 0), -1, start[:, None] + pos)
        return gather_lines_per_entry(values2d, eids)

    out_big = jax.lax.cond(n_hub <= hub_capacity, compact_path, full_path,
                           operand=None)
    return jnp.where(small, out_small, out_big)
