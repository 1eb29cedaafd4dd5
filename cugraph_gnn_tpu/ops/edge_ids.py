"""64-bit global edge-id space as int32 (hi, lo) pairs.

The reference is templated over int64 ids throughout
(ref cpp/include/wholememory/tensor_description.h:26-38 dtypes incl.
int64; sampling C API takes int64 ids,
ref cpp/include/wholememory/wholegraph_op.h:31-54).  ogbn-papers100M has
~3.2B symmetrized edges, so global edge ids overflow int32.

TPU redesign: TPU has no native int64 ALU — XLA emulates i64 as i32
pairs, roughly halving throughput on every op that touches the wide
type, and ``jax_enable_x64`` globally would change every dtype in the
program.  Instead, the 64-bit *global* edge-id space is carried
explicitly as two int32 planes:

    global_id = hi * 2**30 + lo          (lo in [0, 2**30))

Everything device-side stays int32:

- per-shard sampling works in *local* edge positions (< 2**30 per
  shard, asserted at graph build — a 2**30-edge shard is already a 4GB
  indices buffer, beyond one chip's fair HBM share);
- each shard's int64 ``edge_base`` (exclusive scan of shard edge
  counts) is split host-side into an (hi, lo) int32 pair;
- the device combines ``base + local`` with one explicit carry
  (base_lo + local < 2**31 because both < 2**30, so the add is exact
  in int32).

Graphs whose total edge count fits int32 keep the single packed int32
edge-id plane end-to-end (edge_hi is None) — the 64-bit plane costs one
extra int32 per sampled edge only when the graph actually needs it.

The 2**30 split (not 2**31) keeps every intermediate strictly inside
int32 without unsigned tricks; it supports 2**30 * 2**31 = 2**61 edges.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

EDGE_LO_BITS = 30
EDGE_LO_MOD = 1 << EDGE_LO_BITS  # 2**30
EDGE_LO_MASK = EDGE_LO_MOD - 1
# per-shard local edge positions must stay below the lo modulus
MAX_LOCAL_EDGES = EDGE_LO_MOD


def split_bases_np(bases) -> np.ndarray:
    """Host: int64 shard bases -> (W, 2) int32 [hi, lo] planes."""
    bases = np.asarray(bases, dtype=np.int64)
    hi = (bases >> EDGE_LO_BITS).astype(np.int32)
    lo = (bases & EDGE_LO_MASK).astype(np.int32)
    return np.stack([hi, lo], axis=1)


def combine_local(local_eid, base_hi, base_lo):
    """Device: shard-local edge position + split base -> (hi, lo) pair.

    local_eid: int32 in [0, 2**30) (or negative = pad).  base_hi /
    base_lo: scalars (this shard's split base).  Pad positions come out
    as (0, -1).
    """
    valid = local_eid >= 0
    lo = jnp.where(valid, local_eid, 0) + base_lo
    hi = base_hi + (lo >> EDGE_LO_BITS)
    lo = lo & EDGE_LO_MASK
    return (jnp.where(valid, hi, 0).astype(jnp.int32),
            jnp.where(valid, lo, -1).astype(jnp.int32))


def to_int64_np(hi, lo) -> np.ndarray:
    """Host: (hi, lo) planes -> int64 global edge ids (-1 pad kept)."""
    hi = np.asarray(hi, dtype=np.int64)
    lo = np.asarray(lo, dtype=np.int64)
    out = hi * EDGE_LO_MOD + lo
    return np.where(lo < 0, np.int64(-1), out)


def from_int64_np(gids) -> tuple:
    """Host: int64 global edge ids -> (hi, lo) int32 planes (-1 pad
    kept as (0, -1))."""
    gids = np.asarray(gids, dtype=np.int64)
    valid = gids >= 0
    hi = np.where(valid, gids >> EDGE_LO_BITS, 0).astype(np.int32)
    lo = np.where(valid, gids & EDGE_LO_MASK, -1).astype(np.int32)
    return hi, lo
