"""Partition books: node-dim row partitioning of sharded arrays.

TPU-native equivalent of WholeMemory's rank partitioning
(ref cpp/src/wholememory/memory_handle.cpp rank partition plan and the
custom ``rank_entry_partition`` in cpp/include/wholememory/wholememory.h:251-257,
380-382).  A :class:`PartitionBook` maps a global row id to the mesh-axis
index ("rank") that owns it and to the local offset within that shard.

Two layouts are supported, mirroring the reference:

- **even**: rank ``r`` owns rows ``[r*ceil(N/W), min((r+1)*ceil(N/W), N))``
  (the reference's default partitioning); all shards padded to the same
  physical size so the array shards evenly over the mesh axis.
- **custom**: arbitrary per-rank entry counts (the reference's
  ``rank_entry_partition``), realized here as explicit shard offsets.

Everything is expressible both in NumPy (host planning) and jnp (inside
jit), with static shapes.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax.numpy as jnp
import numpy as np


def even_shard_size(total: int, world_size: int) -> int:
    """Per-rank shard size for even partitioning (ceil division).

    Matches the reference's default alloc granularity of equal partitions
    (ref cpp/src/wholememory/memory_handle.cpp determine partition plan).
    """
    return -(-total // world_size)


@dataclasses.dataclass(frozen=True)
class PartitionBook:
    """Maps global row ids -> (owner rank, local offset).

    Attributes:
      total: total number of global rows (unpadded).
      world_size: number of shards along the mesh axis.
      offsets: int64 array of shape (world_size + 1,): rank r owns global
        rows [offsets[r], offsets[r+1]).  offsets[-1] == total.
      shard_size: physical rows allocated per rank (>= max logical shard);
        equal across ranks so the global padded array shape is
        (world_size * shard_size, ...).
    """

    total: int
    world_size: int
    offsets: np.ndarray
    shard_size: int

    @staticmethod
    def even(total: int, world_size: int) -> "PartitionBook":
        size = even_shard_size(total, world_size)
        offsets = np.minimum(np.arange(world_size + 1, dtype=np.int64) * size, total)
        return PartitionBook(
            total=total, world_size=world_size, offsets=offsets, shard_size=size
        )

    @staticmethod
    def edge_balanced(indptr, world_size: int) -> "PartitionBook":
        """Row partition chosen so each shard holds ~equal EDGES (not
        rows).  On skewed graphs the even-row split can give one shard
        several times the mean edge count, and the sharded edge buffer
        is sized by the max shard — this book keeps max/mean edge counts
        near 1 (VERDICT r2: per-shard edge sizing).  Row boundaries are
        the positions where the cumulative edge count crosses multiples
        of E/W (each shard still owns a contiguous row range, so all
        range-book machinery applies)."""
        indptr = np.asarray(indptr, dtype=np.int64)
        n = len(indptr) - 1
        total_e = int(indptr[-1])
        targets = (np.arange(1, world_size, dtype=np.int64) * total_e
                   // world_size)
        cuts = np.searchsorted(indptr, targets, side="left")
        offsets = np.concatenate([[0], cuts, [n]]).astype(np.int64)
        # guarantee monotonic non-decreasing (degenerate graphs can put
        # several cuts at the same row)
        offsets = np.maximum.accumulate(offsets)
        counts = offsets[1:] - offsets[:-1]
        return PartitionBook(
            total=n, world_size=world_size, offsets=offsets,
            shard_size=int(counts.max()) if world_size else 0)

    @staticmethod
    def from_counts(counts: Sequence[int]) -> "PartitionBook":
        """Custom partition (ref wholememory.h:380-382 rank_entry_partition)."""
        counts = np.asarray(counts, dtype=np.int64)
        offsets = np.concatenate([[0], np.cumsum(counts)])
        return PartitionBook(
            total=int(offsets[-1]),
            world_size=len(counts),
            offsets=offsets,
            shard_size=int(counts.max()) if len(counts) else 0,
        )

    @property
    def is_even(self) -> bool:
        size = self.shard_size
        expect = np.minimum(
            np.arange(self.world_size + 1, dtype=np.int64) * size, self.total
        )
        return bool(np.array_equal(self.offsets, expect))

    @property
    def counts(self) -> np.ndarray:
        return self.offsets[1:] - self.offsets[:-1]

    @property
    def padded_total(self) -> int:
        return self.world_size * self.shard_size

    # ---- traceable (jnp) queries -------------------------------------------

    def owner_of(self, ids):
        """Owner rank for each global id; jit-safe.

        Even layout uses a division (ref bucket_ids_func.cu:21-38 uses an
        estimated-rank probe; on TPU a straight div or a small
        searchsorted both vectorize fine).
        """
        if self.is_even:
            return jnp.asarray(ids) // self.shard_size
        offs = jnp.asarray(self.offsets[1:-1])
        return jnp.searchsorted(offs, jnp.asarray(ids), side="right").astype(jnp.int32)

    def local_offset(self, ids, owner=None):
        """Local row offset within the owner's shard; jit-safe."""
        ids = jnp.asarray(ids)
        if owner is None:
            owner = self.owner_of(ids)
        if self.is_even:
            return ids - owner * self.shard_size
        starts = jnp.asarray(self.offsets[:-1])[owner]
        return ids - starts

    def to_padded(self, ids, owner=None):
        """Global id -> row index in the padded (world*shard_size) layout."""
        ids = jnp.asarray(ids)
        if self.is_even:
            return ids
        if owner is None:
            owner = self.owner_of(ids)
        return owner * self.shard_size + self.local_offset(ids, owner)

    # ---- host (numpy) queries ----------------------------------------------

    def owner_of_np(self, ids: np.ndarray) -> np.ndarray:
        if self.is_even:
            return np.asarray(ids) // self.shard_size
        return np.searchsorted(self.offsets[1:-1], np.asarray(ids), side="right")

    def local_offset_np(self, ids: np.ndarray) -> np.ndarray:
        ids = np.asarray(ids)
        return ids - self.offsets[:-1][self.owner_of_np(ids)]


@dataclasses.dataclass(frozen=True)
class RoundRobinBook:
    """Round-robin row assignment: owner = id % world, local = id // world
    (the reference's round-robin shard for load balance,
    ref cpp/include/wholememory/embedding.h:124-136 round-robin support
    and file_io round-robin load paths).

    Duck-types the PartitionBook surface used by the distributed shard
    kernels (owner_of / local_offset / counts / shard_size / world_size).
    """

    total: int
    world_size: int

    @property
    def shard_size(self) -> int:
        return -(-self.total // self.world_size)

    @property
    def padded_total(self) -> int:
        return self.world_size * self.shard_size

    @property
    def counts(self) -> np.ndarray:
        base = self.total // self.world_size
        extra = self.total % self.world_size
        return np.asarray(
            [base + (1 if r < extra else 0) for r in range(self.world_size)],
            dtype=np.int64)

    @property
    def offsets(self) -> np.ndarray:  # logical (per-rank) counts prefix
        return np.concatenate([[0], np.cumsum(self.counts)])

    @property
    def is_even(self) -> bool:
        return False

    def owner_of(self, ids):
        return (jnp.asarray(ids) % self.world_size).astype(jnp.int32)

    def local_offset(self, ids, owner=None):
        return jnp.asarray(ids) // self.world_size

    def to_padded(self, ids, owner=None):
        ids = jnp.asarray(ids)
        return (ids % self.world_size) * self.shard_size + (
            ids // self.world_size)

    def owner_of_np(self, ids):
        return np.asarray(ids) % self.world_size

    def local_offset_np(self, ids):
        return np.asarray(ids) // self.world_size
