"""Checkpoint / resume: per-rank binary shard files.

ref cpp/src/wholememory/file_io.cpp:47-2165 (parallel filelist load with
entry re-striding + per-rank store) and the Python surface
WholeMemoryTensor.from_filelist/to_file_prefix (ref torch/tensor.py:100-319),
WholeMemoryEmbedding.save/load incl. optimizer states
(ref torch/embedding.py:388-407).

TPU redesign: shard files are raw little-endian binaries identical to
the reference's format (a logically concatenated row-major matrix split
across files); loading re-partitions rows to the current partition book,
so world-size changes between save and load are fine.  Orbax handles
model params; this module owns the feature/embedding stores.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

import numpy as np

from cugraph_gnn_tpu.store.partition import PartitionBook


def store_shard_files(prefix: str, array, book: PartitionBook):
    """Write one file per rank: ``{prefix}_part_{r}_of_{w}``
    (ref file_io.cpp:2048 store local shard per rank; filename scheme ref
    torch/tensor.py to_file_prefix)."""
    arr = np.asarray(array)
    w = book.world_size
    meta = {
        "total": book.total,
        "world_size": w,
        "counts": [int(c) for c in book.counts],
        "dtype": str(arr.dtype),
        "shape_tail": list(arr.shape[1:]),
    }
    with open(f"{prefix}_meta.json", "w") as f:
        json.dump(meta, f)
    for r in range(w):
        lo, hi = int(book.offsets[r]), int(book.offsets[r + 1])
        arr[lo:hi].tofile(f"{prefix}_part_{r}_of_{w}")


def load_shard_files(prefix: str) -> np.ndarray:
    """Read a full array back from a shard-file prefix (any world size)."""
    with open(f"{prefix}_meta.json") as f:
        meta = json.load(f)
    w = meta["world_size"]
    tail = tuple(meta["shape_tail"])
    dtype = np.dtype(meta["dtype"])
    parts = []
    for r in range(w):
        buf = np.fromfile(f"{prefix}_part_{r}_of_{w}", dtype=dtype)
        parts.append(buf.reshape((-1, *tail)) if tail else buf)
    out = np.concatenate(parts)
    assert out.shape[0] == meta["total"], (out.shape, meta)
    return out


def load_filelist(filelist: Sequence[str], dtype, row_size: int,
                  book: Optional[PartitionBook] = None,
                  rank: Optional[int] = None,
                  entry_stride: Optional[int] = None) -> np.ndarray:
    """Load a logically-concatenated binary filelist, optionally only the
    rows of ``rank``'s partition (ref wholememory_load_from_file,
    file_io.cpp:91-872: rank-local parallel load).

    entry_stride: output row width when re-striding entries on load
    (ref wholememory.h:429-461 entry-size re-stride).
    """
    dtype = np.dtype(dtype)
    sizes = [os.path.getsize(f) // (dtype.itemsize * row_size)
             for f in filelist]
    total = sum(sizes)
    out_w = entry_stride or row_size
    if book is not None and rank is not None and not isinstance(
            book, PartitionBook):
        # Non-contiguous ownership (e.g. RoundRobinBook): book.offsets
        # are logical per-rank counts, NOT global row ranges — gather the
        # rank's rows by explicit id mapping (ref file_io.cpp:665-1541
        # round-robin load paths).
        gids = np.nonzero(
            book.owner_of_np(np.arange(total, dtype=np.int64)) == rank)[0]
        loc = book.local_offset_np(gids)
        out = np.zeros((len(gids), out_w), dtype)
        row0 = 0
        for f, n in zip(filelist, sizes):
            sel = (gids >= row0) & (gids < row0 + n)
            if sel.any():
                mm = np.memmap(f, dtype=dtype, mode="r",
                               shape=(n, row_size))
                out[loc[sel], :row_size] = mm[gids[sel] - row0]
            row0 += n
        return out
    if book is None or rank is None:
        lo, hi = 0, total
    else:
        lo, hi = int(book.offsets[rank]), int(book.offsets[rank + 1])
    out = np.zeros((hi - lo, out_w), dtype)
    row0 = 0
    for f, n in zip(filelist, sizes):
        a, b = max(lo, row0), min(hi, row0 + n)
        if a < b:
            mm = np.memmap(f, dtype=dtype, mode="r", shape=(n, row_size))
            out[a - lo: b - lo, :row_size] = mm[a - row0: b - row0]
        row0 += n
    return out


def save_embedding(prefix: str, embedding):
    """Save a DistEmbedding table + optimizer states
    (ref torch/embedding.py:388-407)."""
    store_shard_files(prefix, _unpad(embedding.table), embedding.table.book)
    for k in sorted(embedding._state):
        st = embedding._state[k]
        store_shard_files(f"{prefix}.{embedding.optimizer}.{k}",
                          _unpad_raw(np.asarray(st), embedding.table.book),
                          embedding.table.book)


def load_embedding(prefix: str, embedding):
    """Load table + optimizer states saved by :func:`save_embedding`."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    table = load_shard_files(prefix)
    from cugraph_gnn_tpu.store.dist_array import DistArray
    new = DistArray.from_array(table, embedding.table.mesh,
                               embedding.table.axis,
                               book=embedding.table.book)
    embedding.table.data = new.data
    for k in sorted(embedding._state):
        st = load_shard_files(f"{prefix}.{embedding.optimizer}.{k}")
        arr = DistArray.from_array(st, embedding.table.mesh,
                                   embedding.table.axis,
                                   book=embedding.table.book)
        embedding._state[k] = arr.data


def _unpad(dist_array):
    return dist_array.to_global()


def _unpad_raw(padded: np.ndarray, book) -> np.ndarray:
    """Padded (world*shard_size) layout -> global row order; handles any
    book layout (contiguous ranges or round-robin) via the id mapping."""
    gids = np.arange(book.total, dtype=np.int64)
    own = book.owner_of_np(gids)
    loc = book.local_offset_np(gids)
    return padded[own * book.shard_size + loc]
