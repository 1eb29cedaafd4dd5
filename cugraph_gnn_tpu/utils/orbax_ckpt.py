"""Orbax checkpoint adapter for the sharded stores.

The native checkpoint path (utils/checkpoint.py) writes the reference's
raw per-rank shard-file format (ref cpp/src/wholememory/file_io.cpp,
torch/tensor.py to_file_prefix) and supports world-size-elastic reload.
This module is the ecosystem-standard alternative: orbax/tensorstore
checkpoints of DistArray / DistEmbedding state, saved and restored WITH
their shardings (each host writes only its shards — the multi-host
story orbax owns).  Use it when checkpoints should interoperate with
the wider JAX ecosystem; use utils/checkpoint.py for reference-format
files or world-size changes between save and restore.
"""

from __future__ import annotations

import json
import os

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.store.dist_array import DistArray
from cugraph_gnn_tpu.store.partition import PartitionBook


def _meta_path(path: str) -> str:
    return os.path.join(path, "dist_meta.json")


def _book_meta(book) -> dict:
    return {
        "total": int(book.total),
        "world_size": int(book.world_size),
        "counts": [int(c) for c in book.counts],
        "kind": type(book).__name__,
    }


def _book_from_meta(meta: dict):
    if meta["kind"] == "RoundRobinBook":
        from cugraph_gnn_tpu.store.partition import RoundRobinBook
        return RoundRobinBook(total=meta["total"],
                              world_size=meta["world_size"])
    return PartitionBook.from_counts(meta["counts"])


def save_dist_array(path: str, arr: DistArray):
    """Checkpoint a DistArray at ``path`` (a directory): array data via
    orbax (sharded write) + a small JSON sidecar with the partition
    book."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, {"data": arr.data}, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = _book_meta(arr.book)
        meta["dtype"] = str(np.dtype(arr.data.dtype))
        meta["shape_tail"] = list(arr.data.shape[1:])
        with open(_meta_path(path), "w") as f:
            json.dump(meta, f)


def restore_dist_array(path: str, mesh, axis: str = STORE_AXIS) -> DistArray:
    """Restore a DistArray onto ``mesh``.  The mesh's world size must
    match the saved partition book (orbax checkpoints pin the padded
    layout; for world-size-elastic reload use utils/checkpoint.py)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    world = mesh.shape[axis]
    if world != meta["world_size"]:
        raise ValueError(
            f"checkpoint was saved for world_size={meta['world_size']}, "
            f"restoring onto {world} devices; orbax checkpoints pin the "
            "padded shard layout — use utils.checkpoint.load_shard_files "
            "for world-size-elastic reload")
    book = _book_from_meta(meta)
    sharding = NamedSharding(mesh, P(axis))
    abstract = jax.ShapeDtypeStruct(
        (book.padded_total, *meta["shape_tail"]),
        np.dtype(meta["dtype"]), sharding=sharding)
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(path, {"data": abstract})
    return DistArray(out["data"], book, mesh, axis)


def save_embedding(path: str, emb):
    """Checkpoint a DistEmbedding: table rows + every sparse-optimizer
    state array (ref WholeMemoryEmbedding.save incl. optimizer states,
    torch/embedding.py:388-407)."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(path)
    tree = {"table": emb.table.data}
    for k in sorted(emb._state):
        tree[f"state_{k}"] = emb._state[k]
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()
    if jax.process_index() == 0:
        meta = _book_meta(emb.table.book)
        meta["dtype"] = str(np.dtype(emb.table.data.dtype))
        meta["shape_tail"] = list(emb.table.data.shape[1:])
        meta["optimizer"] = emb.optimizer
        meta["state_keys"] = sorted(emb._state)
        meta["state_dtypes"] = {
            k: str(np.dtype(emb._state[k].dtype)) for k in emb._state}
        meta["state_tails"] = {
            k: list(emb._state[k].shape[1:]) for k in emb._state}
        with open(_meta_path(path), "w") as f:
            json.dump(meta, f)


def restore_embedding(path: str, mesh, axis: str = STORE_AXIS,
                      hyper=None):
    """Restore a DistEmbedding (table + optimizer state) onto ``mesh``."""
    import orbax.checkpoint as ocp

    from cugraph_gnn_tpu.embedding import DistEmbedding

    path = os.path.abspath(path)
    with open(_meta_path(path)) as f:
        meta = json.load(f)
    world = mesh.shape[axis]
    if world != meta["world_size"]:
        raise ValueError(
            f"checkpoint was saved for world_size={meta['world_size']}, "
            f"restoring onto {world} devices (see restore_dist_array)")
    book = _book_from_meta(meta)
    sharding = NamedSharding(mesh, P(axis))

    def abstract(tail, dtype):
        return jax.ShapeDtypeStruct(
            (book.padded_total, *tail), np.dtype(dtype), sharding=sharding)

    tree = {"table": abstract(meta["shape_tail"], meta["dtype"])}
    for k in meta["state_keys"]:
        tree[f"state_{k}"] = abstract(meta["state_tails"][k],
                                      meta["state_dtypes"][k])
    ckptr = ocp.StandardCheckpointer()
    out = ckptr.restore(path, tree)
    emb = DistEmbedding(DistArray(out["table"], book, mesh, axis),
                        optimizer=meta["optimizer"],
                        hyper=hyper or {})
    for k in meta["state_keys"]:
        emb._state[k] = out[f"state_{k}"]
    return emb
