"""FeatureStore: PyG-compatible keyed tensor store over sharded arrays.

ref cugraph_pyg/data/feature_store.py:24-239 — tensors keyed by
(group_name, attr_name); 2-D tensors become distributed embeddings
(sharded over ranks with remote gather), 1-D tensors distributed arrays;
``get`` with an index performs the cross-rank gather.

TPU redesign: values are DistArray shards over the store mesh axis, or
plain host/device arrays when no mesh is given (single chip).  The
reference's allgather of dims/shapes at put time is unnecessary — JAX
global arrays carry global shape.
"""

from __future__ import annotations

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.store.dist_array import DistArray
from cugraph_gnn_tpu.store.partition import PartitionBook


class FeatureStore:
    """Keyed feature store; ``mesh=None`` keeps features on one device
    (or host) and gathers with plain indexing."""

    def __init__(self, mesh=None, axis: str = "store",
                 pad_features_to: Optional[int] = None):
        """pad_features_to: pad 2-D tensors' feature dim up to a multiple
        of this (128 = TPU lane width; unaligned row gathers are ~4x
        slower on v5e).  Reads slice back to the logical width."""
        self.mesh = mesh
        self.axis = axis
        self.pad_features_to = pad_features_to
        self._store: Dict[Tuple[str, str], object] = {}
        self._logical_width: Dict[Tuple[str, str], int] = {}

    @staticmethod
    def _key(group_name: Optional[str], attr_name: str):
        return (group_name or "", attr_name)

    # -- PyG FeatureStore surface -------------------------------------------

    def put_tensor(self, tensor, group_name: Optional[str], attr_name: str,
                   book: Optional[PartitionBook] = None,
                   location: str = "device", cache_policy=None):
        """location='device' (default): rows live in HBM (sharded when a
        mesh is set).  location='host': rows stay in host RAM behind a
        device LFU cache — the reference's ``memory_location='cpu'`` +
        device-cached-host-embedding configuration
        (ref embedding.cpp:556 device_cached_host_embedding; policy
        builders ref torch/embedding.py:124-216).  Use for feature
        matrices larger than HBM (e.g. papers100M).
        """
        key = self._key(group_name, attr_name)
        tensor = np.asarray(tensor)
        if (self.pad_features_to and tensor.ndim == 2
                and tensor.shape[1] % self.pad_features_to):
            self._logical_width[key] = tensor.shape[1]
            padw = -tensor.shape[1] % self.pad_features_to
            tensor = np.concatenate(
                [tensor, np.zeros((tensor.shape[0], padw), tensor.dtype)],
                axis=1)
        if location == "host":
            from cugraph_gnn_tpu.embedding.cache import CachePolicy
            from cugraph_gnn_tpu.embedding.cached import HostManagedCache
            policy = cache_policy or CachePolicy()
            if tensor.ndim == 1:
                tensor = tensor[:, None]
                kind = "host1d"
            else:
                kind = "host"
            cap = policy.capacity_for(tensor.shape[0])
            # host-managed tags: hit/miss planning never syncs the device
            # (the round-1 DeviceLFUCache's per-batch readback is gone)
            cache = (HostManagedCache(tensor, cap, ways=policy.ways)
                     if cap else None)
            self._store[key] = (kind, (tensor, cache))
            return
        if self.mesh is not None:
            arr = np.asarray(tensor)
            if arr.ndim == 1:
                arr = arr[:, None]
                self._store[key] = ("1d", DistArray.from_array(
                    arr, self.mesh, self.axis, book=book))
            else:
                self._store[key] = ("2d", DistArray.from_array(
                    arr, self.mesh, self.axis, book=book))
        else:
            self._store[key] = ("local", jnp.asarray(tensor))

    def get_tensor(self, group_name: Optional[str], attr_name: str,
                   ids=None):
        """Full reads (ids=None) return the logical (unpadded) tensor;
        id-gathers return the padded rows when ``pad_features_to`` is set
        (the fast path — models consume the padded width)."""
        key = self._key(group_name, attr_name)
        kind, val = self._store[key]
        if ids is None:
            if kind == "local":
                out = val
            elif kind in ("host", "host1d"):
                out = jnp.asarray(val[0])
                out = out[:, 0] if kind == "host1d" else out
            else:
                out = val.to_global()
                out = out[:, 0] if kind == "1d" else out
            if kind not in ("1d", "host1d") and key in self._logical_width:
                out = out[:, : self._logical_width[key]]
            return out
        ids = jnp.asarray(ids)
        if kind in ("host", "host1d"):
            host_rows, cache = val
            if cache is not None:
                rows = cache.gather(ids)
            else:
                ids_np = np.asarray(ids)
                ok = ids_np >= 0
                rows = jnp.asarray(np.where(
                    ok[:, None],
                    host_rows[np.clip(ids_np, 0, len(host_rows) - 1)], 0))
            return rows[:, 0] if kind == "host1d" else rows
        if kind == "local":
            ok = ids >= 0
            rows = val[jnp.clip(ids, 0)]
            z = jnp.zeros((), val.dtype)
            return jnp.where(
                ok[(...,) + (None,) * (rows.ndim - ids.ndim)], rows, z)
        rows = val.gather(ids)
        return rows[:, 0] if kind == "1d" else rows

    def prefetch(self, group_name: Optional[str], attr_name: str, ids):
        """Start the host-side fetch for the NEXT ``get_tensor(ids=...)``
        of a host-located tensor in a worker thread (double-buffered
        input pipeline).  No-op for device-resident tensors."""
        kind, val = self._store[self._key(group_name, attr_name)]
        if kind in ("host", "host1d") and val[1] is not None:
            val[1].prefetch(ids)

    def remove_tensor(self, group_name: Optional[str], attr_name: str):
        self._store.pop(self._key(group_name, attr_name), None)

    def get_tensor_size(self, group_name: Optional[str], attr_name: str):
        kind, val = self._store[self._key(group_name, attr_name)]
        if kind == "local":
            return tuple(val.shape)
        if kind in ("host", "host1d"):
            shape = val[0].shape
            return (shape[0],) if kind == "host1d" else tuple(shape)
        shape = val.shape
        return (shape[0],) if kind == "1d" else tuple(shape)

    def get_all_tensor_attrs(self):
        return list(self._store.keys())

    def __contains__(self, key):
        group, name = key if isinstance(key, tuple) else ("", key)
        return self._key(group, name) in self._store

    # convenience dict-style access used throughout examples
    def __setitem__(self, key, tensor):
        group, name = key if isinstance(key, tuple) else ("", key)
        self.put_tensor(tensor, group, name)

    def __getitem__(self, key):
        group, name = key if isinstance(key, tuple) else ("", key)
        return self.get_tensor(group, name)

    def multi_get_tensor(self, keys, ids=None):
        return [self.get_tensor(g, n, ids) for g, n in keys]
