"""ctypes binding for the native C++ helpers (cpp/).

The reference's native layer is C++/CUDA (libwholegraph); on TPU the
device side is XLA/Pallas, but host-side graph construction and file IO
stay native: parallel counting-sort CSR build (ref libcugraph MGGraph
construction the reference calls at graph_store.py:263-329) and
multithreaded / O_DIRECT filelist loading (ref
cpp/src/wholememory/file_io.cpp:91-872).

Builds lazily with `make` on first use; falls back to NumPy when a
toolchain is unavailable.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional, Sequence

import numpy as np

_CPP_DIR = os.path.join(os.path.dirname(__file__), "..", "cpp")
_LIB_PATH = os.path.join(_CPP_DIR, "libcugraph_gnn_tpu_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            # make is a fast no-op when the .so is newer than the
            # sources; a missing/failed toolchain must NOT disable a
            # prebuilt .so, so only require make when none exists yet
            try:
                subprocess.run(["make", "-C", _CPP_DIR], check=True,
                               capture_output=True)
            except Exception as exc:
                if not os.path.exists(_LIB_PATH):
                    raise
                # a prebuilt .so exists: keep running (no-toolchain
                # deployments), but tell developers the rebuild failed
                # so a stale library is not mistaken for current code
                import warnings
                warnings.warn(
                    f"native rebuild failed ({exc!r}); loading the "
                    f"existing {_LIB_PATH} — it may be STALE relative "
                    "to the C++ sources", RuntimeWarning)
            lib = ctypes.CDLL(_LIB_PATH)
            lib.build_csr_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64)]
            lib.degrees_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int64)]
            lib.load_filelist_range.restype = ctypes.c_int
            lib.rcm_order_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.c_int64, ctypes.POINTER(ctypes.c_int32)]
            lib.apply_order_csr_i32.argtypes = [
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int32), ctypes.c_int64,
                ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int32),
                ctypes.POINTER(ctypes.c_int64)]
            _lib = lib
        except Exception:
            _lib = None
        return _lib


def have_native() -> bool:
    return _load() is not None


def _i32ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))


def _i64ptr(a):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64))


def build_csr(key, val, num_nodes: int):
    """CSR build: rows = key, cols = val.  Returns (indptr int64,
    indices int32, perm int64); stable within rows.  Native O(E)
    counting sort; NumPy stable-argsort fallback."""
    key = np.ascontiguousarray(key, np.int32)
    val = np.ascontiguousarray(val, np.int32)
    e = len(key)
    lib = _load()
    if lib is not None and e > 0:
        indptr = np.zeros(num_nodes + 1, np.int64)
        indices = np.zeros(e, np.int32)
        perm = np.zeros(e, np.int64)
        lib.build_csr_i32(_i32ptr(key), _i32ptr(val), e, num_nodes,
                          _i64ptr(indptr), _i32ptr(indices), _i64ptr(perm))
        return indptr, indices, perm
    order = np.argsort(key, kind="stable")
    counts = np.bincount(key, minlength=num_nodes)
    indptr = np.concatenate([[0], np.cumsum(counts)]).astype(np.int64)
    return indptr, val[order], order.astype(np.int64)


def degrees(key, num_nodes: int):
    key = np.ascontiguousarray(key, np.int32)
    lib = _load()
    if lib is not None and len(key) > 0:
        out = np.zeros(num_nodes, np.int64)
        lib.degrees_i32(_i32ptr(key), len(key), num_nodes, _i64ptr(out))
        return out
    return np.bincount(key, minlength=num_nodes).astype(np.int64)


def load_filelist_bytes(paths: Sequence[str], range_off: int,
                        range_len: int, num_threads: int = 8,
                        use_direct: bool = False) -> np.ndarray:
    """Read a byte range of a logically-concatenated filelist
    (multithreaded native path; mmap fallback)."""
    out = np.zeros(range_len, np.uint8)
    lib = _load()
    sizes = np.array([os.path.getsize(p) for p in paths], np.int64)
    if lib is not None:
        arr = (ctypes.c_char_p * len(paths))(
            *[p.encode() for p in paths])
        rc = lib.load_filelist_range(
            ctypes.cast(arr, ctypes.POINTER(ctypes.c_char_p)),
            _i64ptr(sizes), len(paths), range_off, range_len,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_char)),
            num_threads, int(use_direct))
        if rc == 0:
            return out
    # fallback: sequential reads
    pos = 0
    file_start = 0
    for p, sz in zip(paths, sizes):
        a = max(range_off, file_start)
        b = min(range_off + range_len, file_start + int(sz))
        if a < b:
            with open(p, "rb") as f:
                f.seek(a - file_start)
                chunk = f.read(b - a)
            out[a - range_off: b - range_off] = np.frombuffer(chunk, np.uint8)
        file_start += int(sz)
    return out

def rcm_order(indptr, indices) -> np.ndarray:
    """Reverse Cuthill-McKee node order over a CSR graph: returns
    ``order`` (int32) with ``order[new_id] = old_id``.  Native BFS;
    NumPy fallback mirrors it (min-degree seeds, ascending-degree
    frontier visit, reversed)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    n = len(indptr) - 1
    lib = _load()
    if lib is not None and n > 0:
        out = np.zeros(n, np.int32)
        lib.rcm_order_i32(_i64ptr(indptr), _i32ptr(indices), n, _i32ptr(out))
        return out
    deg = (indptr[1:] - indptr[:-1]).astype(np.int64)
    by_deg = np.argsort(deg, kind="stable")
    visited = np.zeros(n, bool)
    order = []
    cursor = 0
    while len(order) < n:
        while visited[by_deg[cursor]]:
            cursor += 1
        seed = int(by_deg[cursor])
        visited[seed] = True
        order.append(seed)
        head = len(order) - 1
        while head < len(order):
            u = order[head]
            head += 1
            nb = indices[indptr[u]:indptr[u + 1]]
            nb = nb[(nb >= 0) & (nb < n)]
            nb = np.unique(nb[~visited[nb]])
            nb = nb[np.argsort(deg[nb], kind="stable")]
            visited[nb] = True
            order.extend(int(v) for v in nb)
    return np.asarray(order[::-1], np.int32)


def apply_order_csr(indptr, indices, order):
    """Relabel a CSR by a node order (new node i = order[i]); neighbor
    ids map through the inverse permutation and sort within rows.
    Returns (new_indptr int64, new_indices int32, edge_perm int64) where
    edge_perm maps new edge position -> old edge position (carry edge
    attributes through with ``attr[edge_perm]``)."""
    indptr = np.ascontiguousarray(indptr, np.int64)
    indices = np.ascontiguousarray(indices, np.int32)
    order = np.ascontiguousarray(order, np.int32)
    n = len(indptr) - 1
    e = len(indices)
    lib = _load()
    if lib is not None and n > 0:
        new_indptr = np.zeros(n + 1, np.int64)
        new_indices = np.zeros(e, np.int32)
        edge_perm = np.zeros(e, np.int64)
        lib.apply_order_csr_i32(
            _i64ptr(indptr), _i32ptr(indices), _i32ptr(order), n,
            _i64ptr(new_indptr), _i32ptr(new_indices), _i64ptr(edge_perm))
        return new_indptr, new_indices, edge_perm
    inv = np.zeros(n, np.int32)
    inv[order] = np.arange(n, dtype=np.int32)
    deg = indptr[1:] - indptr[:-1]
    lens = deg[order]
    new_indptr = np.concatenate([[0], np.cumsum(lens)]).astype(np.int64)
    # ragged gather of the permuted rows' edge ranges
    if e:
        starts = indptr[order]
        offs = np.repeat(starts - new_indptr[:-1], lens)
        old_pos = offs + np.arange(int(lens.sum()), dtype=np.int64)
        vals = indices[old_pos]
        mapped = np.where((vals >= 0) & (vals < n), inv[np.clip(vals, 0, n - 1)],
                          vals)
        # in-row sort: stable argsort on (row, value) keys
        rows = np.repeat(np.arange(n, dtype=np.int64), lens)
        key = rows * (np.int64(n) + 1) + np.clip(mapped, -1, n).astype(np.int64) + 1
        sorter = np.argsort(key, kind="stable")
        new_indices = mapped[sorter].astype(np.int32)
        edge_perm = old_pos[sorter]
    else:
        new_indices = np.zeros(0, np.int32)
        edge_perm = np.zeros(0, np.int64)
    return new_indptr, new_indices, edge_perm
