"""Construction-time edge routing: rank-local COO shards -> owner shards.

The reference builds its distributed graph from rank-local COO with
allgathered sizes and lets the external MGGraph shuffle edges internally
(ref cugraph_pyg/data/graph_store.py:135-208, pylibcugraph MGGraph).
TPU redesign: the shuffle IS a collective — chunks of (src, dst) pairs
ride the same ragged all-to-all as the feature gather, inside one jitted
shard_map step per round; each process reads back only its addressable
shards and accumulates its rows' edges on host.  No process ever holds
the global COO (memory: O(local edges + chunk * world) per process).

Determinism: the logical global COO is the concatenation of per-shard
local edge lists in shard order.  Chunks split each sender's list in
order and the per-chunk owner bucketing is a stable sort, so
re-assembling received segments sender-major (then round-major,
then within-segment) reproduces each owner's edges in global COO
order — per-shard CSRs built from them match a single-host
``from_global_csr`` of that COO bit-exactly.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.store.dist_array import (
    _bucket_by_owner,
    _ragged_a2a,
    put_global,
)
from cugraph_gnn_tpu.store.partition import PartitionBook


def _chunk_router(book: PartitionBook, axis: str, chunk: int, width: int):
    """Per-shard body: bucket one chunk of edge rows by dst owner and
    exchange.  rows: (chunk, width) int32 with dst in column 1; pad rows
    have dst == -1.  Returns (received rows (cap, width), recv segment
    sizes (W,), sender index grid) — receivers slice segments per
    sender on host."""
    world = book.world_size
    cap = world * chunk

    def body(rows):
        dst = rows[:, 1]
        _, perm, counts, offsets = _bucket_by_owner(dst, book)
        sorted_rows = rows[perm]
        recv, recv_sizes, recv_offsets = _ragged_a2a(
            sorted_rows, offsets, counts, axis, cap)
        # stale tail positions (beyond the received total) -> dst -1
        pos = jnp.arange(cap)
        ok = pos < jnp.sum(recv_sizes)
        recv = jnp.where(ok[:, None], recv, -1)
        return recv, recv_sizes.astype(jnp.int32), \
            recv_offsets.astype(jnp.int32)

    return body


def route_local_edges(src, dst, num_nodes: int, mesh: Mesh, axis: str,
                      vals: Optional[dict] = None,
                      book: Optional[PartitionBook] = None,
                      chunk: int = 1 << 18):
    """Route this process's local COO edges to their dst-owner shards.

    src/dst: (E_local,) host arrays — this process's edge shard (every
    process passes its own, different, slice).  vals: optional
    {name: (E_local,) float/int array} per-edge attributes riding the
    same routing.  book: row partition (required in multi-process runs
    where the degree histogram must be pre-agreed; defaults to an
    edge-balanced book computed from a psum'd degree histogram).

    Returns (book, shards) where shards maps each ADDRESSABLE shard
    rank -> dict with 'src', 'dst' (+ attribute names) host arrays in
    global-COO order restricted to that shard's rows.
    """
    from jax.experimental import multihost_utils

    src = np.asarray(src)
    dst = np.asarray(dst)
    world = mesh.shape[axis]
    nproc = max(jax.process_count(), 1)
    local_shards = world // nproc

    if book is None:
        hist = np.zeros(num_nodes + 1, np.int64)
        np.add.at(hist, dst + 1, 1)
        if nproc > 1:
            hist = np.asarray(
                multihost_utils.process_allgather(
                    hist.astype(np.float64))).sum(axis=0).astype(np.int64)
        book = PartitionBook.edge_balanced(np.cumsum(hist), world)

    # pack [src, dst, attrs...] into int32 wire lanes per edge.  Every
    # attribute rides as raw bit patterns: 4-byte dtypes take one lane,
    # 8-byte dtypes (float64 weights, int64 times) split across two
    # lanes, and sub-4-byte dtypes are losslessly widened to a 4-byte
    # representative first.  Nothing is value-converted, so float
    # weights and >=2**31 int64 times round-trip exactly.
    if src.max(initial=0) >= 2**31 or num_nodes >= 2**31:
        raise ValueError("node ids must fit int32")
    names = list((vals or {}).keys())
    cols = [src.astype(np.int32), dst.astype(np.int32)]
    attr_meta = {}  # name -> (orig dtype, wire dtype, n lanes, col off)
    for nm in names:
        v = np.ascontiguousarray(np.asarray(vals[nm]))
        orig = v.dtype
        if v.dtype.itemsize < 4:
            if v.dtype.kind == "f" or v.dtype.name == "bfloat16":
                v = v.astype(np.float32)
            elif v.dtype.kind == "u":
                v = v.astype(np.uint32)
            elif v.dtype.kind in "ib":
                v = v.astype(np.int32)
        if v.dtype.itemsize % 4 or v.dtype.kind not in "ifub":
            raise ValueError(
                f"unsupported edge-attribute dtype {orig} for '{nm}'")
        lanes = v.dtype.itemsize // 4
        attr_meta[nm] = (orig, v.dtype, lanes, len(cols))
        lane_view = v.view(np.int32).reshape(len(v), lanes)
        for j in range(lanes):
            cols.append(lane_view[:, j])
    width = len(cols)
    e_local = len(src)

    # split local edges contiguously among this process's local shards
    per_shard = np.array_split(np.arange(e_local), local_shards)
    # rounds agreed across processes: ceil(max per-shard count / chunk)
    my_max = max((len(s) for s in per_shard), default=0)
    if nproc > 1:
        all_max = np.asarray(multihost_utils.process_allgather(
            np.asarray([my_max], np.int64)))
        rounds = int(-(-int(all_max.max()) // chunk)) or 1
    else:
        rounds = int(-(-my_max // chunk)) or 1

    body = _chunk_router(book, axis, chunk, width)
    step = jax.jit(jax.shard_map(
        body, mesh=mesh, in_specs=P(axis),
        out_specs=(P(axis), P(axis), P(axis))))

    sharding = NamedSharding(mesh, P(axis))
    # per-owner accumulation: segments[owner][sender] = list of arrays
    my_ranks = sorted(
        r for r, d in enumerate(mesh.devices.reshape(-1))
        if d.process_index == jax.process_index())
    segments = {r: [[] for _ in range(world)] for r in my_ranks}

    packed = np.stack(cols, axis=1) if e_local else np.zeros(
        (0, width), np.int32)
    for rnd in range(rounds):
        host_chunk = np.full((world * chunk, width), -1, np.int32)

        def fill(index):
            r0 = (index[0].start or 0) // chunk
            sel = per_shard[r0 - my_ranks[0]] \
                if my_ranks[0] <= r0 < my_ranks[0] + local_shards else None
            out = np.full((chunk, width), -1, np.int32)
            if sel is not None:
                lo = rnd * chunk
                take = sel[lo: lo + chunk]
                if len(take):
                    out[: len(take)] = packed[take]
            return out

        rows = jax.make_array_from_callback(
            (world * chunk, width), sharding, fill)
        recv, sizes, offs = step(rows)
        # read back only addressable shards
        for sh, szs, ofs in zip(recv.addressable_shards,
                                sizes.addressable_shards,
                                offs.addressable_shards):
            r = (sh.index[0].start or 0) // (world * chunk)
            data = np.asarray(sh.data)
            sz = np.asarray(szs.data)
            of = np.asarray(ofs.data)
            for sender in range(world):
                if sz[sender]:
                    seg = data[of[sender]: of[sender] + sz[sender]]
                    # drop routed pad rows (dst == -1); the slice keeps
                    # the sender's original order
                    seg = seg[seg[:, 1] >= 0]
                    if len(seg):
                        segments[r][sender].append(seg)

    shards = {}
    for r in my_ranks:
        parts = [np.concatenate(segments[r][s], axis=0)
                 for s in range(world) if segments[r][s]]
        allr = (np.concatenate(parts, axis=0) if parts
                else np.zeros((0, width), np.int32))
        out = {"src": allr[:, 0].astype(np.int64),
               "dst": allr[:, 1].astype(np.int64)}
        for nm in names:
            orig, wire, lanes, off = attr_meta[nm]
            lane_cols = np.ascontiguousarray(allr[:, off: off + lanes])
            col = lane_cols.view(wire).reshape(-1)
            out[nm] = col if wire == orig else col.astype(orig)
        shards[r] = out
    return book, shards
