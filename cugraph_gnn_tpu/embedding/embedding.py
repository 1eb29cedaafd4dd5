"""Trainable sharded embedding tables with sparse optimizers.

TPU-native equivalent of the reference's embedding engine
(ref cpp/src/wholememory/embedding.cpp:41-1148 embedding_base +
gather_gradient_apply pipeline :136-316; Python API ref
pylibwholegraph/torch/embedding.py:32-639 WholeMemoryEmbedding /
WholeMemoryOptimizer).

Training flow (mirrors EmbeddingLookupFn + add_gradients +
apply_gradients, ref torch/embedding.py:221-245, 345-363):

    rows = emb.gather(ids)                        # forward lookup
    grads = jax.grad(loss, argnums=rows_arg)(...) # autograd on the rows
    emb.add_gradients(ids, grads)                 # accumulate
    opt.step(lr)                                  # dedup + exchange to
                                                  # owners + sparse update

The sparse step per shard: sort+segment-sum dedup of (ids, grads)
(ref sort_unique_indices_func.cu + dedup_indice_and_gradients), ragged
all-to-all to owner ranks (ref exchange_ids/embeddings_nccl_func.cu),
then a second local dedup and a row-sliced optimizer update
(ref embedding_optimizer_func.cu kernels).
"""

from __future__ import annotations

import functools
from typing import Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from cugraph_gnn_tpu.embedding import optimizers as opt_mod
from cugraph_gnn_tpu.parallel.mesh import STORE_AXIS
from cugraph_gnn_tpu.store.dist_array import (
    DistArray,
    _bucket_by_owner,
    _dist_gather_shard,
    _ragged_a2a,
)
from cugraph_gnn_tpu.store.partition import PartitionBook


def dedup_ids_grads(ids, grads, max_unique: Optional[int] = None):
    """Sort-based gradient deduplication: unique ids + summed grads
    (ref embedding.cpp:136-316 sort/unique step).  Static output size
    (= len(ids) by default), -1 padded."""
    n = ids.shape[0]
    max_unique = max_unique or n
    big = jnp.int32(2**31 - 1)
    masked = jnp.where(ids >= 0, ids, big)
    uniq = jnp.unique(masked, size=max_unique, fill_value=big)
    pos = jnp.searchsorted(uniq, masked)
    pos = jnp.clip(pos, 0, max_unique - 1)
    ok = (uniq[pos] == masked) & (ids >= 0)
    seg = jnp.where(ok, pos, max_unique)
    summed = jax.ops.segment_sum(
        jnp.where(ok[:, None], grads, 0), seg, num_segments=max_unique + 1
    )[:max_unique]
    uniq_out = jnp.where(uniq == big, -1, uniq)
    return uniq_out.astype(jnp.int32), summed


def _sparse_apply_shard(table, state, ids, grads, *, book: PartitionBook,
                        axis: str, update_fn, hyper):
    """Per-shard body: dedup -> exchange to owners -> dedup -> row-sliced
    optimizer update on the local shard."""
    b = ids.shape[0]
    world = book.world_size
    # local dedup before the wire (ref hierarchy gather dedup rationale)
    uids, ugrads = dedup_ids_grads(ids, grads)
    sorted_ids, perm, counts, offsets = _bucket_by_owner(uids, book)
    sorted_grads = ugrads[perm]
    req_ids, recv_sizes, recv_offsets = _ragged_a2a(
        sorted_ids, offsets, counts, axis, world * b)
    req_grads, _, _ = _ragged_a2a(
        sorted_grads, offsets, counts, axis, world * b)
    # mask out stale buffer positions beyond the received total
    pos = jnp.arange(world * b)
    in_recv = pos < jnp.sum(recv_sizes)
    req_ids = jnp.where(in_recv, req_ids, -1)
    # second dedup: same id may arrive from several ranks
    fids, fgrads = dedup_ids_grads(req_ids, req_grads)
    my_rank = jax.lax.axis_index(axis)
    my_count = jnp.asarray(
        np.asarray(book.counts).astype(np.int32))[my_rank]
    local = book.local_offset(jnp.maximum(fids, 0))
    ok = ((fids >= 0)
          & (book.owner_of(jnp.maximum(fids, 0)) == my_rank)
          & (local < my_count))
    safe = jnp.where(ok, local, 0)
    rows = table[safe]
    state_rows = {k: v[safe] for k, v in state.items()}
    new_rows, new_state = update_fn(rows, fgrads.astype(rows.dtype),
                                    state_rows, **hyper)
    # write back only touched rows
    safe_w = jnp.where(ok, local, table.shape[0])
    table = table.at[safe_w].set(
        jnp.where(ok[:, None], new_rows, rows), mode="drop")
    out_state = {}
    for k, v in state.items():
        nv = new_state[k]
        out_state[k] = v.at[safe_w].set(
            jnp.where(ok[:, None], nv, state_rows[k]), mode="drop")
    return table, out_state


class DistEmbedding:
    """Sharded trainable embedding table
    (ref torch/embedding.py WholeMemoryEmbedding; cugraph-pyg
    DistEmbedding ref tensor/dist_tensor.py:340-535)."""

    def __init__(self, table: DistArray, optimizer: Optional[str] = None,
                 hyper: Optional[dict] = None):
        self.table = table
        self.optimizer = optimizer
        self.hyper = dict(hyper or {})
        self._pending: List[Tuple[jax.Array, jax.Array]] = []
        self._state: Dict[str, jax.Array] = {}
        if optimizer is not None:
            spec = opt_mod.SPECS[optimizer]
            dim = table.data.shape[1]
            sharding = NamedSharding(table.mesh, P(table.axis))
            n = table.data.shape[0]
            self._state = {
                k: jax.jit(
                    lambda w=w: jnp.zeros(
                        (n, dim * w if w > 0 else 1), jnp.float32),
                    out_shardings=sharding)()
                for k, w in spec.state_widths.items()
            }
            self._apply = jax.jit(self._make_apply())

    # -- lookup -------------------------------------------------------------

    @staticmethod
    def create(num_embeddings: int, dim: int, mesh: Mesh,
               optimizer: Optional[str] = None, hyper: Optional[dict] = None,
               dtype=jnp.float32, init_scale: float = 0.01, seed: int = 0,
               axis: str = STORE_AXIS,
               book: Optional[PartitionBook] = None) -> "DistEmbedding":
        world = mesh.shape[axis]
        book = book or PartitionBook.even(num_embeddings, world)
        sharding = NamedSharding(mesh, P(axis))
        data = jax.jit(
            lambda: init_scale * jax.random.normal(
                jax.random.PRNGKey(seed), (book.padded_total, dim), dtype),
            out_shardings=sharding)()
        return DistEmbedding(DistArray(data, book, mesh, axis),
                             optimizer=optimizer, hyper=hyper)

    def gather(self, ids):
        return self.table.gather(ids)

    def __getitem__(self, ids):
        return self.gather(ids)

    # -- differentiable lookup ----------------------------------------------
    #
    # The reference's EmbeddingLookupFn (ref torch/embedding.py:221-245)
    # is a torch autograd Function whose backward hands the rows
    # cotangent to add_gradients.  The JAX-pure equivalent: a zero
    # "tap" array added to the gathered rows.  ``jax.grad`` w.r.t. the
    # tap IS d loss / d rows (the tap contributes nothing to the primal),
    # and stop_gradient on the table prevents a dense table-sized
    # cotangent from ever materialising — the backward pass stays
    # sparse, exactly like the reference's.

    def make_tap(self, batch_size: int):
        """Zero (B, dim) array to include in the differentiable params of
        a train step; its gradient is the per-row embedding gradient."""
        return jnp.zeros((batch_size, self.table.data.shape[1]),
                         self.table.data.dtype)

    def lookup_fn(self):
        """Pure (table_data, tap, ids) -> rows for use INSIDE jit (pass
        ``emb.table.data`` as the argument — closing over it would embed
        the table as an XLA constant)."""
        book, mesh, axis = self.table.book, self.table.mesh, self.table.axis
        world = mesh.shape[axis]

        def fn(table_data, tap, ids):
            b = ids.shape[0]
            rem = (-b) % world
            if rem:
                ids = jnp.concatenate(
                    [ids, jnp.full((rem,), -1, ids.dtype)])
            g = functools.partial(
                _dist_gather_shard, book=book, axis=axis, fill=0)
            rows = jax.shard_map(
                g, mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=P(axis))(
                jax.lax.stop_gradient(table_data), ids)[:b]
            return rows + tap

        return fn

    def lookup(self, tap, ids):
        """Differentiable lookup (outside-jit convenience — inside a
        jitted step use ``lookup_fn()`` with table.data as an arg)."""
        return self.lookup_fn()(self.table.data, tap, ids)

    # -- training -----------------------------------------------------------

    def add_gradients(self, ids, grads):
        """Accumulate a (ids, grads) pair for the next optimizer step
        (ref embedding.py:345-347 add_gradients list append)."""
        self._pending.append((ids, grads))

    def _make_apply(self):
        update_fn = opt_mod.UPDATE_FNS[self.optimizer]
        book = self.table.book
        axis = self.table.axis
        state_keys = sorted(self._state.keys())

        def apply(table_data, state, ids, grads, lr):
            hyper = dict(self.hyper)
            hyper["lr"] = lr
            f = functools.partial(
                _sparse_apply_shard, book=book, axis=axis,
                update_fn=update_fn, hyper=hyper)
            shard = jax.shard_map(
                f, mesh=self.table.mesh,
                in_specs=(P(axis), {k: P(axis) for k in state_keys},
                          P(axis), P(axis)),
                out_specs=(P(axis), {k: P(axis) for k in state_keys}))
            return shard(table_data, state, ids, grads)

        return apply

    def apply_gradients(self, lr: float):
        """Dedup + exchange + sparse optimizer step over all pending
        gradients (ref embedding.cpp:136-316 gather_gradient_apply)."""
        if self.optimizer is None:
            raise ValueError("embedding created without an optimizer")
        if not self._pending:
            return
        ids = jnp.concatenate([p[0] for p in self._pending])
        grads = jnp.concatenate([p[1] for p in self._pending])
        self._pending.clear()
        _, ids, grads = self.table._pad_batch(ids.astype(jnp.int32), grads)
        self.table.data, self._state = self._apply(
            self.table.data, self._state, ids, grads,
            jnp.float32(lr))


class EmbeddingOptimizer:
    """Groups embeddings so one ``step()`` applies all pending sparse
    updates (ref torch/embedding.py:32-68 WholeMemoryOptimizer)."""

    def __init__(self, embeddings: Optional[List[DistEmbedding]] = None):
        self.embeddings = list(embeddings or [])

    def add_embedding(self, emb: DistEmbedding):
        self.embeddings.append(emb)

    def step(self, lr: float):
        for emb in self.embeddings:
            emb.apply_gradients(lr)
