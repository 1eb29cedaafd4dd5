"""Checkpoint / file IO tests (ref tests/pylibwholegraph/test_wholememory_io.py
round-trip strategy: store per-rank shards, reload under a different
world size, verify equality)."""

import os

import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.embedding import DistEmbedding
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.store.dist_array import DistArray
from cugraph_gnn_tpu.store.partition import PartitionBook
from cugraph_gnn_tpu.utils.checkpoint import (
    load_embedding,
    load_filelist,
    load_shard_files,
    save_embedding,
    store_shard_files,
)


@pytest.fixture(scope="module")
def mesh():
    return create_store_mesh(8)


def test_shard_file_roundtrip(tmp_path, rng):
    arr = rng.standard_normal((100, 16)).astype(np.float32)
    book = PartitionBook.even(100, 8)
    prefix = str(tmp_path / "feat")
    store_shard_files(prefix, arr, book)
    assert os.path.exists(f"{prefix}_part_0_of_8")
    out = load_shard_files(prefix)
    np.testing.assert_array_equal(out, arr)


def test_shard_file_worldsize_change(tmp_path, rng):
    """Save with 8 shards, reload as a whole, re-partition to 4 —
    world-size elasticity (the reference supports this via logical
    concatenation, ref file_io.cpp)."""
    arr = rng.standard_normal((64, 4)).astype(np.float32)
    store_shard_files(str(tmp_path / "a"), arr, PartitionBook.even(64, 8))
    out = load_shard_files(str(tmp_path / "a"))
    book4 = PartitionBook.from_counts([20, 20, 20, 4])
    # reload into custom partition: shard r gets rows [offsets[r], ...)
    for r in range(4):
        lo, hi = int(book4.offsets[r]), int(book4.offsets[r + 1])
        np.testing.assert_array_equal(out[lo:hi], arr[lo:hi])


def test_load_filelist_rank_partition(tmp_path, rng):
    """Rank-partitioned filelist load (ref wholememory_load_from_file)."""
    rows, width = 90, 8
    full = rng.standard_normal((rows, width)).astype(np.float32)
    files = []
    for i, part in enumerate(np.array_split(full, 3)):
        p = str(tmp_path / f"f{i}.bin")
        part.tofile(p)
        files.append(p)
    book = PartitionBook.even(rows, 4)
    for r in range(4):
        out = load_filelist(files, np.float32, width, book, r)
        lo, hi = int(book.offsets[r]), int(book.offsets[r + 1])
        np.testing.assert_array_equal(out, full[lo:hi])


def test_load_filelist_restride(tmp_path, rng):
    """Entry re-striding on load (ref wholememory.h:429-461)."""
    rows, width = 20, 6
    full = rng.standard_normal((rows, width)).astype(np.float32)
    p = str(tmp_path / "w.bin")
    full.tofile(p)
    out = load_filelist([p], np.float32, width, entry_stride=8)
    assert out.shape == (20, 8)
    np.testing.assert_array_equal(out[:, :6], full)
    np.testing.assert_array_equal(out[:, 6:], 0)


def test_embedding_save_load(tmp_path, mesh, rng):
    """Table + optimizer state round trip (ref torch/embedding.py:388-407)."""
    host = rng.standard_normal((64, 8)).astype(np.float32)
    emb = DistEmbedding(DistArray.from_array(host.copy(), mesh),
                        optimizer="lazy_adam")
    # make some state
    ids = rng.choice(64, 16, replace=False).astype(np.int32)
    grads = rng.standard_normal((16, 8)).astype(np.float32)
    emb.add_gradients(jnp.asarray(ids), jnp.asarray(grads))
    emb.apply_gradients(lr=0.01)
    prefix = str(tmp_path / "emb")
    save_embedding(prefix, emb)

    emb2 = DistEmbedding(DistArray.from_array(np.zeros((64, 8), np.float32),
                                              mesh),
                         optimizer="lazy_adam")
    load_embedding(prefix, emb2)
    np.testing.assert_allclose(emb2.table.to_global(), emb.table.to_global())
    for k in emb._state:
        np.testing.assert_allclose(np.asarray(emb2._state[k]),
                                   np.asarray(emb._state[k]))
    # training continues identically after reload
    ids2 = rng.choice(64, 8, replace=False).astype(np.int32)
    g2 = rng.standard_normal((8, 8)).astype(np.float32)
    for e in (emb, emb2):
        e.add_gradients(jnp.asarray(ids2), jnp.asarray(g2))
        e.apply_gradients(lr=0.01)
    np.testing.assert_allclose(emb2.table.to_global(), emb.table.to_global(),
                               rtol=1e-6)
