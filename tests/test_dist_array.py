"""DistArray distributed gather/scatter over an 8-virtual-device CPU mesh
(SURVEY.md §4 MG test strategy; semantics ref
cpp/tests/wholememory_ops/wholememory_gather_tests.cu:126-277)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from cugraph_gnn_tpu.parallel.mesh import create_store_mesh, STORE_AXIS
from cugraph_gnn_tpu.store.dist_array import DistArray
from cugraph_gnn_tpu.store.partition import PartitionBook


@pytest.fixture(scope="module")
def mesh():
    assert jax.device_count() >= 8, "conftest must force 8 cpu devices"
    return create_store_mesh(8)


def test_partition_book_even():
    book = PartitionBook.even(100, 8)
    assert book.shard_size == 13
    assert book.padded_total == 104
    ids = np.array([0, 12, 13, 99, 95])
    np.testing.assert_array_equal(book.owner_of_np(ids), [0, 0, 1, 7, 7])
    np.testing.assert_array_equal(
        np.asarray(book.local_offset(jnp.asarray(ids))), [0, 12, 0, 8, 4])


def test_partition_book_custom():
    book = PartitionBook.from_counts([10, 30, 5, 20])
    assert book.total == 65
    ids = np.array([0, 9, 10, 39, 40, 44, 45, 64])
    np.testing.assert_array_equal(
        book.owner_of_np(ids), [0, 0, 1, 1, 2, 2, 3, 3])
    np.testing.assert_array_equal(
        np.asarray(book.owner_of(jnp.asarray(ids))), [0, 0, 1, 1, 2, 2, 3, 3])


def test_dist_array_roundtrip(mesh, rng):
    n, f = 100, 16
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = DistArray.from_array(host, mesh)
    np.testing.assert_array_equal(np.asarray(arr.to_global()), host)
    # local shards tile the rows
    got = np.concatenate(
        [np.asarray(arr.local_shard(r)) for r in range(8)])
    np.testing.assert_array_equal(got, host)


def test_dist_gather(mesh, rng):
    n, f, b = 200, 8, 64
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = DistArray.from_array(host, mesh)
    ids = rng.integers(0, n, b).astype(np.int32)
    out = arr.gather(jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(out), host[ids], rtol=1e-6)


def test_dist_gather_negative_ids(mesh, rng):
    n, f = 64, 4
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = DistArray.from_array(host, mesh)
    ids = np.array([5, -1, 63, -1, 0, 17, -1, 2], np.int32)
    out = np.asarray(arr.gather(jnp.asarray(ids)))
    expect = np.where((ids >= 0)[:, None], host[np.clip(ids, 0, None)], 0)
    np.testing.assert_allclose(out, expect, rtol=1e-6)


def test_dist_gather_skewed(mesh, rng):
    # All queries hit one shard — worst-case bucket skew.
    n, f, b = 80, 4, 40
    host = rng.standard_normal((n, f)).astype(np.float32)
    arr = DistArray.from_array(host, mesh)
    ids = rng.integers(0, 10, b).astype(np.int32)  # all owned by rank 0
    out = np.asarray(arr.gather(jnp.asarray(ids)))
    np.testing.assert_allclose(out, host[ids], rtol=1e-6)


def test_dist_scatter(mesh, rng):
    n, f, b = 96, 4, 24
    host = np.zeros((n, f), np.float32)
    arr = DistArray.from_array(host, mesh)
    ids = rng.choice(n, b, replace=False).astype(np.int32)
    vals = rng.standard_normal((b, f)).astype(np.float32)
    arr.scatter(jnp.asarray(ids), jnp.asarray(vals))
    expect = host.copy()
    expect[ids] = vals
    np.testing.assert_allclose(np.asarray(arr.to_global()), expect, rtol=1e-6)


def test_dist_scatter_add(mesh, rng):
    n, f, b = 64, 4, 128
    base = rng.standard_normal((n, f)).astype(np.float32)
    arr = DistArray.from_array(base.copy(), mesh)
    ids = rng.integers(0, n, b).astype(np.int32)  # duplicates on purpose
    vals = rng.standard_normal((b, f)).astype(np.float32)
    arr.scatter_add(jnp.asarray(ids), jnp.asarray(vals))
    expect = base.copy()
    np.add.at(expect, ids, vals)
    np.testing.assert_allclose(
        np.asarray(arr.to_global()), expect, rtol=1e-5, atol=1e-5)


def test_round_robin_book():
    from cugraph_gnn_tpu.store.partition import RoundRobinBook
    book = RoundRobinBook(total=100, world_size=8)
    ids = np.array([0, 1, 7, 8, 15, 16, 99])
    np.testing.assert_array_equal(book.owner_of_np(ids), ids % 8)
    np.testing.assert_array_equal(book.local_offset_np(ids), ids // 8)
    np.testing.assert_array_equal(
        np.asarray(book.owner_of(jnp.asarray(ids))), ids % 8)
    assert book.counts.sum() == 100
    # ranks 0..3 get 13 rows, 4..7 get 12
    np.testing.assert_array_equal(book.counts[:4], 13)
    np.testing.assert_array_equal(book.counts[4:], 12)


def test_dist_array_round_robin_gather(mesh, rng):
    """Round-robin sharded array: gather/scatter correctness
    (ref round-robin shard support, embedding.h:124-136)."""
    from cugraph_gnn_tpu.store.partition import RoundRobinBook
    n, f, b = 100, 8, 48
    host = rng.standard_normal((n, f)).astype(np.float32)
    book = RoundRobinBook(total=n, world_size=8)
    arr = DistArray.from_array(host, mesh, book=book)
    np.testing.assert_array_equal(arr.to_global(), host)
    ids = rng.integers(0, n, b).astype(np.int32)
    ids[::11] = -1
    out = np.asarray(arr.gather(jnp.asarray(ids)))
    expect = np.where((ids >= 0)[:, None], host[np.clip(ids, 0, None)], 0)
    np.testing.assert_allclose(out, expect, rtol=1e-6)
    # scatter_add round trip
    vals = rng.standard_normal((b, f)).astype(np.float32)
    arr.scatter_add(jnp.asarray(ids), jnp.asarray(vals))
    expect2 = host.copy()
    ok = ids >= 0
    np.add.at(expect2, ids[ok], vals[ok])
    np.testing.assert_allclose(arr.to_global(), expect2, rtol=1e-5,
                               atol=1e-5)


def test_split_mesh(mesh, rng):
    """Sub-group meshes (communicator split parity): a DistArray on a
    2-device sub-mesh only spans those devices."""
    from cugraph_gnn_tpu.parallel.mesh import split_mesh
    subs = split_mesh(mesh, 2)
    assert len(subs) == 4
    host = rng.standard_normal((20, 4)).astype(np.float32)
    arr = DistArray.from_array(host, subs[1])
    assert arr.world == 2
    ids = rng.integers(0, 20, 8).astype(np.int32)
    np.testing.assert_allclose(
        np.asarray(arr.gather(jnp.asarray(ids))), host[ids], rtol=1e-6)


def test_from_file_npy_and_pt(mesh, tmp_path):
    """DistArray.from_file: mmap .npy / .pt load, even and round-robin
    books (ref dist_tensor.py:127-150 DistTensor.from_file)."""
    rng = np.random.default_rng(3)
    host = rng.standard_normal((101, 6)).astype(np.float32)
    npy = tmp_path / "x.npy"
    np.save(npy, host)
    da = DistArray.from_file(str(npy), mesh)
    np.testing.assert_allclose(da.to_global(), host)
    # dtype conversion on load
    da16 = DistArray.from_file(str(npy), mesh, dtype=np.float16)
    np.testing.assert_allclose(da16.to_global(), host.astype(np.float16))
    # round-robin book
    from cugraph_gnn_tpu.store.partition import RoundRobinBook
    rr = RoundRobinBook(total=101, world_size=8)
    darr = DistArray.from_file(str(npy), mesh, book=rr)
    np.testing.assert_allclose(darr.to_global(), host)
    # torch .pt
    import torch
    pt = tmp_path / "x.pt"
    torch.save(torch.from_numpy(host), str(pt))
    dapt = DistArray.from_file(str(pt), mesh)
    np.testing.assert_allclose(dapt.to_global(), host)
    # unsupported extension
    with pytest.raises(ValueError, match="file type"):
        DistArray.from_file("x.csv", mesh)
