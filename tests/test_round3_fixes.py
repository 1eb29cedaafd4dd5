"""Round-3 regression tests (VERDICT.md round-2 agenda items).

Covers:
- negative-sampling true-edge rejection beyond the 2**31 packed-key
  range (VERDICT #10 — the old src*num_dst+dst int64 key silently
  truncated to int32 with jax_enable_x64 off);
- the 64-bit global edge-id planes (VERDICT #1): helper round-trips,
  32/64-bit sampling equivalence, and a real >2**31-edge CSR sampled on
  the CPU mesh with edge ids asserted beyond 2**31;
- out-of-core per-rank graph construction (VERDICT #2):
  DistGraph.from_shard_files bit-exact vs from_global_csr;
- edge-balanced row partitioning (VERDICT weak #3).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.parallel.mesh import create_store_mesh
from cugraph_gnn_tpu.sampler.negative import (
    NegativeSampling,
    make_edge_key_sorted,
    sample_negative_edges,
)


@pytest.fixture(scope="module")
def cpu_mesh():
    return create_store_mesh(8)


def test_true_edge_rejection_beyond_int32_key_space():
    # 60k x 60k node space: packed src*num_dst+dst keys exceed 2**31,
    # which wrapped (and broke rejection) under the old packed-int
    # scheme.  Every dst of src=59_999 is a true edge, so every draw
    # pinned to that src must end up rejected (-1).
    num_src = num_dst = 60_000
    hot_src = num_src - 1
    src_e = np.full((num_dst,), hot_src, np.int64)
    dst_e = np.arange(num_dst, dtype=np.int64)
    ek = make_edge_key_sorted(src_e, dst_e, num_dst)

    count = 256
    cfg = NegativeSampling(mode="triplet", amount=1.0)
    pinned = jnp.full((count,), hot_src, jnp.int32)
    s, d = sample_negative_edges(
        jax.random.PRNGKey(0), num_src, num_dst, count, cfg,
        edge_key_sorted=ek, src=pinned)
    assert np.all(np.asarray(s) == -1)
    assert np.all(np.asarray(d) == -1)

    # ...and a src with no true edges must sail through untouched.
    clean = jnp.zeros((count,), jnp.int32)
    s2, d2 = sample_negative_edges(
        jax.random.PRNGKey(1), num_src, num_dst, count, cfg,
        edge_key_sorted=ek, src=clean)
    assert np.all(np.asarray(s2) == 0)
    assert np.all(np.asarray(d2) >= 0)


def test_rejection_exact_membership_small():
    # exact membership semantics on a small graph: only true pairs
    # trigger the redraw/mask path.
    rng = np.random.default_rng(7)
    src_e = rng.integers(0, 50, 200)
    dst_e = rng.integers(0, 50, 200)
    ek = make_edge_key_sorted(src_e, dst_e, 50)
    true_set = set(zip(src_e.tolist(), dst_e.tolist()))

    cfg = NegativeSampling()
    s, d = sample_negative_edges(
        jax.random.PRNGKey(3), 50, 50, 512, cfg, edge_key_sorted=ek)
    s = np.asarray(s)
    d = np.asarray(d)
    valid = s >= 0
    for a, b in zip(s[valid].tolist(), d[valid].tolist()):
        assert (a, b) not in true_set


# ---------------------------------------------------------------------------
# 64-bit edge-id planes (ops/edge_ids.py)
# ---------------------------------------------------------------------------


def test_edge_id_plane_roundtrip():
    from cugraph_gnn_tpu.ops.edge_ids import (
        EDGE_LO_MOD,
        combine_local,
        from_int64_np,
        split_bases_np,
        to_int64_np,
    )
    gids = np.array([0, 1, EDGE_LO_MOD - 1, EDGE_LO_MOD, 2**31,
                     2**31 + 12345, 3_200_000_000, 2**40, -1], np.int64)
    hi, lo = from_int64_np(gids)
    assert np.array_equal(to_int64_np(hi, lo), gids)

    # device combine with carry: base chosen so base_lo + local wraps
    base = np.int64(2**31 - 7)  # lo part near the modulus
    planes = split_bases_np([base])
    local = jnp.asarray([0, 3, 10, EDGE_LO_MOD - 1, -1], jnp.int32)
    chi, clo = combine_local(local, planes[0, 0], planes[0, 1])
    got = to_int64_np(np.asarray(chi), np.asarray(clo))
    want = np.where(np.asarray(local) >= 0,
                    base + np.asarray(local, np.int64), -1)
    assert np.array_equal(got, want)


def _random_csr(n, e, seed):
    from cugraph_gnn_tpu.native import build_csr
    rng = np.random.default_rng(seed)
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    indptr, indices, perm = build_csr(
        dst.astype(np.int64), src.astype(np.int64), n)
    return src, dst, indptr, indices, perm


def test_dist_graph_64bit_matches_32bit(cpu_mesh):
    from cugraph_gnn_tpu.sampler.dist_sampler import (
        DistGraph,
        DistNeighborSampler,
    )
    _, _, indptr, indices, _ = _random_csr(500, 4000, 0)
    g32 = DistGraph.from_global_csr(indptr, indices, cpu_mesh)
    g64 = DistGraph.from_global_csr(indptr, indices, cpu_mesh,
                                    edge_id_bits=64)
    assert g32.edge_id_bits == 32 and g64.edge_id_bits == 64
    seeds = jnp.arange(64, dtype=jnp.int32)
    o32 = DistNeighborSampler(g32, [3, 2]).sample(
        jax.random.PRNGKey(0), seeds)
    o64 = DistNeighborSampler(g64, [3, 2]).sample(
        jax.random.PRNGKey(0), seeds)
    for h in range(2):
        assert o32.hops[h].edge_hi is None
        assert o64.hops[h].edge_hi is not None
        assert np.array_equal(
            np.asarray(o32.hops[h].edge_ids).astype(np.int64),
            o64.hops[h].edge_ids64())
        assert np.array_equal(np.asarray(o32.hops[h].neigh_global),
                              np.asarray(o64.hops[h].neigh_global))
    # COO decoder carries the hi plane through
    from cugraph_gnn_tpu.sampler.output import to_coo
    c32, c64 = to_coo(o32), to_coo(o64)
    assert c32.edge_hi is None and c64.edge_hi is not None
    assert np.array_equal(np.asarray(c32.edge).astype(np.int64),
                          c64.edge_ids64())


def test_from_shard_files_bitexact(cpu_mesh, tmp_path):
    from cugraph_gnn_tpu.sampler.dist_sampler import (
        DistGraph,
        DistNeighborSampler,
    )
    n, e = 700, 6000
    src, dst, indptr, indices, perm = _random_csr(n, e, 1)
    w = np.random.default_rng(2).random(e).astype(np.float32)
    gA = DistGraph.from_global_csr(indptr, indices, cpu_mesh,
                                   weights=w[perm])
    files, wfiles = [], []
    for k, sl in enumerate(np.array_split(np.arange(e), 3)):
        p = tmp_path / f"edges_{k}.npy"
        np.save(p, np.stack([src[sl], dst[sl]], axis=1))
        files.append(str(p))
        pw = tmp_path / f"w_{k}.npy"
        np.save(pw, w[sl])
        wfiles.append(str(pw))
    gB = DistGraph.from_shard_files(files, n, cpu_mesh,
                                    weights_files=wfiles)
    assert np.array_equal(gA.book.offsets, gB.book.offsets)
    assert np.array_equal(np.asarray(gA.indptr), np.asarray(gB.indptr))
    assert np.array_equal(np.asarray(gA.indices), np.asarray(gB.indices))
    assert np.array_equal(np.asarray(gA.edge_base),
                          np.asarray(gB.edge_base))
    assert np.allclose(np.asarray(gA.weights), np.asarray(gB.weights))
    seeds = jnp.arange(64, dtype=jnp.int32)
    oA = DistNeighborSampler(gA, [3, 2]).sample(jax.random.PRNGKey(0), seeds)
    oB = DistNeighborSampler(gB, [3, 2]).sample(jax.random.PRNGKey(0), seeds)
    for h in range(2):
        assert np.array_equal(np.asarray(oA.hops[h].edge_ids),
                              np.asarray(oB.hops[h].edge_ids))
        assert np.array_equal(np.asarray(oA.hops[h].neigh_global),
                              np.asarray(oB.hops[h].neigh_global))


def test_edge_balanced_partition():
    from cugraph_gnn_tpu.store.partition import PartitionBook
    rng = np.random.default_rng(3)
    # heavily skewed degrees: even-row split would blow up one shard
    deg = np.minimum((25 * (1 - rng.random(10_000)) ** -0.7).astype(
        np.int64), 5000)
    deg[::1111] = 5000  # plant hubs
    indptr = np.concatenate([[0], np.cumsum(deg)])
    w = 8
    book = PartitionBook.edge_balanced(indptr, w)
    per_shard_e = np.diff(indptr[book.offsets])
    mean_e = indptr[-1] / w
    # max shard within mean + one max row (a single row is indivisible)
    assert per_shard_e.max() <= mean_e + deg.max()
    assert book.total == 10_000
    assert np.all(np.diff(book.offsets) >= 0)
    even = PartitionBook.even(10_000, w)
    even_e = np.diff(indptr[even.offsets])
    assert per_shard_e.max() <= even_e.max()


def test_papers100m_scale_edge_ids_beyond_int32(cpu_mesh, tmp_path):
    """VERDICT #1 'done' criterion: a synthetic CSR with >2**31 edges
    (mmap host, sliced shards) samples correctly on the CPU mesh, with
    edge ids asserted beyond 2**31.

    2**20 nodes x 2100 in-degree = 2,202,009,600 edges (~8.8GB int32
    indices, memory-mapped; each of the 8 shards holds ~275M edges —
    under the 2**30 per-shard local limit)."""
    import os
    import shutil
    import tempfile
    avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    if avail < 48 * 2**30:
        pytest.skip("needs ~48GB free RAM for the 2.2B-edge graph")

    from cugraph_gnn_tpu.sampler.dist_sampler import (
        DistGraph,
        DistNeighborSampler,
    )

    n = 1 << 20
    deg = 2050
    e = n * deg
    assert e > 2**31
    indptr = np.arange(n + 1, dtype=np.int64) * deg
    # RAM-backed mmap (/dev/shm): the point is out-of-one-array slicing,
    # not disk throughput — and it keeps the test under CI time budget
    shm = tempfile.mkdtemp(dir="/dev/shm" if os.path.isdir("/dev/shm")
                           else str(tmp_path))
    path = os.path.join(shm, "indices.i32")
    indices = np.memmap(path, dtype=np.int32, mode="w+", shape=(e,))
    # cheap deterministic neighbor pattern (n is a power of two, so the
    # multiplicative hash is a cheap masked multiply)
    # uint32 pipeline, in-place ops, no temporaries: the hash wraps
    # mod 2**32 naturally and the mask keeps it in [0, n)
    chunk = 1 << 27
    base = np.arange(chunk, dtype=np.uint32)
    base *= np.uint32(2654435761)
    step = np.uint32((chunk * 2654435761) & 0xFFFFFFFF)
    buf = np.empty(chunk, np.uint32)
    for k, lo in enumerate(range(0, e, chunk)):
        hi = min(lo + chunk, e)
        np.add(base[: hi - lo], np.uint32((k * int(step)) & 0xFFFFFFFF),
               out=buf[: hi - lo])
        np.bitwise_and(buf[: hi - lo], np.uint32(n - 1),
                       out=buf[: hi - lo])
        indices[lo:hi] = buf[: hi - lo].view(np.int32)
    del base, buf
    indices.flush()

    g = DistGraph.from_global_csr(indptr, indices, cpu_mesh)
    assert g.edge_id_bits == 64

    # seeds spanning the id space, incl. the last node whose edge ids
    # all exceed 2**31
    seeds_np = np.array(
        [0, 1, 12345, n // 2, n - 2, n - 1] + list(range(58)), np.int64)
    seeds = jnp.asarray(seeds_np, jnp.int32)
    out = DistNeighborSampler(g, [8]).sample(jax.random.PRNGKey(7), seeds)
    hop = out.hops[0]
    gids = hop.edge_ids64()
    nbrs = np.asarray(hop.neigh_global)
    assert gids.shape == (64, 8)
    for i, s in enumerate(seeds_np):
        row = gids[i]
        valid = row >= 0
        assert valid.sum() == 8  # every row has degree 2100 >= fanout
        lo_b, hi_b = int(indptr[s]), int(indptr[s + 1])
        assert np.all(row[valid] >= lo_b) and np.all(row[valid] < hi_b)
        # edge id -> column lookup through the mmap must reproduce the
        # sampled neighbor
        assert np.array_equal(indices[row[valid]], nbrs[i][valid])
    last = gids[5]
    assert np.all(last > 2**31), "last node's edge ids must exceed int32"
    # distinct positions within the row (without replacement)
    assert len(set(last.tolist())) == 8
    del indices
    shutil.rmtree(shm, ignore_errors=True)


# ---------------------------------------------------------------------------
# pod-scale capacity discipline (VERDICT #6)
# ---------------------------------------------------------------------------


def test_gather_recv_cap_policy_is_O_batch():
    from cugraph_gnn_tpu.store.dist_array import (
        _use_ragged_a2a,
        dist_gather_recv_cap,
    )
    # ragged-a2a (TPU) keeps the flat world*B buffer up to world 8
    # (small, collective-minimal); the DENSE fallback bounds from
    # world > 4 — its response leg pads to world^2*B rows (the
    # SCALING_r04 W=8 blowup, fixed round 5)
    if _use_ragged_a2a():
        assert dist_gather_recv_cap(512, 8) is None
    else:
        assert dist_gather_recv_cap(512, 4) is None
        assert dist_gather_recv_cap(512, 8) is not None
    # beyond that the request buffer is O(B), independent of world size
    for world in (16, 32, 256, 1024):
        cap = dist_gather_recv_cap(4096, world)
        assert cap <= 2 * 4096 + world  # ~2B, not world*B
        assert cap % world == 0  # exact per-sender quota
    # ...and scales with B, not world
    assert dist_gather_recv_cap(512, 256) < dist_gather_recv_cap(8192, 256)


def test_bounded_gather_world32_subprocess():
    """Bounded multi-round gather on a 32-device mesh: request buffers
    ~2B (vs the flat 32*B), results equal to the host reference under
    extreme owner skew (all ids on one shard => multiple rounds)."""
    import subprocess
    import sys
    script = r"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 32)
import numpy as np, jax.numpy as jnp
from cugraph_gnn_tpu.store.dist_array import DistArray, dist_gather_recv_cap
from cugraph_gnn_tpu.parallel.mesh import create_store_mesh

mesh = create_store_mesh(32)
rng = np.random.default_rng(0)
tbl = rng.standard_normal((6400, 8)).astype(np.float32)
da = DistArray.from_array(tbl, mesh)
b = 1024
cap = dist_gather_recv_cap(b // 32, 32)
assert cap is not None and cap <= 2 * b, cap
# extreme skew: every id lives on shard 0 (forces multi-round windows)
ids_np = rng.integers(0, 200, b)
got = np.asarray(da.gather(jnp.asarray(ids_np, jnp.int32)))
assert np.allclose(got, tbl[ids_np]), "skewed bounded gather wrong"
# mixed ids incl. -1 pads
ids_np = rng.integers(-1, 6400, b)
got = np.asarray(da.gather(jnp.asarray(ids_np, jnp.int32)))
want = np.where((ids_np >= 0)[:, None], tbl[np.maximum(ids_np, 0)], 0)
assert np.allclose(got, want), "mixed bounded gather wrong"
print("OK32")
"""
    r = subprocess.run([sys.executable, "-c", script],
                       capture_output=True, text=True, timeout=420,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "OK32" in r.stdout


def test_graph_store_local_edges_loader(cpu_mesh):
    """put_local_edge_index -> DistNeighborLoader builds the graph via
    the distributed exchange; batches match the global-COO loader
    bit-exactly (single process: the local shard IS the global COO)."""
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader.dist_loader import DistNeighborLoader

    rng = np.random.default_rng(0)
    n, e, f = 600, 5000, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, 4, n).astype(np.int32)

    def mk(local):
        gs = GraphStore()
        if local:
            gs.put_local_edge_index((src, dst), ("N", "e", "N"),
                                    num_nodes=(n, n))
        else:
            gs.put_edge_index((src, dst), ("N", "e", "N"),
                              num_nodes=(n, n))
        fs = FeatureStore()
        fs[("", "x")] = x
        fs[("", "y")] = y
        return DistNeighborLoader((fs, gs), [4, 4], cpu_mesh,
                                  batch_size=64, seed=3)

    for bA, bB in zip(mk(False), mk(True)):
        assert np.array_equal(np.asarray(bA.seeds), np.asarray(bB.seeds))
        for h in range(2):
            assert np.array_equal(
                np.asarray(bA.sample.hops[h].edge_ids),
                np.asarray(bB.sample.hops[h].edge_ids))
        assert np.allclose(np.asarray(bA.x), np.asarray(bB.x))

    # finalize() on a local store must refuse loudly
    gs = GraphStore()
    gs.put_local_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    with pytest.raises(ValueError, match="rank-LOCAL"):
        gs.finalize()


# ---------------------------------------------------------------------------
# hierarchical product path (VERDICT #4)
# ---------------------------------------------------------------------------


def test_hierarchical_loader_matches_flat():
    """DistNeighborLoader on a (2, 4) node x device mesh: same batches
    as the flat 8-device loader bit-exactly (the two-phase gather and
    the tuple-axis seed routing change the wire pattern, not the
    results)."""
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader.dist_loader import DistNeighborLoader
    from cugraph_gnn_tpu.parallel.mesh import (
        create_hierarchical_mesh,
        create_store_mesh,
    )

    rng = np.random.default_rng(0)
    n, e, f = 600, 5000, 16
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    y = rng.integers(0, 4, n).astype(np.int32)

    def mk(mesh, axis):
        gs = GraphStore()
        gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
        fs = FeatureStore()
        fs[("", "x")] = x
        fs[("", "y")] = y
        return DistNeighborLoader((fs, gs), [4, 4], mesh, batch_size=64,
                                  seed=3, axis=axis, dedup=True)

    flat = mk(create_store_mesh(8), "store")
    hier = mk(create_hierarchical_mesh(2), ("node", "device"))
    n_batches = 0
    for bA, bB in zip(flat, hier):
        n_batches += 1
        assert np.array_equal(np.asarray(bA.seeds), np.asarray(bB.seeds))
        for h in range(2):
            assert np.array_equal(
                np.asarray(bA.sample.hops[h].edge_ids),
                np.asarray(bB.sample.hops[h].edge_ids)), h
        assert np.allclose(np.asarray(bA.x), np.asarray(bB.x))
        assert np.array_equal(np.asarray(bA.y), np.asarray(bB.y))
    assert n_batches == len(flat)


def test_hierarchical_loader_dcn_volume_bounded():
    """The loader's input-node feature gather dedups ids before DCN:
    the per-device cross-node id volume is <= what the flat exchange
    would ship (every duplicated request crosses once)."""
    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader.dist_loader import DistNeighborLoader
    from cugraph_gnn_tpu.parallel.mesh import create_hierarchical_mesh
    from cugraph_gnn_tpu.store.hierarchical import HierarchicalDistArray

    rng = np.random.default_rng(1)
    n, e, f = 400, 6000, 8
    # hub-heavy graph => heavily duplicated frontiers
    src = (rng.integers(0, 20, e) * rng.integers(1, 3, e)) % n
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)

    mesh = create_hierarchical_mesh(2)
    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = x
    loader = DistNeighborLoader((fs, gs), [8, 8], mesh, batch_size=64,
                                axis=("node", "device"))
    batch = next(iter(loader))
    input_nodes = np.asarray(batch.sample.input_nodes)

    harr = HierarchicalDistArray.from_array(x, mesh)
    ids = jnp.asarray(input_nodes, jnp.int32)
    rows, dcn = harr.gather_with_stats(ids)
    dcn = np.asarray(dcn)

    # flat exchange would ship every (device, remote id) request:
    world, d = 8, 4
    per_dev = np.asarray(ids).reshape(world, -1)
    book = harr.book
    flat_volume = np.zeros(world, np.int64)
    for r in range(world):
        mine = per_dev[r]
        mine = mine[mine >= 0]
        owner = book.owner_of_np(mine)
        flat_volume[r] = int(np.sum((owner // d) != (r // d)))
    assert np.all(dcn <= flat_volume)
    assert dcn.sum() < flat_volume.sum()  # dedup actually saves volume
    # and the rows themselves are right
    got = np.asarray(rows)
    want = np.where((np.asarray(ids) >= 0)[:, None],
                    x[np.maximum(np.asarray(ids), 0)], 0)
    assert np.allclose(got, want)
