"""Worker for the multi-process MG test tier: N real OS processes x
M CPU devices each, coordinated via jax.distributed — the analog of the
reference's forked multi-GPU test runner (ref cpp/src/parallel_utils.cpp:35-79,
pylibwholegraph/utils/multiprocess.py:7-29, test_*_mg.py).

Exercises the host-boundary paths a single-process virtual mesh cannot:
jax.distributed init, per-process shard materialisation
(make_array_from_callback), cross-process collectives inside shard_map.

Run as: python tests/mp_worker.py <process_id> <num_processes> <port>
Prints "MP_OK" on success.
"""

import sys


def main():
    pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), int(sys.argv[3])
    local_devices = 4

    import jax
    # config-level settings beat the axon sitecustomize env override;
    # must run before any backend use
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", local_devices)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=nproc, process_id=pid)

    import jax.numpy as jnp
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cugraph_gnn_tpu.sampler.dist_sampler import (
        DistGraph,
        DistNeighborSampler,
    )
    from cugraph_gnn_tpu.store.dist_array import DistArray, put_global
    from cugraph_gnn_tpu.ops.csr import coo_to_csr_np

    world = nproc * local_devices
    assert jax.process_count() == nproc
    assert len(jax.devices()) == world

    mesh = Mesh(np.asarray(jax.devices()), ("store",))

    # identical host-side data on every process (same seed) — the SPMD
    # contract of multi-controller JAX
    rng = np.random.default_rng(0)
    n, e, f = 128, 1600, 8
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    indptr, indices = np.asarray(indptr), np.asarray(indices)
    feats = rng.standard_normal((n, f)).astype(np.float32)

    # 1) distributed feature gather across the process boundary
    arr = DistArray.from_array(feats, mesh)
    ids_host = (np.arange(world * 8) * 7) % n
    ids = put_global(ids_host.astype(np.int32),
                     NamedSharding(mesh, P("store")))
    out = arr.gather(ids)
    for shard in out.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data)
        want = feats[ids_host[lo:lo + got.shape[0]]]
        np.testing.assert_allclose(got, want, rtol=1e-6)

    # 2) distributed scatter-add round trip (ids are distinct: stride 7
    #    is coprime with n=128, and only 64 ids are drawn)
    vals = put_global(np.ones((world * 8, f), np.float32),
                      NamedSharding(mesh, P("store")))
    arr.scatter_add(ids, vals)
    out2 = arr.gather(ids)
    for shard in out2.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data)
        want = feats[ids_host[lo:lo + got.shape[0]]] + 1.0
        np.testing.assert_allclose(got, want, rtol=1e-6)

    # 3) distributed sampling: seed routing + sample + route back, with
    #    a psum'd level count (cross-process collective)
    g = DistGraph.from_global_csr(indptr, indices, mesh)
    sampler = DistNeighborSampler(g, [4, 4], dedup=True)
    seeds_host = np.arange(world * 4, dtype=np.int32) % n
    seeds = put_global(seeds_host, NamedSharding(mesh, P("store")))
    batch = sampler.sample(jax.random.PRNGKey(1), seeds)
    assert int(batch.seed_count) == world * 4
    # hop-0 neighbors are true in-neighbors (checked on local shards)
    ng = batch.hops[0].neigh_global
    eid = batch.hops[0].edge_ids
    per = seeds_host.shape[0] // world
    for sh_n, sh_e in zip(ng.addressable_shards, eid.addressable_shards):
        lo = sh_n.index[0].start or 0
        nbrs = np.asarray(sh_n.data)
        eids = np.asarray(sh_e.data)
        for i in range(nbrs.shape[0]):
            s = seeds_host[lo + i]
            for nb, e_ in zip(nbrs[i], eids[i]):
                if nb < 0:
                    continue
                assert indptr[s] <= e_ < indptr[s + 1]
                assert indices[e_] == nb

    # 4) distributed full-batch slab SpMM + fused attention across the
    #    process boundary (halo ppermute crosses processes; fallback
    #    edges ride the a2a gather), vs host segment references
    from cugraph_gnn_tpu.ops.dist_full_batch import DistFullBatchGraph

    nb_nodes = 256
    band = 20
    deg = 4
    fsrc = np.clip(np.repeat(np.arange(nb_nodes), deg)
                   + rng.integers(-band, band + 1, nb_nodes * deg),
                   0, nb_nodes - 1)
    # a few far edges exercise the fallback exchange
    fsrc[::37] = rng.integers(0, nb_nodes, len(fsrc[::37]))
    fdst = np.repeat(np.arange(nb_nodes), deg)
    fb = DistFullBatchGraph.from_coo(fsrc, fdst, nb_nodes, mesh,
                                     reorder="none", block_rows=32)
    x = rng.standard_normal((nb_nodes, f)).astype(np.float32)
    out = fb.spmm(fb.shard(x), reduce="sum")

    want = np.zeros((nb_nodes, f), np.float32)
    np.add.at(want, fdst, x[fsrc])
    for shard in out.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data)
        ref = np.zeros_like(got)
        n_rows = max(0, min(got.shape[0], nb_nodes - lo))
        if n_rows > 0:
            ref[:n_rows] = want[lo:lo + n_rows]
        np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-4)

    a_d = rng.standard_normal(nb_nodes).astype(np.float32)
    a_s = rng.standard_normal(nb_nodes).astype(np.float32)
    att = fb.attention_spmm(fb.shard(x), fb.shard(a_d), fb.shard(a_s))
    z = a_d[fdst] + a_s[fsrc]
    e_ref = np.where(z >= 0, z, 0.2 * z)
    m_ref = np.full(nb_nodes, -np.inf)
    np.maximum.at(m_ref, fdst, e_ref)
    m_ref = np.where(np.isfinite(m_ref), m_ref, 0.0)
    p_ref = np.exp(e_ref - m_ref[fdst])
    s_ref = np.zeros(nb_nodes)
    np.add.at(s_ref, fdst, p_ref)
    u_ref = np.zeros((nb_nodes, f))
    np.add.at(u_ref, fdst, p_ref[:, None] * x[fsrc])
    want_att = (u_ref / np.maximum(s_ref, 1e-16)[:, None]).astype(
        np.float32)
    for shard in att.addressable_shards:
        lo = shard.index[0].start or 0
        got = np.asarray(shard.data)
        ref = np.zeros_like(got)
        n_rows = max(0, min(got.shape[0], nb_nodes - lo))
        if n_rows > 0:
            ref[:n_rows] = want_att[lo:lo + n_rows]
        np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    # 5) rank-local graph construction (VERDICT r2 #2): each process
    #    passes ONLY its own edge slice; sampled batches must match the
    #    global-CSR build of the concatenated COO bit-exactly
    e2 = 1200
    src_all = rng.integers(0, n, e2)
    dst_all = rng.integers(0, n, e2)
    halves = np.array_split(np.arange(e2), nproc)
    mine = halves[jax.process_index()]
    g_local = DistGraph.from_local_coo(
        src_all[mine], dst_all[mine], n, mesh, chunk=256)
    from cugraph_gnn_tpu.native import build_csr
    ip2, ix2, _perm2 = build_csr(dst_all.astype(np.int64),
                                 src_all.astype(np.int64), n)
    g_ref = DistGraph.from_global_csr(np.asarray(ip2), np.asarray(ix2),
                                      mesh)
    assert np.array_equal(g_local.book.offsets, g_ref.book.offsets)
    sA = DistNeighborSampler(g_local, [4, 4])
    sB = DistNeighborSampler(g_ref, [4, 4])
    seeds2 = put_global((np.arange(world * 4, dtype=np.int32) * 3) % n,
                        NamedSharding(mesh, P("store")))
    bA = sA.sample(jax.random.PRNGKey(2), seeds2)
    bB = sB.sample(jax.random.PRNGKey(2), seeds2)
    for h in range(2):
        for fld in ("neigh_global", "edge_ids", "neigh_local"):
            a = getattr(bA.hops[h], fld)
            bb = getattr(bB.hops[h], fld)
            for shA, shB in zip(a.addressable_shards,
                                bb.addressable_shards):
                assert np.array_equal(np.asarray(shA.data),
                                      np.asarray(shB.data)), (h, fld)

    print("MP_OK", flush=True)


if __name__ == "__main__":
    main()
