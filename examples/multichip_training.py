"""Multi-chip training over a device mesh: sharded graph + features,
distributed sampling + gather, data-parallel model.

ref python/cugraph-pyg/cugraph_pyg/examples/gcn_dist_mnmg.py (the
canonical multi-GPU loop: per-rank store shards, DDP model) — BASELINE
config 5 shape.  Runs on any mesh; for a CPU dry run:

    python examples/multichip_training.py --devices 8
(forces an 8-virtual-device CPU mesh when no multi-chip TPU is
available; on a real pod slice call utils.distributed.init() first.)
"""

import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    import argparse
    p = argparse.ArgumentParser()
    p.add_argument("--devices", type=int, default=8)
    p.add_argument("--num-nodes", type=int, default=4096)
    p.add_argument("--num-edges", type=int, default=40960)
    p.add_argument("--feat-dim", type=int, default=32)
    p.add_argument("--batch-size", type=int, default=256)
    p.add_argument("--steps", type=int, default=10)
    args = p.parse_args()

    import jax
    import jax._src.xla_bridge as _xb
    if not _xb._backends and jax.default_backend is not None:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except Exception:
            pass
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.native import build_csr
    from cugraph_gnn_tpu.sampler.dist_sampler import (
        DistGraph,
        DistNeighborSampler,
    )
    from cugraph_gnn_tpu.store.dist_array import DistArray, _dist_gather_shard
    from cugraph_gnn_tpu.store.partition import PartitionBook
    from cugraph_gnn_tpu.utils.logging import get_logger, set_log_level

    set_log_level("info")
    log = get_logger()

    n_dev = args.devices
    mesh = Mesh(np.asarray(jax.devices()[:n_dev]), ("store",))
    rng = np.random.default_rng(0)
    n, e, f = args.num_nodes, args.num_edges, args.feat_dim

    # host-side graph build (native CSR), then shard rows over the mesh
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    indptr, indices, _ = build_csr(dst, src, n)   # reversed: rows = dst
    graph = DistGraph.from_global_csr(indptr, indices, mesh)
    sampler = DistNeighborSampler(graph, [5, 5])

    feats = DistArray.from_array(
        rng.standard_normal((n, f)).astype(np.float32), mesh)
    labels = rng.integers(0, 8, n).astype(np.int32)
    book = feats.book

    model = GraphSAGE(hidden_features=64, out_features=8, num_layers=2)
    b = args.batch_size

    # one warm sample to initialize params
    seeds0 = jax.device_put(
        jnp.arange(b, dtype=jnp.int32), NamedSharding(mesh, P("store")))
    s0 = sampler.sample(jax.random.PRNGKey(0), seeds0)
    x0 = feats.gather(s0.input_nodes)
    params = model.init(jax.random.PRNGKey(1), x0, s0)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def update(params, opt, x, sample, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, sample)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return (jnp.sum(jnp.where(valid, ls, 0))
                    / jnp.maximum(jnp.sum(valid), 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    key = jax.random.PRNGKey(2)
    sharding = NamedSharding(mesh, P("store"))
    for step in range(args.steps):
        key, sk, pk = jax.random.split(key, 3)
        seeds = jax.device_put(
            jax.random.randint(pk, (b,), 0, n, jnp.int32), sharding)
        sample = sampler.sample(sk, seeds)
        x = feats.gather(sample.input_nodes)      # cross-shard gather
        y = jnp.asarray(labels)[jnp.clip(sample.levels[0], 0)]
        params, opt, loss = update(params, opt, x, sample, y,
                                   sample.levels[0])
        if step % 2 == 0:
            log.info("step %d: loss %.4f", step, float(loss))
    log.info("done (%d devices, %d nodes, %d edges)", n_dev, n, e)


if __name__ == "__main__":
    main()
