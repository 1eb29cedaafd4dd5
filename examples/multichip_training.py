"""Multi-chip training through DistNeighborLoader: the loader IS the
multi-device path — sharded stores, distributed sampling, cross-shard
feature gather, all behind the single-chip loader surface.

ref python/cugraph-pyg/cugraph_pyg/examples/gcn_dist_mnmg.py (the
canonical multi-GPU loop: per-rank store shards, DDP model).  Runs on
any mesh; for a CPU dry run:

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
    p.add_argument("--epochs", type=int, default=2)
    args = p.parse_args()

    import jax
    import jax._src.xla_bridge as _xb
    if not _xb._backends:
        try:
            jax.config.update("jax_platforms", "cpu")
            jax.config.update("jax_num_cpu_devices", args.devices)
        except Exception:
            pass
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import DistNeighborLoader
    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.utils.logging import get_logger, set_log_level

    set_log_level("info")
    log = get_logger()
    mesh = Mesh(np.asarray(jax.devices()[:args.devices]), ("store",))
    rng = np.random.default_rng(0)
    n, e = args.num_nodes, args.num_edges

    gs = GraphStore()
    gs.put_edge_index((rng.integers(0, n, e), rng.integers(0, n, e)),
                      ("N", "e", "N"), num_nodes=(n, n))
    fs = FeatureStore()
    fs[("", "x")] = rng.standard_normal((n, args.feat_dim)).astype(np.float32)
    fs[("", "y")] = rng.integers(0, 8, n).astype(np.int32)

    loader = DistNeighborLoader((fs, gs), [5, 5], mesh=mesh,
                                batch_size=args.batch_size, shuffle=True)
    model = GraphSAGE(hidden_features=64, out_features=8, num_layers=2)
    batch0 = next(iter(loader))
    params = model.init(jax.random.PRNGKey(1), batch0.x, batch0.sample)
    tx = optax.adam(1e-2)
    opt = tx.init(params)

    @jax.jit
    def update(params, opt, batch):
        def loss_fn(p):
            logits = model.apply(p, batch.x, batch.sample)
            valid = batch.seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(
                logits, jnp.clip(batch.y, 0))
            return (jnp.sum(jnp.where(valid, ls, 0))
                    / jnp.maximum(jnp.sum(valid), 1))
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    for epoch in range(args.epochs):
        for step, batch in enumerate(loader):
            params, opt, loss = update(params, opt, batch)
            if step % 4 == 0:
                log.info("epoch %d step %d: loss %.4f",
                         epoch, step, float(loss))
    log.info("done (%d devices, %d nodes, %d edges)", args.devices, n, e)


if __name__ == "__main__":
    main()
