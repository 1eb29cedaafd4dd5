"""Weak-scaling bench for the distributed training path.

BASELINE.md asks for >=80% scaling efficiency from 1 chip to N on the
papers100M workload.  This harness measures it for the DistNeighborLoader
end-to-end step (sample -> dedup -> a2a feature gather -> model fwd/bwd
-> psum grads) at constant PER-CHIP work (weak scaling: global batch =
W x per-chip batch, graph/features row-sharded over W devices); perfect
scaling = flat step time as W grows.

On a TPU pod this runs over the real devices.  Without one (this image
exposes a single chip), it runs on a virtual CPU mesh — numbers then
validate the harness and the sharding (collective counts, compile), not
hardware throughput.

    python benchmarks/scaling_bench.py --cpu    # virtual 8-device mesh
    python benchmarks/scaling_bench.py          # real TPU devices

Prints one JSON line per mesh size and a final efficiency summary.
"""

import json
import sys
import time

import numpy as np

NUM_NODES = 200_000
MEAN_DEG = 12
FEAT = 128
CLASSES = 16
PER_CHIP_BATCH = 256
FANOUTS = [10, 10]
ITERS = 8


def log(msg):
    print(f"[scaling] {msg}", file=sys.stderr, flush=True)


def main():
    import jax

    if "--cpu" in sys.argv:
        # must run before any backend initialization (the session
        # sitecustomize presets a TPU platform; config beats env vars)
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", 8)
    import jax.numpy as jnp
    import optax
    from jax.sharding import Mesh

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import DistNeighborLoader
    from cugraph_gnn_tpu.models import GraphSAGE
    from cugraph_gnn_tpu.parallel import STORE_AXIS

    devices = jax.devices()
    sizes = [w for w in (1, 2, 4, 8, 16, 32) if w <= len(devices)]
    log(f"backend={jax.default_backend()} devices={len(devices)} "
        f"mesh sizes={sizes}")

    rng = np.random.default_rng(0)
    e = NUM_NODES * MEAN_DEG
    src = rng.integers(0, NUM_NODES, e).astype(np.int64)
    dst = rng.integers(0, NUM_NODES, e).astype(np.int64)
    x = rng.standard_normal((NUM_NODES, FEAT)).astype(np.float32)
    y = rng.integers(0, CLASSES, NUM_NODES).astype(np.int32)

    gs = GraphStore()
    gs.put_edge_index((src, dst), ("N", "e", "N"),
                      num_nodes=(NUM_NODES, NUM_NODES))
    fs = FeatureStore()
    fs[("", "x")] = x
    fs[("", "y")] = y

    times = {}
    for w in sizes:
        mesh = Mesh(np.array(devices[:w]), (STORE_AXIS,))
        loader = DistNeighborLoader(
            (fs, gs), FANOUTS, mesh=mesh,
            batch_size=PER_CHIP_BATCH * w, shuffle=True, seed=1)
        model = GraphSAGE(hidden_features=128, out_features=CLASSES,
                          num_layers=len(FANOUTS))
        it = iter(loader)
        b0 = next(it)
        params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def update(params, opt, batch, acc):
            def loss_fn(p):
                logits = model.apply(p, batch.x, batch.sample)
                valid = batch.seeds >= 0
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, jnp.clip(batch.y, 0))
                return (jnp.sum(jnp.where(valid, ls, 0))
                        / jnp.maximum(jnp.sum(valid), 1))
            loss, grads = jax.value_and_grad(loss_fn)(params)
            u, opt = tx.update(grads, opt)
            return optax.apply_updates(params, u), opt, acc + loss

        def run(n):
            nonlocal params, opt
            acc = jnp.zeros(())
            it = iter(loader)
            for _ in range(n):
                params, opt, acc = update(params, opt, next(it), acc)
            return float(acc)  # dependent readback

        run(2)  # compile + warm
        t0 = time.perf_counter()
        run(1)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        run(ITERS + 1)
        dt = max(time.perf_counter() - t0 - t_small, 1e-9)
        ms = max(1e3 * dt / ITERS, 1e-6)
        times[w] = ms

        # per-hop a2a id volume + remote feature-row volume of one
        # batch (host accounting — pins comm-volume regressions that
        # virtual-mesh step times cannot)
        book = loader.dist_graph.book
        fbook = (loader.features.book if loader.features is not None
                 else book)
        hop_ids_remote = []
        sample = b0.sample
        per = None
        for lvl in sample.levels[:-1]:
            ids = np.asarray(lvl)
            per = ids.reshape(w, -1)
            remote = 0
            for r in range(w):
                mine = per[r][per[r] >= 0]
                remote += int(np.sum(book.owner_of_np(mine) != r))
            hop_ids_remote.append(remote)
        inp = np.asarray(sample.input_nodes).reshape(w, -1)
        feat_remote = 0
        for r in range(w):
            mine = inp[r][inp[r] >= 0]
            feat_remote += int(np.sum(fbook.owner_of_np(mine) != r))

        print(json.dumps({
            "mesh_size": w, "ms_per_iter": round(ms, 3),
            "global_batch": PER_CHIP_BATCH * w,
            # degenerate timings (oversubscribed virtual mesh) would
            # publish nonsense rates — report null instead
            "edges_per_s": None if ms < 1.0 else round(
                PER_CHIP_BATCH * w * sum(
                    np.prod(FANOUTS[:i + 1]) for i in range(len(FANOUTS))
                ) / (ms * 1e-3), 1),
            "a2a_seed_ids_remote_per_hop": hop_ids_remote,
            "a2a_feature_rows_remote": feat_remote,
        }), flush=True)

    base = times[sizes[0]]
    # On the oversubscribed virtual-CPU mesh the W=1 step time can be
    # degenerate (~0 ms); an efficiency ratio against it is meaningless
    # and reads like a failed >=0.80 gate.  Publish null instead and
    # keep only the comm-volume fields, which are exact either way.
    if base < 1.0:
        print(json.dumps({
            "weak_scaling_efficiency": None,
            "note": "W=1 baseline time degenerate on this backend; "
                    "efficiency omitted (comm volumes above are exact)",
            "target": ">=0.80 at max W on TPU pods"}), flush=True)
    else:
        eff = {w: round(base / times[w], 4) for w in sizes}
        print(json.dumps({"weak_scaling_efficiency": eff,
                          "target": ">=0.80 at max W on TPU pods"}),
              flush=True)


if __name__ == "__main__":
    main()
