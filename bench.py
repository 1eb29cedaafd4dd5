"""Benchmark: sampled edges/s/chip through the full training pipeline
(sample -> feature gather -> GraphSAGE fwd/bwd -> update) on an
ogbn-products-scale synthetic graph, run on the real TPU chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}
(extra keys: per-stage ms, run-to-run spread, fixed-seed-set epoch_s —
VERDICT r4 #1/#2).

The reference publishes no numbers (BASELINE.md); vs_baseline is
measured against the round-1 pinned value below so later rounds show
relative progress.

Round-5 step structure (benchmarks/gather_wall.py, batch_ramp_probe.py):

- REPS steps' sampling runs as ONE flattened frontier per hop
  (multihop_uniform_batched) — the neighbor-id window gather is
  row-rate bound with a per-op ramp, and a 10x batch lifts the sample
  stage 1.35x.  This is loader-style prefetching: features/topology are
  read-only, so sampling ahead of the model steps changes nothing
  (the reference's loader likewise samples call-groups ahead of
  training, ref cugraph_pyg/sampler/distributed_sampler.py:279-343).
- The feature table is stored f32 (512B rows): the XLA row gather is
  row-RATE bound, not byte bound — f32 gathers 155M rows/s vs bf16's
  110M at this batch size (bf16 256B rows waste half of every 512B HBM
  line).  Rows cast to bf16 AFTER the gather for the model.
- Model steps stay a sequential lax.scan (param updates chain).
"""

import json
import sys
import time

import numpy as np


def log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)

# Round-1 pinned reference point: end-of-round-1 measurement on one TPU
# v5e chip with dependency-forced timing (7.85 ms/iter full GraphSAGE
# train step = 15.65M sampled edges/s).  Later rounds' vs_baseline
# shows progress relative to this.  Kept across the round-2 switch to a
# power-law degree graph (below) so the trend stays comparable.
BASELINE_EDGES_PER_S = 1.565e7

# ogbn-products scale: 2.45M nodes, ~122M directed edges.  Round 2:
# degrees follow a Pareto-ish power law (deg = clip(floor(25 u^-0.5),
# 1, 17000) -> mean ~46, max ~17k, like products' skew) instead of the
# round-1 constant degree 50 — the skewed tail stresses Floyd's
# small-degree path and the hybrid window/per-entry neighbor-id gather.
NUM_NODES = 2_449_029
DEG_SCALE = 25.0
DEG_ALPHA = -0.5
DEG_CAP = 17_000
# products features are 100-dim; pad to the 128 TPU lane width — row
# gather on unaligned widths is ~4x slower (measured 4.7ms -> 1.1ms for
# the batch gather).  The loader exposes the same knob (pad_features).
FEAT_DIM = 128
HIDDEN = 256
CLASSES = 47
BATCH = 1024
FANOUTS = (10, 10)
WARMUP = 3
ITERS = 200
# ogbn-products train split is 196,615 nodes; at batch 1024 that is 192
# steps.  The epoch measurement runs exactly EPOCH_STEPS steps over a
# fixed shuffled permutation of a 196,608-node "train split" (the
# nearest REPS multiple), mirroring the reference example's epoch loop
# timing (ref cugraph_pyg/examples/gcn_dist_mnmg.py:222-252).
TRAIN_SPLIT = 196_608
EPOCH_STEPS = TRAIN_SPLIT // BATCH  # 192


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GraphSAGE

    log(f"backend={jax.default_backend()} devices={jax.devices()}")

    from cugraph_gnn_tpu.sampler.neighbor_sampler import (
        multihop_uniform_batched,
    )

    # Power-law degrees are drawn on the HOST (cheap, and the edge count
    # must be static for jit); the big arrays (indices, features) are
    # generated ON DEVICE — the host->device tunnel collapses to ~MB/s
    # on GB-size transfers.  Only the 9.8MB indptr is uploaded.
    t = time.perf_counter()
    host_rng = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host_rng.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    from cugraph_gnn_tpu.ops.window_gather import (
        hub_fraction,
        hub_fraction_edgewise,
    )
    # static stats -> hub buffer sizes: hop-0 seeds are uniform
    # (row-wise fraction), deeper frontiers are degree-biased
    # (edge-wise fraction)
    hub_frac = (hub_fraction(indptr_np), hub_fraction_edgewise(indptr_np))
    num_edges = int(indptr_np[-1])
    # pad the edge array to a 512B-line multiple for the window gather
    num_edges_pad = -(-num_edges // 128) * 128
    indptr_j = jnp.asarray(indptr_np)

    @jax.jit
    def make_data(indptr):
        # neighbor ids drawn PROPORTIONAL TO DEGREE (pick a random edge
        # slot, take its owning row): a symmetrized power-law graph has
        # matching in-degree skew, so sampled frontiers concentrate on
        # hubs — the realistic access pattern (uniform targets would
        # flatter nothing but hide hub-induced duplication).  indptr is
        # an ARGUMENT (a closure would embed it as an XLA constant).
        slot = jax.random.randint(
            jax.random.PRNGKey(0), (num_edges_pad,), 0, num_edges,
            jnp.int32)
        indices = (jnp.searchsorted(indptr, slot, side="right") - 1
                   ).astype(jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.float32)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indices, feats, labels

    indices_j, feats, labels = jax.block_until_ready(make_data(indptr_j))
    log(f"device data ready in {time.perf_counter()-t:.1f}s "
        f"({num_edges} edges, mean deg {num_edges/NUM_NODES:.1f}, "
        f"max deg {max_degree})")

    # bf16 activations (f32 params/optimizer): standard TPU training
    # precision — features cast to bf16 after the f32-row gather.
    model = GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                      num_layers=len(FANOUTS), dtype=jnp.bfloat16)

    # REPS training steps per dispatch: one fused sampling pass (the
    # flattened frontier) + a scan of REPS model steps.  Also amortizes
    # the axon tunnel's ~0.25-0.4 ms per-dispatch latency.
    REPS = 10

    def sample_block(key, indptr, indices):
        """REPS steps' seeds + fused multihop sample."""
        sk, pk = jax.random.split(key)
        seeds = jax.random.randint(pk, (REPS, BATCH), 0, NUM_NODES,
                                   jnp.int32)
        sample = multihop_uniform_batched(
            sk, indptr, indices, seeds, FANOUTS,
            indices2d=indices.reshape(-1, 128), max_degree=max_degree,
            hub_frac=hub_frac)
        return seeds, sample

    tx = optax.adam(1e-3)

    def gather_features(sample, feats):
        """REPS feature gathers as UNROLLED independent top-level ops:
        inside lax.scan the same gather costs ~1.07 ms/step, unrolled
        ~0.85 (XLA pipelines independent gathers; scan iterations
        serialize).  clip-only, NO where-mask: the mask epilogue costs
        a separate HBM pass (+0.4 ms, benchmarks/gather_ids_probe.py)
        and is redundant — -1 slots read row 0, and every consumer
        masks with hop.mask / the loss's seed validity (MultihopBatch
        contract: "-1 slots carry garbage rows, mask with mask")."""
        inp = sample.levels[-1]  # (REPS, N_in)
        return jnp.stack([
            feats[jnp.clip(inp[i], 0)].astype(jnp.bfloat16)
            for i in range(inp.shape[0])])

    def model_scan(params, opt_state, seeds, sample, x_all, labels):
        """Sequential REPS-step train scan over the batched sample."""
        ys = labels[jnp.clip(seeds, 0)]

        def step(carry, xs):
            params, opt_state = carry
            s, y, seed_row, x = xs

            def loss_fn(p):
                logits = model.apply(p, x, s).astype(jnp.float32)
                valid = seed_row >= 0
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                    jnp.sum(valid), 1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state2 = tx.update(grads, opt_state)
            params2 = optax.apply_updates(params, updates)
            return (params2, opt_state2), loss

        (params, opt_state), losses = jax.lax.scan(
            step, (params, opt_state), (sample, ys, seeds, x_all))
        return params, opt_state, losses[-1]

    @jax.jit
    def train_block(params, opt_state, edge_total, key, indptr, indices,
                    feats, labels):
        seeds, sample = sample_block(key, indptr, indices)
        edges = sum(jnp.sum(h.mask) for h in sample.hops)
        x_all = gather_features(sample, feats)
        params, opt_state, loss = model_scan(
            params, opt_state, seeds, sample, x_all, labels)
        return params, opt_state, edge_total + edges.astype(jnp.int32), loss

    # --- init ---------------------------------------------------------
    t = time.perf_counter()
    key = jax.random.PRNGKey(2)
    _, sample0 = jax.jit(sample_block)(key, indptr_j, indices_j)
    s0 = jax.tree_util.tree_map(lambda a: a[0], sample0)
    x0 = feats[jnp.clip(s0.input_nodes, 0)]
    params = model.init(jax.random.PRNGKey(1), x0, s0)
    opt_state = tx.init(params)
    log(f"model init in {time.perf_counter()-t:.1f}s")

    edge_total = jnp.zeros((), jnp.int32)
    for i in range(WARMUP):
        key, sk = jax.random.split(key)
        params, opt_state, edge_total, loss = train_block(
            params, opt_state, edge_total, sk, indptr_j, indices_j,
            feats, labels)
    jax.block_until_ready(params)
    log("warmup done")

    # Timing: `block_until_ready` does NOT reliably wait through the
    # axon tunnel, and a scalar readback has a large fixed cost.
    # Measure by iteration-count differencing: run loops of 1 and
    # NB+1 scan-blocks, each ended by a *dependent* readback (the
    # edge-count accumulator threads through every step), and subtract.
    def run(nblocks, params, opt_state):
        nonlocal key
        edge_total = jnp.zeros((), jnp.int32)
        for i in range(nblocks):
            key, sk = jax.random.split(key)
            params, opt_state, edge_total, loss = train_block(
                params, opt_state, edge_total, sk, indptr_j, indices_j,
                feats, labels)
        return int(edge_total), params, opt_state

    NB = ITERS // REPS
    _, params, opt_state = run(1, params, opt_state)  # warm

    def one_measurement():
        nonlocal params, opt_state
        t0 = time.perf_counter()
        _, params, opt_state = run(1, params, opt_state)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        total_edges, params2, opt_state2 = run(NB + 1, params, opt_state)
        params, opt_state = params2, opt_state2
        t_big = time.perf_counter() - t0
        dt = max(t_big - t_small, 1e-9)
        return dt, total_edges * NB // (NB + 1)

    # Run-to-run spread (VERDICT r4 #1: make 2.60-vs-2.70 diagnosable).
    runs = []
    for r in range(3):
        dt, total_edges = one_measurement()
        runs.append((dt, total_edges))
        log(f"run {r}: {1e3*dt/ITERS:.3f} ms/iter")
    runs_ms = sorted(1e3 * dt / ITERS for dt, _ in runs)
    dt, total_edges = sorted(runs, key=lambda x: x[0])[len(runs) // 2]
    edges_per_s = total_edges / dt
    ms_total = 1e3 * dt / ITERS
    log(f"median {ms_total:.2f} ms/iter "
        f"(spread {runs_ms[0]:.2f}-{runs_ms[-1]:.2f})")

    # --- per-stage breakdown (sample / +feature gather / model) ---
    # Same differencing discipline; regressions become attributable to
    # a stage instead of hiding in the total (VERDICT r2 #8).
    import os
    stages = {}
    if os.environ.get("BENCH_STAGES", "1") != "0":
        def _sample_block(acc, key, indptr, indices, feats):
            _, s = sample_block(key, indptr, indices)
            return acc + jnp.sum(s.levels[-1]).astype(jnp.int32)

        def _sg_block(acc, key, indptr, indices, feats):
            _, sample = sample_block(key, indptr, indices)
            x_all = gather_features(sample, feats)
            return acc + jnp.sum(
                x_all.astype(jnp.float32)).astype(jnp.int32)

        def time_block(blk):
            nonlocal key
            blk = jax.jit(blk)
            acc = jnp.zeros((), jnp.int32)
            key, sk = jax.random.split(key)
            int(blk(acc, sk, indptr_j, indices_j, feats))  # compile+warm
            def loop(n):
                nonlocal key
                a = jnp.zeros((), jnp.int32)
                for _ in range(n):
                    key, sk2 = jax.random.split(key)
                    a = blk(a, sk2, indptr_j, indices_j, feats)
                return int(a)
            loop(1)
            t0 = time.perf_counter()
            loop(1)
            small = time.perf_counter() - t0
            t0 = time.perf_counter()
            loop(NB + 1)
            return max(time.perf_counter() - t0 - small, 1e-9) \
                / (NB * REPS) * 1e3

        ms_sample = time_block(_sample_block)
        ms_sg = time_block(_sg_block)

        # Direct model-stage measurement (VERDICT r4 weak #7: a
        # residual hides model regressions in dispatch noise): time
        # model_scan alone over ONE fixed presampled block — the
        # params chain through the scan, so iterations are
        # data-dependent and unhoistable.
        key, sk = jax.random.split(key)
        seeds_f, sample_f = jax.jit(sample_block)(sk, indptr_j, indices_j)
        x_f = jax.jit(gather_features)(sample_f, feats)

        @jax.jit
        def _model_block(params, opt_state, seeds, sample, x_all, labels):
            return model_scan(params, opt_state, seeds, sample, x_all,
                              labels)

        p_m, o_m, _ = jax.block_until_ready(
            _model_block(params, opt_state, seeds_f, sample_f, x_f,
                         labels))

        def model_loop(n, p, o):
            loss = None
            for _ in range(n):
                p, o, loss = _model_block(p, o, seeds_f, sample_f, x_f,
                                          labels)
            return float(loss), p, o

        _, p_m, o_m = model_loop(1, p_m, o_m)
        t0 = time.perf_counter()
        _, p_m, o_m = model_loop(1, p_m, o_m)
        small = time.perf_counter() - t0
        t0 = time.perf_counter()
        model_loop(NB + 1, p_m, o_m)
        ms_model = max(time.perf_counter() - t0 - small, 1e-9) \
            / (NB * REPS) * 1e3

        stages = {
            "sample_ms": round(ms_sample, 3),
            "feature_gather_ms": round(max(ms_sg - ms_sample, 0), 3),
            "model_ms": round(ms_model, 3),
            "overlap_residual_ms": round(ms_total - ms_sg - ms_model, 3),
        }
        log(f"stage split: sample {ms_sample:.2f} ms, "
            f"+feature gather {max(ms_sg - ms_sample, 0):.2f} ms, "
            f"model (direct) {ms_model:.2f} ms, overlap residual "
            f"{ms_total - ms_sg - ms_model:+.2f} ms "
            f"(total {ms_total:.2f} ms)")

    # --- fixed-seed-set epoch time (BASELINE's other half) ------------
    # One epoch = EPOCH_STEPS steps over a fixed shuffled permutation of
    # the synthetic train split, seeds sliced per block from the
    # permutation ON DEVICE.
    epoch_s = None
    if os.environ.get("BENCH_EPOCH", "1") != "0":
        perm = jax.random.permutation(
            jax.random.PRNGKey(9),
            jnp.arange(TRAIN_SPLIT, dtype=jnp.int32))

        @jax.jit
        def epoch_block(params, opt_state, edge_total, block_ix, key,
                        perm, indptr, indices, feats, labels):
            seeds = jax.lax.dynamic_slice(
                perm, (block_ix * REPS * BATCH,), (REPS * BATCH,)
            ).reshape(REPS, BATCH)
            sample = multihop_uniform_batched(
                key, indptr, indices, seeds, FANOUTS,
                indices2d=indices.reshape(-1, 128),
                max_degree=max_degree, hub_frac=hub_frac)
            edges = sum(jnp.sum(h.mask) for h in sample.hops)
            x_all = gather_features(sample, feats)
            params, opt_state, loss = model_scan(
                params, opt_state, seeds, sample, x_all, labels)
            return (params, opt_state,
                    edge_total + edges.astype(jnp.int32), loss)

        def epoch(params, opt_state):
            nonlocal key
            edge_total = jnp.zeros((), jnp.int32)
            for b in range(EPOCH_STEPS // REPS):
                key, sk = jax.random.split(key)
                params, opt_state, edge_total, loss = epoch_block(
                    params, opt_state, edge_total, b, sk, perm,
                    indptr_j, indices_j, feats, labels)
            return int(edge_total), params, opt_state

        _, params, opt_state = epoch(params, opt_state)  # compile+warm
        t0 = time.perf_counter()
        _, params, opt_state = epoch(params, opt_state)
        epoch_s = time.perf_counter() - t0
        log(f"epoch ({EPOCH_STEPS} steps over {TRAIN_SPLIT} fixed seeds): "
            f"{epoch_s:.3f}s")

    out = {
        "metric": "sampled_edges_per_s_per_chip",
        "value": round(edges_per_s, 1),
        "unit": "edges/s",
        "vs_baseline": round(edges_per_s / BASELINE_EDGES_PER_S, 4),
        "ms_per_iter": round(ms_total, 3),
        "runs_ms_per_iter": [round(m, 3) for m in runs_ms],
        "stages": stages,
    }
    if epoch_s is not None:
        out["epoch_s"] = round(epoch_s, 3)
        out["epoch_steps"] = EPOCH_STEPS
    print(json.dumps(out))


if __name__ == "__main__":
    main()
