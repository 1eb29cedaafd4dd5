"""Per-model training-step benchmarks — BASELINE configs 2/3/4 shapes
(VERDICT r4 #2: committed perf artifacts for GAT and hetero R-GCN).

Part A (homogeneous, ogbn-products scale): GraphSAGE / GCN / 4-head GAT
full train steps through the round-5 sampled pipeline (fused multi-step
sampling, unrolled f32 feature gathers, model scan) — same graph and
timing discipline as bench.py.

Part B (heterogeneous, ogbn-mag scale): 2-layer R-GCN through the
hetero sampled path (paper/author/field node types; per-edge-type
fanouts; per-hop append-unique dedup — the hetero product path), the
shape of BASELINE config 4.  Ref loop mirrored:
/root/reference/python/cugraph-pyg/cugraph_pyg/examples/rgcn_link_class_mnmg.py
and taobao_mnmg.py (hetero minibatch training).

Writes one JSON line per config and (with --out) a combined artifact.

Usage:  timeout 580 python benchmarks/model_bench.py [--part a|b|all]
                                                     [--out FILE]
"""

import argparse
import json
import sys
import time

sys.path.insert(0, ".")

import numpy as np

from bench import (  # noqa: E402
    BATCH,
    CLASSES,
    DEG_ALPHA,
    DEG_CAP,
    DEG_SCALE,
    FANOUTS,
    FEAT_DIM,
    HIDDEN,
    NUM_NODES,
)

ITERS = 100
REPS = 10


def log(m):
    print(f"[mbench] {m}", file=sys.stderr, flush=True)


def diff_timed(run_block, iters, nruns=2):
    """Iteration-count differencing (see bench.py): run_block(nblocks)
    must thread a device accumulator through every step and read it
    back once.  Returns (ms_per_iter list, best)."""
    out = []
    nb = max(iters // REPS, 2)
    run_block(1)  # warm
    for _ in range(nruns):
        t0 = time.perf_counter()
        run_block(1)
        small = time.perf_counter() - t0
        t0 = time.perf_counter()
        run_block(nb + 1)
        big = time.perf_counter() - t0
        out.append(max(big - small, 1e-9) / (nb * REPS) * 1e3)
    return sorted(out)


def part_a(results):
    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import GAT, GCN, GraphSAGE
    from cugraph_gnn_tpu.ops.window_gather import (
        hub_fraction,
        hub_fraction_edgewise,
    )
    from cugraph_gnn_tpu.sampler.neighbor_sampler import (
        multihop_uniform_batched,
    )

    host = np.random.default_rng(0)
    deg = np.minimum(
        np.floor(DEG_SCALE * host.random(NUM_NODES) ** DEG_ALPHA),
        DEG_CAP).astype(np.int64)
    max_degree = int(deg.max())
    indptr_np = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    hub_frac = (hub_fraction(indptr_np), hub_fraction_edgewise(indptr_np))
    num_edges = int(indptr_np[-1])
    nep = -(-num_edges // 128) * 128
    ip = jnp.asarray(indptr_np)

    @jax.jit
    def make_data(indptr):
        slot = jax.random.randint(
            jax.random.PRNGKey(0), (nep,), 0, num_edges, jnp.int32)
        indices = (jnp.searchsorted(indptr, slot, side="right") - 1
                   ).astype(jnp.int32)
        feats = jax.random.normal(
            jax.random.PRNGKey(1), (NUM_NODES, FEAT_DIM), jnp.float32)
        labels = jax.random.randint(
            jax.random.PRNGKey(2), (NUM_NODES,), 0, CLASSES, jnp.int32)
        return indices, feats, labels

    ix, feats, labels = jax.block_until_ready(make_data(ip))
    log("products-scale data ready")

    def sample_block(key, indptr, indices):
        sk, pk = jax.random.split(key)
        seeds = jax.random.randint(pk, (REPS, BATCH), 0, NUM_NODES,
                                   jnp.int32)
        sample = multihop_uniform_batched(
            sk, indptr, indices, seeds, FANOUTS,
            indices2d=indices.reshape(-1, 128), max_degree=max_degree,
            hub_frac=hub_frac)
        return seeds, sample

    models = {
        "graphsage": GraphSAGE(hidden_features=HIDDEN, out_features=CLASSES,
                               num_layers=2, dtype=jnp.bfloat16),
        "gcn": GCN(hidden_features=HIDDEN, out_features=CLASSES,
                   num_layers=2, dtype=jnp.bfloat16),
        "gat4h": GAT(hidden_features=HIDDEN, out_features=CLASSES,
                     num_layers=2, heads=4),
    }

    key0 = jax.random.PRNGKey(0)
    _, sample0 = jax.jit(sample_block)(key0, ip, ix)
    s0 = jax.tree_util.tree_map(lambda a: a[0], sample0)
    x0 = feats[jnp.clip(s0.input_nodes, 0)].astype(jnp.bfloat16)

    for name, model in models.items():
        params = model.init(jax.random.PRNGKey(1), x0, s0)
        tx = optax.adam(1e-3)
        opt = tx.init(params)

        @jax.jit
        def block(params, opt, total, key, ip, ix, feats, labels,
                  model=model, tx=tx):
            seeds, sample = sample_block(key, ip, ix)
            edges = sum(jnp.sum(h.mask) for h in sample.hops)
            inp = sample.levels[-1]
            x_all = jnp.stack([
                feats[jnp.clip(inp[i], 0)].astype(jnp.bfloat16)
                for i in range(REPS)])
            ys = labels[jnp.clip(seeds, 0)]

            def body(carry, xs):
                params, opt = carry
                s, x, y = xs

                def loss_fn(p):
                    logits = model.apply(p, x, s).astype(jnp.float32)
                    return optax.softmax_cross_entropy_with_integer_labels(
                        logits, y).mean()

                loss, grads = jax.value_and_grad(loss_fn)(params)
                u, opt = tx.update(grads, opt)
                return (optax.apply_updates(params, u), opt), None

            (params, opt), _ = jax.lax.scan(
                body, (params, opt), (sample, x_all, ys))
            return params, opt, total + edges.astype(jnp.int32)

        state = {"params": params, "opt": opt, "key": jax.random.PRNGKey(3),
                 "edges": 0}

        def run_block(n, state=state):
            total = None
            for _ in range(n):
                state["key"], sk = jax.random.split(state["key"])
                state["params"], state["opt"], total = block(
                    state["params"], state["opt"],
                    jnp.zeros((), jnp.int32) if total is None else total,
                    sk, ip, ix, feats, labels)
            state["edges"] = int(total)  # dependent readback

        runs = diff_timed(run_block, ITERS)
        edges_per_iter = state["edges"] / (ITERS // REPS + 1) / REPS
        ms = runs[0]
        rec = {
            "config": f"products_{name}",
            "model": name,
            "ms_per_iter": round(ms, 3),
            "runs_ms_per_iter": [round(m, 3) for m in runs],
            "sampled_edges_per_s": round(edges_per_iter / (ms / 1e3), 1),
            "batch": BATCH, "fanouts": list(FANOUTS),
        }
        results.append(rec)
        print(json.dumps(rec))
        log(f"{name}: {ms:.2f} ms/iter")


# --- Part B: hetero R-GCN at ogbn-mag scale ---------------------------

MAG_PAPER = 736_389
MAG_AUTHOR = 1_134_649
MAG_FIELD = 59_965
MAG_CLASSES = 349
MAG_BATCH = 512
# per-edge-type fanouts, seed-side first (PyG fanout-dict semantics)
MAG_FANOUTS = {
    "paper__cites__paper": [8, 8],
    "author__writes__paper": [8, 8],
    "field__rev_has_topic__paper": [4, 4],
}
# reversed-CSR mean in-degrees per paper, mag-shaped: cites 7.4,
# writes 9.6, topics 10.2 — power-law like part A
MAG_MEAN_DEG = {
    "paper__cites__paper": 7.4,
    "author__writes__paper": 9.6,
    "field__rev_has_topic__paper": 10.2,
}
MAG_SRC_RANGE = {
    "paper__cites__paper": (0, MAG_PAPER),
    "author__writes__paper": (MAG_PAPER, MAG_PAPER + MAG_AUTHOR),
    "field__rev_has_topic__paper": (MAG_PAPER + MAG_AUTHOR,
                                    MAG_PAPER + MAG_AUTHOR + MAG_FIELD),
}


def part_b(results):
    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.models import RGCN
    from cugraph_gnn_tpu.sampler.hetero import hetero_multihop

    n_total = MAG_PAPER + MAG_AUTHOR + MAG_FIELD
    host = np.random.default_rng(1)
    etypes = list(MAG_FANOUTS)
    indptrs = {}
    maxdeg = {}
    nedges = {}
    for en in etypes:
        c = MAG_MEAN_DEG[en] / 2.0
        deg = np.zeros(n_total, np.int64)
        # only paper rows have in-edges under these types
        deg[:MAG_PAPER] = np.minimum(
            np.floor(c * host.random(MAG_PAPER) ** -0.5), 2000)
        indptrs[en] = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
        maxdeg[en] = int(deg.max())
        nedges[en] = int(indptrs[en][-1])
    log(f"mag-scale degrees ready ({sum(nedges.values())} edges)")

    ip_j = {en: jnp.asarray(v) for en, v in indptrs.items()}

    @jax.jit
    def make_data(ips):
        csrs = {}
        for i, en in enumerate(etypes):
            lo, hi = MAG_SRC_RANGE[en]
            ne = nedges[en]
            nep = -(-ne // 128) * 128
            idx = jax.random.randint(
                jax.random.PRNGKey(10 + i), (nep,), lo, hi, jnp.int32)
            csrs[en] = (ips[en], idx)
        feats = jax.random.normal(
            jax.random.PRNGKey(20), (n_total, FEAT_DIM), jnp.float32)
        labels = jax.random.randint(
            jax.random.PRNGKey(21), (MAG_PAPER,), 0, MAG_CLASSES, jnp.int32)
        return csrs, feats, labels

    csrs, feats, labels = jax.block_until_ready(make_data(ip_j))
    log("mag-scale device data ready")

    growth = [1 + sum(MAG_FANOUTS[en][h] for en in etypes)
              for h in range(2)]
    caps = [MAG_BATCH]
    for g in growth:
        caps.append(caps[-1] * g)
    edge_bases = {}
    base = 0
    for en in etypes:
        edge_bases[en] = base
        base += nedges[en]

    model = RGCN(num_relations=len(etypes), hidden_features=HIDDEN,
                 out_features=MAG_CLASSES, num_layers=2)

    from cugraph_gnn_tpu.sampler.hetero import hetero_multihop_batched

    def sample_block(key, csrs):
        # dedup=False static hetero layout (zero sorts; batch_call
        # reads neighbor activations with free slices) + REPS steps
        # fused into one flattened frontier per hop per etype (the
        # homogeneous bench's multihop_uniform_batched analog —
        # PERF_NOTES round 5)
        sk, pk = jax.random.split(key)
        seeds = jax.random.randint(pk, (REPS, MAG_BATCH), 0, MAG_PAPER,
                                   jnp.int32)
        # typed target segments: each etype expands only the paper
        # positions (PyG hetero semantics) — at this shape the untyped
        # layout wasted ~57% of hop-2 slots on typed-mismatch -1s
        s = hetero_multihop_batched(
            sk, csrs, seeds, etype_names=etypes, fanouts=MAG_FANOUTS,
            edge_bases=edge_bases, max_degrees=maxdeg, caps=caps,
            seed_type="paper",
            dst_types={en: "paper" for en in etypes},
            src_types={"paper__cites__paper": "paper",
                       "author__writes__paper": "author",
                       "field__rev_has_topic__paper": "field"})
        return seeds, s

    tx = optax.adam(1e-3)

    @jax.jit
    def block(params, opt, total, key, csrs, feats, labels):
        seeds, sample = sample_block(key, csrs)
        inp = sample.input_nodes                      # (REPS, N_in)
        # unrolled per-step gathers (XLA pipelines independent
        # gathers; in-scan they serialize — bench.py's finding)
        x_all = jnp.stack([
            feats[jnp.clip(inp[i], 0)].astype(jnp.bfloat16)
            for i in range(REPS)])
        ys = labels[jnp.clip(seeds, 0)]

        def body(carry, xs):
            params, opt = carry
            s, y, seed_row, x = xs

            def loss_fn(p):
                logits = model.apply(p, x, s, etypes,
                                     method=RGCN.batch_call
                                     ).astype(jnp.float32)
                valid = seed_row >= 0
                ls = optax.softmax_cross_entropy_with_integer_labels(
                    logits, y)
                return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                    jnp.sum(valid), 1)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            u, opt = tx.update(grads, opt)
            edges = sum(jnp.sum(b.mask) for b in s.hops[0].values())
            edges += sum(jnp.sum(b.mask) for b in s.hops[1].values())
            return ((optax.apply_updates(params, u), opt),
                    edges.astype(jnp.int32))

        (params, opt), edges = jax.lax.scan(
            body, (params, opt), (sample, ys, seeds, x_all))
        return params, opt, total + jnp.sum(edges)

    _, sb0 = jax.jit(sample_block)(jax.random.PRNGKey(0), csrs)
    s0 = jax.tree_util.tree_map(lambda a: a[0], sb0)
    x0 = feats[jnp.clip(s0.input_nodes, 0)].astype(jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(1), x0, s0, etypes,
                        method=RGCN.batch_call)
    opt = tx.init(params)
    log("rgcn init done")

    state = {"params": params, "opt": opt, "key": jax.random.PRNGKey(3),
             "edges": 0}

    def run_block(n):
        total = None
        for _ in range(n):
            state["key"], sk = jax.random.split(state["key"])
            state["params"], state["opt"], total = block(
                state["params"], state["opt"],
                jnp.zeros((), jnp.int32) if total is None else total,
                sk, csrs, feats, labels)
        state["edges"] = int(total)

    runs = diff_timed(run_block, ITERS)
    ms = runs[0]
    edges_per_iter = state["edges"] / (ITERS // REPS + 1) / REPS
    rec = {
        "config": "mag_rgcn_hetero",
        "model": "rgcn",
        "ms_per_iter": round(ms, 3),
        "runs_ms_per_iter": [round(m, 3) for m in runs],
        "sampled_edges_per_s": round(edges_per_iter / (ms / 1e3), 1),
        "batch": MAG_BATCH,
        "fanouts": MAG_FANOUTS,
        "nodes": {"paper": MAG_PAPER, "author": MAG_AUTHOR,
                  "field": MAG_FIELD},
        "edges": nedges,
    }
    results.append(rec)
    print(json.dumps(rec))
    log(f"rgcn hetero: {ms:.2f} ms/iter")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--part", default="all", choices=["a", "b", "all"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    results = []
    if args.part in ("a", "all"):
        part_a(results)
    if args.part in ("b", "all"):
        part_b(results)
    if args.out:
        with open(args.out, "w") as f:
            json.dump({"round": 5, "harness": "benchmarks/model_bench.py",
                       "device": "TPU v5e (1 chip, axon tunnel)",
                       "results": results}, f, indent=1)
        log(f"wrote {args.out}")


if __name__ == "__main__":
    main()
