"""OGB node-classification accuracy harness over converted shard files.

ref python/cugraph-pyg/cugraph_pyg/examples/gcn_dist_sg.py /
pylibwholegraph/examples/node_classification.py — the end-to-end
accuracy-parity run: load the ogbn_convert.py output, train GraphSAGE
through the loader pipeline, report train/valid/test accuracy per
epoch.  Runs unchanged on real OGB output the moment datasets are
available (zero-egress here); --dir may point at a --synthetic convert
for CI.

Usage:
    python examples/ogbn_convert.py --dataset ogbn-arxiv --out /data/arxiv
    python examples/ogbn_train.py --dir /data/arxiv --epochs 10
"""

import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    from cugraph_gnn_tpu.utils.config import (
        add_model_options,
        add_sampler_options,
        add_training_options,
        make_parser,
    )
    p = make_parser(add_training_options, add_model_options,
                    add_sampler_options)
    p.add_argument("--dir", required=True,
                   help="output directory of ogbn_convert.py")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader
    from cugraph_gnn_tpu.models import GraphSAGE

    with open(os.path.join(args.dir, "meta.json")) as fh:
        meta = json.load(fh)
    n, f = meta["num_nodes"], meta["feat_dim"]
    feat = np.concatenate([
        np.fromfile(os.path.join(args.dir, fn),
                    np.float32).reshape(-1, f)
        for fn in meta["feat_files"]])
    assert feat.shape[0] == n
    labels = np.fromfile(os.path.join(args.dir, "labels.bin"), np.int32)
    src = np.fromfile(os.path.join(args.dir, "edges_src.bin"), np.int32)
    dst = np.fromfile(os.path.join(args.dir, "edges_dst.bin"), np.int32)
    splits = {
        name: np.fromfile(os.path.join(args.dir, f"{name}_idx.bin"),
                          np.int64)
        for name in ("train", "valid", "test")
        if os.path.exists(os.path.join(args.dir, f"{name}_idx.bin"))
    }

    gs = GraphStore()
    # symmetrize (OGB products/arxiv are used undirected, ref
    # gcn_dist_sg.py to_undirected)
    gs.put_edge_index((np.concatenate([src, dst]),
                       np.concatenate([dst, src])),
                      ("", "to", ""), num_nodes=(n, n))
    fs = FeatureStore(pad_features_to=128)
    fs[("", "x")] = feat
    fs[("", "y")] = labels

    fanouts = [int(x) for x in args.neighbors.split(",")]
    model = GraphSAGE(hidden_features=args.hidden_dim,
                      out_features=meta["num_classes"],
                      num_layers=len(fanouts))

    def make_loader(idx, shuffle):
        return NeighborLoader((fs, gs), num_neighbors=fanouts,
                              input_nodes=idx, batch_size=args.batch_size,
                              shuffle=shuffle, dedup=False)

    train_loader = make_loader(splits["train"], True)
    b0 = next(iter(train_loader))
    params = model.init(jax.random.PRNGKey(0), b0.x, b0.sample)
    tx = optax.adam(args.lr)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, opt, x, sample, y, seeds):
        def loss_fn(p):
            logits = model.apply(p, x, sample)
            valid = seeds >= 0
            ls = optax.softmax_cross_entropy_with_integer_labels(logits, y)
            return jnp.sum(jnp.where(valid, ls, 0)) / jnp.maximum(
                jnp.sum(valid), 1)
        loss, grads = jax.value_and_grad(loss_fn)(params)
        u, opt = tx.update(grads, opt)
        return optax.apply_updates(params, u), opt, loss

    @jax.jit
    def eval_step(params, x, sample, y, seeds):
        logits = model.apply(params, x, sample)
        valid = seeds >= 0
        hit = (jnp.argmax(logits, -1) == y) & valid
        return jnp.sum(hit), jnp.sum(valid)

    def accuracy(idx):
        loader = make_loader(idx, False)
        c = v = 0
        for b in loader:
            ci, vi = eval_step(params, b.x, b.sample, b.y, b.seeds)
            c += int(ci)
            v += int(vi)
        return c / max(v, 1)

    for epoch in range(args.epochs):
        tot = k = 0.0
        for b in train_loader:
            params, opt, loss = train_step(params, opt, b.x, b.sample,
                                           b.y, b.seeds)
            tot += float(loss)
            k += 1
        msg = f"epoch {epoch}: loss {tot / max(k, 1):.4f}"
        for name in ("valid", "test"):
            if name in splits:
                msg += f" {name}_acc {accuracy(splits[name]):.4f}"
        print(msg)


if __name__ == "__main__":
    main()
