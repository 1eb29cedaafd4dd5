"""Convert an OGB node-property dataset to binary shard files for the
sharded feature store.

ref python/pylibwholegraph/examples/ogbn_papers100m_convert.py:1-105 —
OGB -> per-part binary feature files consumed by from_filelist.

Output layout (consumed by utils/checkpoint.load_filelist and
DistArray.from_array via numpy memmap):

    <out>/node_feat_part_{i}.bin   float32 rows (num_nodes x feat_dim)
    <out>/labels.bin               int32
    <out>/edges_src.bin, edges_dst.bin  int32
    <out>/meta.json

Usage:
    python examples/ogbn_convert.py --dataset ogbn-arxiv --out /data/arxiv
(needs the `ogb` package; this environment has no network, so the
script also supports --synthetic N E F for generating test data.)
"""

import argparse
import json
import os
import sys

sys.path.insert(0, ".")

import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", default="ogbn-arxiv")
    p.add_argument("--out", required=True)
    p.add_argument("--parts", type=int, default=8)
    p.add_argument("--synthetic", nargs=3, type=int, metavar=("N", "E", "F"),
                   help="generate synthetic data instead of OGB download")
    args = p.parse_args()

    os.makedirs(args.out, exist_ok=True)
    if args.synthetic:
        n, e, f = args.synthetic
        rng = np.random.default_rng(0)
        feat = rng.standard_normal((n, f)).astype(np.float32)
        labels = rng.integers(0, 40, n).astype(np.int32)
        src = rng.integers(0, n, e).astype(np.int32)
        dst = rng.integers(0, n, e).astype(np.int32)
        num_classes = 40
        perm = rng.permutation(n)
        splits = {"train": perm[: int(0.6 * n)],
                  "valid": perm[int(0.6 * n): int(0.8 * n)],
                  "test": perm[int(0.8 * n):]}
    else:
        from ogb.nodeproppred import NodePropPredDataset
        dataset = NodePropPredDataset(name=args.dataset)
        graph, label = dataset[0]
        feat = graph["node_feat"].astype(np.float32)
        labels = np.nan_to_num(label.reshape(-1), nan=-1).astype(np.int32)
        src = graph["edge_index"][0].astype(np.int32)
        dst = graph["edge_index"][1].astype(np.int32)
        n, f = feat.shape
        e = len(src)
        num_classes = int(dataset.num_classes)
        splits = dataset.get_idx_split()

    # feature shard files (row-partitioned, even split like the reference)
    bounds = np.linspace(0, n, args.parts + 1).astype(np.int64)
    files = []
    for i in range(args.parts):
        path = os.path.join(args.out, f"node_feat_part_{i}.bin")
        feat[bounds[i]:bounds[i + 1]].tofile(path)
        files.append(os.path.basename(path))
    labels.tofile(os.path.join(args.out, "labels.bin"))
    src.tofile(os.path.join(args.out, "edges_src.bin"))
    dst.tofile(os.path.join(args.out, "edges_dst.bin"))
    for name, idx in splits.items():
        np.asarray(idx).astype(np.int64).tofile(
            os.path.join(args.out, f"{name}_idx.bin"))
    with open(os.path.join(args.out, "meta.json"), "w") as fh:
        json.dump({
            "num_nodes": int(n), "num_edges": int(e), "feat_dim": int(f),
            "num_classes": num_classes, "feat_files": files,
        }, fh)
    print(f"wrote {args.parts} feature shards + edges to {args.out}")


if __name__ == "__main__":
    main()
