"""Dataset helpers: karate club, synthetic graphs, binary converters.

ref: the reference ships datasets/karate.csv (space-separated
"src dst weight" edge list) and an OGB->binary converter
(pylibwholegraph/examples/ogbn_papers100m_convert.py).
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import numpy as np


class Graph(NamedTuple):
    """Host-side COO graph container used for data prep."""

    src: np.ndarray
    dst: np.ndarray
    num_nodes: int
    edge_weight: Optional[np.ndarray] = None

    @property
    def num_edges(self) -> int:
        return len(self.src)


def load_karate(path: Optional[str] = None) -> Graph:
    """Load the karate-club edge list (same file format as
    /root/reference/datasets/karate.csv: "src dst weight" rows)."""
    if path is None:
        for cand in (
            os.path.join(os.path.dirname(__file__), "..", "..", "datasets",
                         "karate.csv"),
            "/root/reference/datasets/karate.csv",
        ):
            if os.path.exists(cand):
                path = cand
                break
    data = np.loadtxt(path)
    src = data[:, 0].astype(np.int32)
    dst = data[:, 1].astype(np.int32)
    w = data[:, 2].astype(np.float32) if data.shape[1] > 2 else None
    n = int(max(src.max(), dst.max())) + 1
    return Graph(src=src, dst=dst, num_nodes=n, edge_weight=w)


def symmetrize(g: Graph) -> Graph:
    src = np.concatenate([g.src, g.dst])
    dst = np.concatenate([g.dst, g.src])
    w = None if g.edge_weight is None else np.concatenate(
        [g.edge_weight, g.edge_weight])
    # dedupe
    key = src.astype(np.int64) * g.num_nodes + dst
    _, idx = np.unique(key, return_index=True)
    return Graph(src=src[idx], dst=dst[idx], num_nodes=g.num_nodes,
                 edge_weight=None if w is None else w[idx])


def random_graph(num_nodes: int, num_edges: int, seed: int = 0,
                 power_law: bool = False) -> Graph:
    """Synthetic benchmark graph.  power_law=True gives a skewed degree
    distribution approximating OGB graphs (for bench realism)."""
    rng = np.random.default_rng(seed)
    if power_law:
        # Preferential-attachment-flavoured: sample endpoints from a
        # Zipf-ish distribution over nodes.
        ranks = rng.pareto(1.5, size=2 * num_edges)
        ids = np.minimum((ranks / ranks.max() * (num_nodes - 1)), num_nodes - 1)
        ids = rng.permutation(num_nodes)[ids.astype(np.int64) % num_nodes]
        src, dst = ids[:num_edges], ids[num_edges:]
    else:
        src = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
        dst = rng.integers(0, num_nodes, size=num_edges, dtype=np.int64)
    return Graph(src=src.astype(np.int32), dst=dst.astype(np.int32),
                 num_nodes=num_nodes)
