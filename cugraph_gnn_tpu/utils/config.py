"""Shared argparse option groups for examples and benchmarks.

ref python/pylibwholegraph/pylibwholegraph/torch/common_options.py:7-195 —
training / graph / model / sampler / dataloader flag groups, and
parse_max_neighbors (fanout list parsing :185-195).
"""

from __future__ import annotations

import argparse
from typing import List


def add_training_options(p: argparse.ArgumentParser):
    g = p.add_argument_group("training")
    g.add_argument("--epochs", type=int, default=10)
    g.add_argument("--lr", type=float, default=0.003)
    g.add_argument("--batch-size", type=int, default=1024)
    g.add_argument("--embedding-dim", type=int, default=128)
    g.add_argument("--log-level", default="info",
                   choices=["fatal", "error", "warn", "info", "debug",
                            "trace"])
    g.add_argument("--optimizer", default="adam")
    g.add_argument("--emb-optimizer", default="lazy_adam",
                   choices=["sgd", "lazy_adam", "adagrad", "rmsprop"])


def add_graph_options(p: argparse.ArgumentParser):
    g = p.add_argument_group("graph")
    g.add_argument("--root-dir", default=".")
    g.add_argument("--feat-dim", type=int, default=100)
    g.add_argument("--dataset", default="karate")


def add_model_options(p: argparse.ArgumentParser):
    g = p.add_argument_group("model")
    g.add_argument("--model", default="sage",
                   choices=["sage", "gcn", "gat", "gin", "rgcn"])
    g.add_argument("--hidden-dim", type=int, default=256)
    g.add_argument("--num-layers", type=int, default=2)
    g.add_argument("--heads", type=int, default=4)


def add_sampler_options(p: argparse.ArgumentParser):
    g = p.add_argument_group("sampler")
    g.add_argument("--neighbors", default="10,10",
                   help="comma-separated per-hop fanouts, seed-side first")


def parse_fanouts(s: str) -> List[int]:
    """ref common_options.py:185-195 parse_max_neighbors."""
    return [int(x) for x in s.split(",") if x.strip()]


def make_parser(*groups) -> argparse.ArgumentParser:
    p = argparse.ArgumentParser()
    for add in groups or (add_training_options, add_graph_options,
                          add_model_options, add_sampler_options):
        add(p)
    return p
