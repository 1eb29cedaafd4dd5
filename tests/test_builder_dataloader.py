"""Model factory (ref gnn_model.py create_gnn_layers) and raw node
batching (ref data_loader.py) parity tests."""

import numpy as np
import pytest

from cugraph_gnn_tpu.models.builder import create_gnn_model, model_from_args
from cugraph_gnn_tpu.utils.data_loader import (
    NodeSplit,
    create_node_classification_datasets,
    iterate_batches,
    num_batches,
)


@pytest.mark.parametrize("mt", ["sage", "gcn", "gat", "gin"])
def test_factory_builds_and_runs(mt, karate):
    import jax

    from cugraph_gnn_tpu.data import FeatureStore, GraphStore
    from cugraph_gnn_tpu.loader import NeighborLoader

    gs = GraphStore()
    gs.put_edge_index((karate.src, karate.dst), ("N", "e", "N"),
                      num_nodes=(karate.num_nodes, karate.num_nodes))
    fs = FeatureStore()
    fs[("", "x")] = np.eye(karate.num_nodes, dtype=np.float32)
    loader = NeighborLoader((fs, gs), num_neighbors=[3, 3], batch_size=8)
    model = create_gnn_model(mt, class_count=5, hidden_feat_dim=16,
                             num_layers=2, num_heads=2)
    b = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), b.x, b.sample)
    out = model.apply(params, b.x, b.sample)
    assert out.shape[-1] == 5


def test_factory_rejects_unknown():
    with pytest.raises(ValueError):
        create_gnn_model("transformer", class_count=2)


def test_factory_rgcn():
    m = create_gnn_model("rgcn", class_count=3, num_relations=4,
                         hidden_feat_dim=8)
    assert m.num_relations == 4 and m.out_features == 3


def test_model_from_args():
    import argparse
    args = argparse.Namespace(model="gat", hidden_dim=32, num_layers=2,
                              heads=4)
    m = model_from_args(args, class_count=7)
    assert m.heads == 4 and m.out_features == 7


def test_create_datasets():
    d = {f"{s}_idx": np.arange(10) + i * 10
         for i, s in enumerate(("train", "valid", "test"))}
    for s in ("train", "valid", "test"):
        d[f"{s}_label"] = np.zeros(10, np.int32)
    tr, va, te = create_node_classification_datasets(d)
    assert len(tr) == len(va) == len(te) == 10
    assert tr.label.dtype == np.int64
    np.testing.assert_array_equal(va.idx, np.arange(10) + 10)


def test_replica_streams_disjoint_and_complete():
    split = NodeSplit(np.arange(103), np.arange(103))
    seen = []
    for r in range(4):
        for idx, lab in iterate_batches(split, 8, replica_id=r,
                                        num_replicas=4, seed=3, epoch=1):
            assert idx.shape == (8,) and lab.shape == (8,)
            np.testing.assert_array_equal(idx, lab)
            seen.append(idx)
    seen = np.concatenate(seen)
    # drop_last trims per-replica tails; everything kept is a real id
    # and no id appears more than twice (wrap padding only).
    counts = np.bincount(seen, minlength=103)
    assert counts.max() <= 2
    assert len(seen) == 4 * num_batches(103, 8, num_replicas=4) * 8


def test_epoch_reshuffles_and_seed_reproduces():
    split = NodeSplit(np.arange(64), np.arange(64))
    a = np.concatenate([i for i, _ in iterate_batches(split, 16, epoch=0)])
    b = np.concatenate([i for i, _ in iterate_batches(split, 16, epoch=1)])
    a2 = np.concatenate([i for i, _ in iterate_batches(split, 16, epoch=0)])
    assert not np.array_equal(a, b)
    np.testing.assert_array_equal(a, a2)
    assert not np.array_equal(a, np.arange(64))


def test_drop_last_false_pads_by_wrapping():
    split = NodeSplit(np.arange(10), np.arange(10))
    batches = list(iterate_batches(split, 4, shuffle=False,
                                   drop_last=False))
    assert len(batches) == num_batches(10, 4, drop_last=False) == 3
    tail = batches[-1][0]
    assert tail.shape == (4,)
    np.testing.assert_array_equal(np.sort(tail), [0, 1, 8, 9])


def test_bad_replica_raises():
    split = NodeSplit(np.arange(8), np.arange(8))
    with pytest.raises(ValueError):
        list(iterate_batches(split, 2, replica_id=2, num_replicas=2))
