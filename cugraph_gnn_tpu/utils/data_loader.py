"""Raw node-id / label batching for embedding-table training loops.

TPU-native analog of the reference's torch data loader layer
(ref python/pylibwholegraph/pylibwholegraph/torch/data_loader.py:36-110:
``create_node_classification_datasets`` splits + ``get_train_dataloader``
= DistributedSampler(shuffle, drop_last) + DataLoader).  Torch's
dynamic last batch and worker processes are replaced by static-shape
epoch batching (every batch the same size, so one jit trace serves the
whole run) and host numpy shuffling — sampling/feature work happens on
device downstream, so there is nothing for worker processes to do here.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, Iterator, Tuple

import numpy as np


@dataclass
class NodeSplit:
    """One split of (node ids, labels) — ref data_loader.py:18-34
    NodeClassificationDataset, minus the torch Dataset ceremony."""

    idx: np.ndarray
    label: np.ndarray

    def __post_init__(self):
        self.idx = np.asarray(self.idx)
        self.label = np.asarray(self.label)
        if self.idx.shape[0] != self.label.shape[0]:
            raise ValueError("idx/label length mismatch")

    def __len__(self) -> int:
        return int(self.idx.shape[0])


def create_node_classification_datasets(
    data_and_label: Dict[str, np.ndarray],
) -> Tuple[NodeSplit, NodeSplit, NodeSplit]:
    """ref data_loader.py:36-65 — train/valid/test splits from the
    convert-job dict ({train,valid,test}_{idx,label})."""
    out = []
    for name in ("train", "valid", "test"):
        out.append(NodeSplit(data_and_label[f"{name}_idx"],
                             np.asarray(data_and_label[f"{name}_label"],
                                        dtype=np.int64)))
    return tuple(out)


def iterate_batches(
    split: NodeSplit,
    batch_size: int,
    *,
    replica_id: int = 0,
    num_replicas: int = 1,
    shuffle: bool = True,
    drop_last: bool = True,
    seed: int = 0,
    epoch: int = 0,
) -> Iterator[Tuple[np.ndarray, np.ndarray]]:
    """Yield per-replica (idx, label) batches for one epoch.

    DistributedSampler semantics (ref data_loader.py:67-110 +
    torch.utils.data.distributed.DistributedSampler): a per-epoch
    seeded global permutation, round-robin interleave across replicas
    (so every replica sees a disjoint, same-length stream), drop_last
    for static batch shapes.  With drop_last=False the tail batch is
    padded by wrapping to the stream head (static shapes under jit;
    PyG-style ragged tails would force a retrace per epoch).
    """
    if not 0 <= replica_id < num_replicas:
        raise ValueError(f"replica_id {replica_id} not in [0, {num_replicas})")
    n = len(split)
    order = np.arange(n)
    if shuffle:
        rng = np.random.default_rng(np.random.SeedSequence([seed, epoch]))
        order = rng.permutation(n)
    # Equalize replica stream lengths by wrapping (DistributedSampler
    # pads with repeated leading samples the same way).
    per_replica = -(-n // num_replicas)
    padded = np.concatenate([order, order[: per_replica * num_replicas - n]])
    mine = padded[replica_id::num_replicas]
    nb = len(mine) // batch_size
    for b in range(nb):
        sel = mine[b * batch_size:(b + 1) * batch_size]
        yield split.idx[sel], split.label[sel]
    rem = len(mine) - nb * batch_size
    if rem and not drop_last:
        sel = np.concatenate([mine[nb * batch_size:], mine[: batch_size - rem]])
        yield split.idx[sel], split.label[sel]


def num_batches(split_len: int, batch_size: int, *, num_replicas: int = 1,
                drop_last: bool = True) -> int:
    """Batches per replica per epoch (loop bounds for jitted scans)."""
    per_replica = -(-split_len // num_replicas)
    if drop_last:
        return per_replica // batch_size
    return -(-per_replica // batch_size)
