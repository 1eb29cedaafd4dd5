"""Options-driven GNN model factory.

TPU-native analog of the reference's homograph model builder
(ref python/pylibwholegraph/pylibwholegraph/torch/gnn_model.py:34-78
``create_gnn_layers`` — sage/gcn/gat dispatch, per-layer dims, GAT
head splitting, mean-output last layer).  Where the reference builds a
``torch.nn.ModuleList`` against PyG or wg_torch backends, here the zoo
modules are first-class flax modules, so the factory returns a single
ready-to-init model.
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from cugraph_gnn_tpu.models.zoo import GAT, GCN, GIN, RGCN, GraphSAGE

MODEL_TYPES = ("sage", "gcn", "gat", "gin", "rgcn")


def create_gnn_model(
    model_type: str,
    *,
    class_count: int,
    hidden_feat_dim: int = 256,
    num_layers: int = 2,
    num_heads: int = 4,
    num_relations: int = 2,
    dropout: float = 0.0,
    dtype: Optional[jnp.dtype] = None,
):
    """Build a zoo model from the reference's option vocabulary.

    Mirrors ref gnn_model.py:34-78: ``model_type`` in sage/gcn/gat
    (plus gin/rgcn, which the reference ships as examples), the last
    layer emitting ``class_count`` logits, hidden layers at
    ``hidden_feat_dim`` with GAT splitting it across ``num_heads``
    (concat on hidden layers, mean/single-head output — the zoo GAT
    encodes exactly that split, models/zoo.py GAT.make_convs).
    ``in_feat_dim`` is not needed: flax infers input width at init.
    """
    model_type = model_type.lower()
    if model_type not in MODEL_TYPES:
        raise ValueError(
            f"unknown model_type {model_type!r}; expected one of {MODEL_TYPES}")
    if model_type == "rgcn":
        return RGCN(num_relations=num_relations,
                    hidden_features=hidden_feat_dim,
                    out_features=class_count, num_layers=num_layers)
    cls = {"sage": GraphSAGE, "gcn": GCN, "gin": GIN, "gat": GAT}[model_type]
    kwargs = dict(hidden_features=hidden_feat_dim, out_features=class_count,
                  num_layers=num_layers, dropout=dropout, dtype=dtype)
    if model_type == "gat":
        kwargs["heads"] = num_heads
    return cls(**kwargs)


def model_from_args(args, class_count: int):
    """Adapter from the shared flag groups (utils/config.py
    add_model_options) to ``create_gnn_model`` — the reference wires
    common_options straight into gnn_model the same way."""
    return create_gnn_model(
        args.model,
        class_count=class_count,
        hidden_feat_dim=args.hidden_dim,
        num_layers=args.num_layers,
        num_heads=args.heads,
    )
