"""Sparse per-row embedding optimizers.

TPU-native equivalents of the reference's embedding optimizer kernels
(ref cpp/src/wholememory_ops/functions/embedding_optimizer_func.cu:
sgd :169, lazy_adam :331, adagrad :604, rmsprop :813; management layer
ref cpp/src/wholememory/embedding_optimizer.{hpp,cpp}).

Each optimizer is a pure row-update: given the touched rows, their
deduplicated gradients, and the matching per-row state slices, produce
updated rows + state.  The framework (embedding.DistEmbedding) handles
dedup, owner exchange, and gather/scatter of rows & state — so these
functions see only dense (U, F) blocks: pure VPU/MXU food.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class OptimizerSpec:
    """name -> state feature-widths (per row); update fn."""

    name: str
    state_widths: Dict[str, int]   # state name -> per-row width multiplier
    hyper_defaults: Dict[str, float]

    def init_state(self, num_rows: int, dim: int, dtype=jnp.float32):
        return {
            k: jnp.zeros((num_rows, dim * w if w > 0 else 1), dtype)
            for k, w in self.state_widths.items()
        }


def sgd_update(rows, grads, state, *, lr, weight_decay=0.0, **_):
    """ref embedding_optimizer_func.cu:169 (sgd_optimizer_step_kernel)."""
    g = grads + weight_decay * rows
    return rows - lr * g, state


def lazy_adam_update(rows, grads, state, *, lr, beta1=0.9, beta2=0.999,
                     epsilon=1e-8, weight_decay=0.0, adam_w=False, **_):
    """Lazily-applied Adam: moments and the per-row step count advance
    only for touched rows (ref embedding_optimizer_func.cu:331
    lazy_adam_optimizer_step_kernel, incl. the AdamW variant).
    """
    m, v, t = state["m"], state["v"], state["t"]
    if adam_w:
        rows = rows * (1.0 - lr * weight_decay)
        g = grads
    else:
        g = grads + weight_decay * rows
    t = t + 1.0
    m = beta1 * m + (1 - beta1) * g
    v = beta2 * v + (1 - beta2) * g * g
    bc1 = 1.0 - beta1 ** t          # (U, 1) per-row bias correction
    bc2 = 1.0 - beta2 ** t
    m_hat = m / bc1
    v_hat = v / bc2
    new_rows = rows - lr * m_hat / (jnp.sqrt(v_hat) + epsilon)
    return new_rows, {"m": m, "v": v, "t": t}


def adagrad_update(rows, grads, state, *, lr, epsilon=1e-8,
                   weight_decay=0.0, **_):
    """ref embedding_optimizer_func.cu:604."""
    h = state["state_sum"]
    g = grads + weight_decay * rows
    h = h + g * g
    new_rows = rows - lr * g / (jnp.sqrt(h) + epsilon)
    return new_rows, {"state_sum": h}


def rmsprop_update(rows, grads, state, *, lr, alpha=0.99, epsilon=1e-8,
                   weight_decay=0.0, **_):
    """ref embedding_optimizer_func.cu:813."""
    v = state["v"]
    g = grads + weight_decay * rows
    v = alpha * v + (1 - alpha) * g * g
    new_rows = rows - lr * g / (jnp.sqrt(v) + epsilon)
    return new_rows, {"v": v}


SGD = OptimizerSpec("sgd", {}, {"weight_decay": 0.0})
LAZY_ADAM = OptimizerSpec(
    "lazy_adam", {"m": 1, "v": 1, "t": 0},
    {"beta1": 0.9, "beta2": 0.999, "epsilon": 1e-8, "weight_decay": 0.0})
ADAGRAD = OptimizerSpec(
    "adagrad", {"state_sum": 1}, {"epsilon": 1e-8, "weight_decay": 0.0})
RMSPROP = OptimizerSpec(
    "rmsprop", {"v": 1}, {"alpha": 0.99, "epsilon": 1e-8, "weight_decay": 0.0})

UPDATE_FNS = {
    "sgd": sgd_update,
    "lazy_adam": lazy_adam_update,
    "adagrad": adagrad_update,
    "rmsprop": rmsprop_update,
}

SPECS = {s.name: s for s in (SGD, LAZY_ADAM, ADAGRAD, RMSPROP)}
