"""Memory-budget heuristics for sampler level capacities.

The reference sizes its sampling call groups from GPU memory:
``local_seeds_per_call = BASE_VERTICES_PER_BYTE * total_memory /
prod(fanouts)`` (ref cugraph_pyg/sampler/distributed_sampler.py:754-875
``__calc_local_seeds_per_call``).  On TPU the shapes are static, so the
same lever is the per-hop unique-node capacity (``max_unique_per_hop``):
this module derives those caps from the chip's HBM instead of asking the
user to guess them.  ``NeighborLoader(max_unique_per_hop="auto")`` and
``DistNeighborLoader`` route here.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

_DEFAULT_HBM = 16 * 1024**3  # v5e per-chip HBM when stats are unavailable


def device_memory_bytes() -> int:
    """Best-effort per-device memory size (bytes_limit when the backend
    reports it; a v5e-sized default otherwise — CPU test meshes land
    here, which is fine: the caps only need to be *consistent*)."""
    try:
        import jax
        stats = jax.local_devices()[0].memory_stats()
        if stats and "bytes_limit" in stats:
            return int(stats["bytes_limit"])
    except Exception:
        pass
    return _DEFAULT_HBM


def auto_max_unique_per_hop(
    batch_size: int,
    fanouts: Sequence[int],
    feat_dim: int,
    *,
    feat_bytes: int = 4,
    memory_bytes: Optional[int] = None,
    memory_fraction: float = 0.25,
    copies: int = 6,
) -> List[int]:
    """Per-hop unique-node caps sized to an HBM budget.

    Model: every level's feature activations (and their gradients,
    optimizer copies and XLA temporaries — the ``copies`` multiplier)
    are live at once, and the deepest level dominates.  Each level cap
    is the number of feature rows that fits in an equal share of
    ``memory_fraction * memory_bytes``, never above the combinatorial
    worst case ``caps[l] * (fanout + 1)``.

    Returns a list of length ``len(fanouts)`` suitable for
    ``max_unique_per_hop=`` (requires dedup=True, same as the manual
    knob).  Mirrors the intent of the reference's
    ``BASE_VERTICES_PER_BYTE`` estimate: scale workload to memory, not
    the other way round.
    """
    fanouts = [int(f) for f in fanouts]
    if any(f <= 0 for f in fanouts):
        raise ValueError("auto caps need positive fanouts")
    if memory_bytes is None:
        memory_bytes = device_memory_bytes()
    budget = memory_bytes * memory_fraction
    levels = len(fanouts)
    row_bytes = max(1, int(feat_dim) * int(feat_bytes) * int(copies))
    per_level_rows = int(budget / levels / row_bytes)
    per_level_rows = max(per_level_rows, batch_size)  # never below seeds
    caps = []
    prev = int(batch_size)
    for f in fanouts:
        worst = prev * (f + 1)
        cap = min(worst, per_level_rows)
        caps.append(cap)
        prev = cap
    return caps


def resolve_max_unique_per_hop(max_unique_per_hop, batch_size, fanouts,
                               feat_dim: Optional[int],
                               feat_bytes: int = 4):
    """Loader-side resolution of the ``max_unique_per_hop`` knob:
    pass-through for None/explicit lists, computed for ``"auto"``."""
    if max_unique_per_hop != "auto":
        return max_unique_per_hop
    if isinstance(fanouts, dict):
        # hetero fanout dict: per-target expansion is the sum over etypes
        hop_len = {len(v) for v in fanouts.values()}
        assert len(hop_len) == 1
        fanouts = [sum(v[h] for v in fanouts.values())
                   for h in range(hop_len.pop())]
    return auto_max_unique_per_hop(
        batch_size, fanouts, feat_dim if feat_dim else 128,
        feat_bytes=feat_bytes)


def clamp_level_caps(caps: List[int], growth: Sequence[int],
                     max_unique_per_hop: Sequence[int]) -> List[int]:
    """Apply per-hop unique-node caps to combinatorial level capacities
    (in place) and enforce the prefix invariant shared by every sampler:
    level l's targets are a PREFIX of level l+1, so each level must hold
    at least the previous one — a smaller cap would truncate targets and
    emit out-of-range neighbor indices.  ``growth[h]`` is the worst-case
    expansion factor of hop h (fanout + 1, summed over edge types for
    hetero samplers)."""
    for h, cap in enumerate(max_unique_per_hop):
        caps[h + 1] = min(caps[h + 1], int(cap))
    for h in range(len(growth)):
        caps[h + 1] = min(caps[h + 1], caps[h] * int(growth[h]))
        if caps[h + 1] < caps[h]:
            raise ValueError(
                f"max_unique_per_hop[{h}]={caps[h + 1]} is smaller than "
                f"level {h}'s capacity {caps[h]}; each level must hold "
                "at least the previous level (targets are a prefix of "
                "the next level)")
    return caps


def resolve_feature_dim(feature_store, graph_store, x_attr: str):
    """Feature width used by the auto memory model: first node group
    (homogeneous "" or any node type) holding ``x_attr``; None when the
    store has no features (callers fall back to a default width)."""
    for grp in [""] + list(graph_store.node_types):
        if (grp, x_attr) in feature_store:
            size = feature_store.get_tensor_size(grp, x_attr)
            return size[-1] if len(size) > 1 else 1
    return None
