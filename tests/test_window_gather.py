"""Line-window gather correctness (ops/window_gather.py) — the round-2
replacement for scalar CSR-value reads in the samplers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.ops.window_gather import (
    as_lines,
    gather_csr_values,
    gather_lines_per_entry,
    gather_window,
    pad_to_lines,
    shift_window,
    window_lines_for,
)


@pytest.fixture(scope="module")
def values():
    rng = np.random.default_rng(0)
    return rng.integers(0, 1 << 30, 1000).astype(np.int32)


def _setup(values):
    padded = pad_to_lines(jnp.asarray(values))
    return as_lines(padded)


def test_gather_window_exact(values):
    v2d = _setup(values)
    rng = np.random.default_rng(1)
    start = rng.integers(0, 800, 64).astype(np.int32)
    deg = rng.integers(1, 150, 64).astype(np.int32)
    pos = np.minimum(rng.integers(0, 150, (64, 7)), deg[:, None] - 1)
    pos[5, 3:] = -1  # pads
    lines = window_lines_for(150)
    out = np.asarray(gather_window(
        v2d, jnp.asarray(start), jnp.asarray(pos), lines=lines))
    exp = np.where(pos >= 0, values[np.clip(start[:, None] + pos, 0, 999)], 0)
    assert np.array_equal(out, exp)


def test_gather_per_entry_exact(values):
    v2d = _setup(values)
    rng = np.random.default_rng(2)
    eids = rng.integers(0, 1000, (32, 5)).astype(np.int32)
    eids[0, 0] = -1
    out = np.asarray(gather_lines_per_entry(v2d, jnp.asarray(eids)))
    exp = np.where(eids >= 0, values[np.clip(eids, 0, None)], 0)
    assert np.array_equal(out, exp)


def test_shift_window_exact(values):
    v2d = _setup(values)
    rng = np.random.default_rng(3)
    base = rng.integers(0, 700, 16).astype(np.int32)
    width = 256
    out = np.asarray(shift_window(v2d, jnp.asarray(base), width))
    for s in range(16):
        run = values[base[s]: base[s] + width]
        assert np.array_equal(out[s, : len(run)], run)


def test_gather_csr_values_hybrid(values):
    """degrees-aware hybrid: hub rows (deg > window cap) take the
    compacted per-entry path, small rows the window path — same
    answers."""
    v2d = _setup(values)
    start = jnp.asarray([0, 100, 0], jnp.int32)
    deg = jnp.asarray([900, 5, 50], jnp.int32)   # row 0 is a hub
    pos = jnp.asarray([[870, 0, 899], [4, 1, -1], [49, 0, 10]], jnp.int32)
    out = np.asarray(gather_csr_values(
        v2d, start, pos, degrees=deg, max_degree=900, max_window_lines=2))
    p = np.asarray(pos)
    s = np.asarray(start)
    exp = np.where(p >= 0, values[np.clip(s[:, None] + p, 0, 999)], 0)
    assert np.array_equal(out, exp)


def test_gather_csr_values_hub_paths(values):
    """Many hub rows: exercises the compact buffer, and — with a tiny
    hub_capacity — the lax.cond overflow fallback.  Both must be exact."""
    v2d = _setup(values)
    rng = np.random.default_rng(7)
    s_n = 40
    start = rng.integers(0, 100, s_n).astype(np.int32)
    deg = np.where(rng.random(s_n) < 0.5, 900, 20).astype(np.int32)
    pos = np.minimum(rng.integers(0, 900, (s_n, 6)), deg[:, None] - 1)
    pos[3, 2:] = -1
    exp = np.where(pos >= 0, values[np.clip(start[:, None] + pos, 0, 999)],
                   0)
    for cap in (32, 2):  # 32: compact path; 2: overflow -> full fallback
        out = np.asarray(gather_csr_values(
            v2d, jnp.asarray(start), jnp.asarray(pos),
            degrees=jnp.asarray(deg), max_degree=900, max_window_lines=2,
            hub_capacity=cap))
        assert np.array_equal(out, exp), cap


def test_sampler_window_vs_scalar_agree():
    """uniform_sample with and without the window path draws identical
    samples (same RNG, same positions, only the id read path differs)."""
    from cugraph_gnn_tpu.ops import sample as sample_ops
    rng = np.random.default_rng(4)
    n = 200
    deg = rng.integers(0, 30, n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    indices = rng.integers(0, n, indptr[-1]).astype(np.int32)
    seeds = jnp.asarray(rng.integers(0, n, 37), jnp.int32)
    key = jax.random.PRNGKey(9)
    a = sample_ops.uniform_sample(
        key, jnp.asarray(indptr), jnp.asarray(indices), seeds, 8)
    padded = pad_to_lines(jnp.asarray(indices))
    b = sample_ops.uniform_sample(
        key, jnp.asarray(indptr), padded, seeds, 8,
        indices2d=padded.reshape(-1, 128), max_degree=int(deg.max()))
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_weighted_window_vs_scalar_agree():
    from cugraph_gnn_tpu.ops import sample as sample_ops
    rng = np.random.default_rng(5)
    n = 150
    deg = rng.integers(1, 40, n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    e = int(indptr[-1])
    indices = rng.integers(0, n, e).astype(np.int32)
    w = rng.random(e).astype(np.float32)
    times = rng.integers(0, 10, e).astype(np.int32)
    seeds = jnp.asarray(rng.integers(0, n, 23), jnp.int32)
    seed_time = jnp.asarray(rng.integers(0, 10, 23), jnp.int32)
    key = jax.random.PRNGKey(10)
    md = int(deg.max())
    tj = jnp.asarray(times)
    a = sample_ops.weighted_sample(
        key, jnp.asarray(indptr), jnp.asarray(indices), jnp.asarray(w),
        seeds, 5, max_degree=md,
        time_filter=lambda eids: tj[eids] <= seed_time[:, None])
    ip = pad_to_lines(jnp.asarray(indices))
    wp = pad_to_lines(jnp.asarray(w))
    tp = pad_to_lines(tj)
    b = sample_ops.weighted_sample(
        key, jnp.asarray(indptr), ip, wp, seeds, 5, max_degree=md,
        indices2d=ip.reshape(-1, 128), weights2d=wp.reshape(-1, 128),
        edge_times=tp, times2d=tp.reshape(-1, 128), seed_time=seed_time)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))


def test_masked_uniform_window_vs_scalar_agree():
    from cugraph_gnn_tpu.ops import sample as sample_ops
    rng = np.random.default_rng(6)
    n = 100
    deg = rng.integers(1, 25, n)
    indptr = np.concatenate([[0], np.cumsum(deg)]).astype(np.int32)
    e = int(indptr[-1])
    indices = rng.integers(0, n, e).astype(np.int32)
    times = rng.integers(0, 8, e).astype(np.int32)
    seeds = jnp.asarray(rng.integers(0, n, 17), jnp.int32)
    seed_time = jnp.asarray(rng.integers(0, 8, 17), jnp.int32)
    key = jax.random.PRNGKey(11)
    md = int(deg.max())
    tj = jnp.asarray(times)
    a = sample_ops.masked_uniform_sample(
        key, jnp.asarray(indptr), jnp.asarray(indices), seeds, 4,
        max_degree=md,
        time_filter=lambda eids: tj[eids] <= seed_time[:, None])
    ip = pad_to_lines(jnp.asarray(indices))
    tp = pad_to_lines(tj)
    b = sample_ops.masked_uniform_sample(
        key, jnp.asarray(indptr), ip, seeds, 4, max_degree=md,
        indices2d=ip.reshape(-1, 128), edge_times=tp,
        times2d=tp.reshape(-1, 128), seed_time=seed_time)
    for x, y in zip(a, b):
        assert np.array_equal(np.asarray(x), np.asarray(y))
