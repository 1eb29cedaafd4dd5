"""append_unique tests vs host reference (ref
cpp/tests/graph_ops host-reference strategy)."""

import jax.numpy as jnp
import numpy as np

from cugraph_gnn_tpu.ops.unique import append_unique, append_unique_np


def test_append_unique_basic():
    targets = jnp.asarray([5, 2, 9], dtype=jnp.int32)
    neighbors = jnp.asarray([2, 7, 7, 5, 11, -1, 9, 3], dtype=jnp.int32)
    out = append_unique(targets, neighbors, max_unique=16)
    uniq = np.asarray(out.unique_nodes)
    n = int(out.num_unique)
    # prefix = targets in order
    np.testing.assert_array_equal(uniq[:3], [5, 2, 9])
    # new uniques sorted after
    np.testing.assert_array_equal(uniq[3:n], [3, 7, 11])
    assert (uniq[n:] == -1).all()
    # mapping
    m = np.asarray(out.neighbor_map)
    expect_nodes = uniq
    for i, v in enumerate([2, 7, 7, 5, 11, -1, 9, 3]):
        if v < 0:
            assert m[i] == -1
        else:
            assert expect_nodes[m[i]] == v


def test_append_unique_vs_host(rng):
    targets = rng.choice(1000, size=50, replace=False).astype(np.int32)
    neighbors = rng.integers(0, 1000, size=400).astype(np.int32)
    out = append_unique(
        jnp.asarray(targets), jnp.asarray(neighbors), max_unique=500)
    uniq_h, map_h = append_unique_np(targets, neighbors)
    n = int(out.num_unique)
    np.testing.assert_array_equal(np.asarray(out.unique_nodes)[:n], uniq_h)
    np.testing.assert_array_equal(np.asarray(out.neighbor_map), map_h)


def test_append_unique_padded_targets():
    # Targets padded with -1 (as in multihop levels) keep their slots.
    targets = jnp.asarray([4, 8, -1, -1], dtype=jnp.int32)
    neighbors = jnp.asarray([8, 1, 4, -1], dtype=jnp.int32)
    out = append_unique(targets, neighbors, max_unique=8)
    uniq = np.asarray(out.unique_nodes)
    np.testing.assert_array_equal(uniq[:4], [4, 8, -1, -1])
    assert uniq[4] == 1
    m = np.asarray(out.neighbor_map)
    assert uniq[m[0]] == 8 and uniq[m[1]] == 1 and uniq[m[2]] == 4
    assert m[3] == -1
