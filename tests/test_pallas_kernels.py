"""Pallas kernel correctness in interpreter mode (CPU).

Real-TPU numerics are exercised by bench/verify on hardware; these tests
pin semantics vs the XLA reference ops.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

from cugraph_gnn_tpu.ops import coo_to_csr_np
from cugraph_gnn_tpu.ops.pallas.gather_kernel import gather_rows_tpu
from cugraph_gnn_tpu.ops.pallas.spmm_kernel import (
    build_padded_blocks,
    csr_spmm_pallas,
)
from cugraph_gnn_tpu.ops.spmm import csr_spmm


def test_gather_kernel_interpret(rng):
    table = rng.standard_normal((64, 128)).astype(np.float32)
    ids = np.array([3, 0, 63, -1, 17, 5, 5, -1], np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = gather_rows_tpu(jnp.asarray(table), jnp.asarray(ids))
    expect = np.where((ids >= 0)[:, None], table[np.clip(ids, 0, None)], 0)
    np.testing.assert_allclose(np.asarray(out), expect)


def test_spmm_kernel_interpret(rng):
    n, e, f = 32, 200, 128
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    x = rng.standard_normal((n, f)).astype(np.float32)
    (indptr, indices), _ = coo_to_csr_np(dst, src, n, sort_by="src")
    padded = build_padded_blocks(indptr, indices, edge_tile=64)
    with pltpu.force_tpu_interpret_mode():
        out = csr_spmm_pallas(padded, jnp.asarray(x))
    expect = csr_spmm(jnp.asarray(indptr), jnp.asarray(indices),
                      jnp.asarray(x), reduce="sum")
    np.testing.assert_allclose(np.asarray(out), np.asarray(expect),
                               rtol=1e-5, atol=1e-5)


def test_window_select_neighbors_interpret(rng):
    from cugraph_gnn_tpu.ops.pallas.sample_kernel import (
        window_select_neighbors,
    )
    E, S, K = 5000, 200, 10
    indices = rng.integers(0, 1 << 30, E).astype(np.int32)
    start = rng.integers(0, E - 200, S).astype(np.int32)
    pos = rng.integers(0, 100, (S, K)).astype(np.int32)
    with pltpu.force_tpu_interpret_mode():
        out = window_select_neighbors(
            jnp.asarray(indices), jnp.asarray(start), jnp.asarray(pos))
    expect = indices[start[:, None] + pos]
    np.testing.assert_array_equal(np.asarray(out), expect)
