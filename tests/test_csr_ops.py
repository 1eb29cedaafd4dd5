"""CSR utility ops: add_self_loop, coo<->csr round trips
(ref cpp/tests/graph_ops/csr_add_self_loop host-reference strategy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from cugraph_gnn_tpu.ops import coo_to_csr, coo_to_csr_np, csr_add_self_loop


def test_csr_add_self_loop(rng):
    n, e = 20, 80
    src = rng.integers(0, n, e)
    dst = rng.integers(0, n, e)
    (indptr, indices), _ = coo_to_csr_np(src, dst, n)
    new_ip, new_ix = csr_add_self_loop(
        jnp.asarray(indptr, jnp.int32), jnp.asarray(indices, jnp.int32))
    new_ip = np.asarray(new_ip)
    new_ix = np.asarray(new_ix)
    assert new_ip[-1] == e + n
    for v in range(n):
        row = new_ix[new_ip[v]:new_ip[v + 1]]
        # diagonal first (ref semantics: torch/graph_ops.py:64-95)
        assert row[0] == v
        np.testing.assert_array_equal(
            np.sort(row[1:]), np.sort(indices[indptr[v]:indptr[v + 1]]))


def test_coo_to_csr_jit_matches_np(rng):
    n, e = 30, 150
    src = rng.integers(0, n, e).astype(np.int32)
    dst = rng.integers(0, n, e).astype(np.int32)
    (ip_np, ix_np), perm_np = coo_to_csr_np(src, dst, n)
    csr, perm = coo_to_csr(jnp.asarray(src), jnp.asarray(dst), n)
    np.testing.assert_array_equal(np.asarray(csr.indptr), ip_np)
    np.testing.assert_array_equal(np.asarray(csr.indices), ix_np)
    np.testing.assert_array_equal(np.asarray(perm), perm_np)
    assert csr.num_nodes == n and csr.num_edges == e
    np.testing.assert_array_equal(
        np.asarray(csr.degrees()), np.diff(ip_np))


def test_native_csr_matches_numpy_on_empty():
    from cugraph_gnn_tpu.native import build_csr, degrees
    ip, ix, perm = build_csr(np.zeros(0, np.int32), np.zeros(0, np.int32), 5)
    np.testing.assert_array_equal(ip, np.zeros(6, np.int64))
    assert len(ix) == 0 and len(perm) == 0
    np.testing.assert_array_equal(degrees(np.zeros(0, np.int32), 4),
                                  np.zeros(4, np.int64))
