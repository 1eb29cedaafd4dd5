"""KG renumbering (utils/renumber.py) — the analog of the reference's
renumber_kg job (ref cugraph_pyg/examples/kg/renumber_kg.py:154-276)."""

import numpy as np
import pytest

from cugraph_gnn_tpu.utils.renumber import (
    apply_renumber_map,
    build_renumber_map,
    renumber_kg,
)


def test_map_and_apply():
    shards = [np.asarray([100, 7, 100]), np.asarray([7, 55])]
    m = build_renumber_map(shards)
    np.testing.assert_array_equal(m, [7, 55, 100])
    np.testing.assert_array_equal(
        apply_renumber_map(m, [100, 7, 55]), [2, 0, 1])
    with pytest.raises(KeyError):
        apply_renumber_map(m, [42])
    np.testing.assert_array_equal(
        apply_renumber_map(m, [42, 55], strict=False), [-1, 1])


def test_renumber_kg_end_to_end():
    rng = np.random.default_rng(0)
    raw_a = rng.choice(10**12, 50, replace=False)
    raw_b = rng.choice(10**12, 30, replace=False)
    e1 = (raw_a[rng.integers(0, 50, 200)], raw_b[rng.integers(0, 30, 200)])
    e2 = (raw_b[rng.integers(0, 30, 100)], raw_b[rng.integers(0, 30, 100)])
    kg = renumber_kg(
        nodes_by_type={"a": [raw_a[:25], raw_a[25:]], "b": [raw_b]},
        edges_by_etype={("a", "r1", "b"): [e1], ("b", "r2", "b"): [e2]})
    assert kg.num_nodes == {"a": 50, "b": 30}
    s, d = kg.edges[("a", "r1", "b")]
    assert s.max() < 50 and d.max() < 30 and s.min() >= 0
    # raw identity preserved through the maps
    np.testing.assert_array_equal(kg.maps["a"][s], e1[0])
    np.testing.assert_array_equal(kg.maps["b"][d], e1[1])


def test_endpoints_fill_missing_nodes():
    """Edge endpoints not covered by node shards still get ids (the
    robust default; the reference errors on uncovered endpoints)."""
    kg = renumber_kg(
        nodes_by_type={"x": [np.asarray([5])]},
        edges_by_etype={("x", "r", "x"): [(np.asarray([5, 9]),
                                           np.asarray([9, 5]))]})
    assert kg.num_nodes["x"] == 2
    s, d = kg.edges[("x", "r", "x")]
    np.testing.assert_array_equal(kg.maps["x"][s], [5, 9])
