"""Doctor smoke-check parity (ref cugraph_pyg/_doctor_check.py,
pylibwholegraph/_doctor_check.py)."""

import pytest

from cugraph_gnn_tpu.doctor import smoke_check


def test_smoke_check_passes_on_cpu():
    with pytest.warns(UserWarning, match="targets TPU"):
        report = smoke_check()
    assert report["sample_op"] == "ok"
    assert report["num_devices"] >= 1
    assert report["version"]


def test_require_tpu_raises_on_cpu():
    with pytest.raises(AssertionError, match="TPU required"):
        smoke_check(require_tpu=True)
