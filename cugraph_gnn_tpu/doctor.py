"""Environment smoke check.

TPU-native analog of the reference's doctor plugins
(ref python/cugraph-pyg/cugraph_pyg/_doctor_check.py and
python/pylibwholegraph/pylibwholegraph/_doctor_check.py — import the
package, verify core submodules load, verify an accelerator is usable,
and run a tiny end-to-end op).  Run as
``python -m cugraph_gnn_tpu.doctor`` or call ``smoke_check()``.
"""

from __future__ import annotations

import warnings


def smoke_check(require_tpu: bool = False) -> dict:
    """Import the package, probe the JAX backend, and run one tiny
    sample+gather round trip.  Returns a report dict; raises on a
    broken install (matching the reference's raise-on-failure shape).
    """
    try:
        import cugraph_gnn_tpu
        import cugraph_gnn_tpu.data      # noqa: F401
        import cugraph_gnn_tpu.loader    # noqa: F401
        import cugraph_gnn_tpu.ops       # noqa: F401
        import cugraph_gnn_tpu.store     # noqa: F401
    except ImportError as e:
        raise ImportError(
            "cugraph_gnn_tpu or its dependencies could not be imported; "
            "the package needs jax, flax, and optax.") from e

    if not getattr(cugraph_gnn_tpu, "__version__", None):
        raise AssertionError("smoke check failed: __version__ missing")

    import jax

    devices = jax.devices()
    platform = devices[0].platform if devices else "none"
    if require_tpu and platform != "tpu":
        raise AssertionError(
            f"smoke check failed: TPU required but backend is {platform!r}")
    if platform not in ("tpu", "axon"):
        warnings.warn(
            f"JAX backend is {platform!r}; cugraph_gnn_tpu targets TPU — "
            "CPU works for development but performance paths are TPU-tuned.")

    # One tiny end-to-end op: 4-node ring, sample 2 neighbors per seed.
    import numpy as np

    from cugraph_gnn_tpu.ops import uniform_sample

    indptr = np.array([0, 2, 4, 6, 8], np.int32)
    indices = np.array([1, 3, 0, 2, 1, 3, 0, 2], np.int32)
    seeds = np.array([0, 2], np.int32)
    out = uniform_sample(jax.random.PRNGKey(0), indptr, indices, seeds,
                         fanout=2)
    assert out.neighbors.shape == (2, 2), out.neighbors.shape

    report = {
        "version": cugraph_gnn_tpu.__version__,
        "platform": platform,
        "num_devices": len(devices),
        "sample_op": "ok",
    }
    return report


def main():
    report = smoke_check()
    for k, v in report.items():
        print(f"{k}: {v}")
    print("cugraph_gnn_tpu doctor: all checks passed")


if __name__ == "__main__":
    main()
