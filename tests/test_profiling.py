"""utils/profiling: PerformanceMeter timing discipline + annotate
no-op safety (trace itself needs a real profiler backend; the meter and
annotation paths are what library code uses)."""

import jax
import jax.numpy as jnp

from cugraph_gnn_tpu.utils import profiling


def test_meter_runs_and_records():
    meter = profiling.PerformanceMeter(warmup=1, iters=3)

    @jax.jit
    def step(acc):
        return acc + jnp.sum(jnp.ones((8, 8)) * 2.0) / 128.0

    ms = meter.run(step, name="toy", bytes_per_iter=1e6,
                   items_per_iter=64)
    assert ms > 0
    assert meter.metrics["toy"] == ms
    assert meter.metrics["toy_gbps"] > 0
    assert meter.metrics["toy_items_per_s"] > 0
    assert any("toy" in line for line in meter.report())


def test_annotate_wraps_work():
    with profiling.annotate("region"):
        out = jax.jit(lambda x: x * 2)(jnp.arange(4))
    assert out.tolist() == [0, 2, 4, 6]
