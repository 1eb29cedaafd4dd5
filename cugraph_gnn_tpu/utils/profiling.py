"""Profiling/observability helpers.

The reference ships no profiler integration (SURVEY.md §5: performance
observability = a standalone bench harness printing Bandwidth GB/s,
ref cpp/bench/common/wholegraph_benchmark.hpp:29-80).  The TPU-native
equivalents here:

* :func:`trace` — context manager around ``jax.profiler`` producing an
  XLA trace viewable in TensorBoard / Perfetto.
* :class:`PerformanceMeter` — the reference's warmup+timed-window meter
  (ref wholegraph_benchmark.hpp PerformanceMeter) adapted to the TPU
  dispatch model: wall-clock timing is only meaningful with a dependent
  scalar readback, so ``run`` takes a step function returning a scalar
  that is folded into an accumulator (dependency-forced timing — see
  bench.py and .claude/skills/verify/SKILL.md).
* :func:`annotate` — named region for the profiler timeline
  (``jax.profiler.TraceAnnotation``); no-op cost when not tracing.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Callable, Dict, List, Optional


@contextlib.contextmanager
def trace(log_dir: str, *, create_perfetto_link: bool = False):
    """Capture a device trace for the enclosed block:

        with profiling.trace("/tmp/jax-trace"):
            step(...)   # jitted work

    View with ``tensorboard --logdir /tmp/jax-trace`` or the generated
    Perfetto link."""
    import jax

    jax.profiler.start_trace(log_dir,
                             create_perfetto_link=create_perfetto_link)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named region on the profiler timeline (host side):

        with profiling.annotate("feature-gather"):
            x = store.gather(ids)
    """
    import jax

    return jax.profiler.TraceAnnotation(name)


@dataclass
class PerformanceMeter:
    """Warmup + timed-window meter with dependency-forced readback.

    The reference's PerformanceMeter (wholegraph_benchmark.hpp) times a
    CUDA stream between events; on TPU through a dispatch tunnel,
    ``block_until_ready`` does not reliably wait, so each ``run`` call
    threads a device scalar through every iteration and reads it back
    once per window, and the per-iteration time is obtained by
    differencing a small and a large window (subtracts the fixed
    readback/dispatch cost).

        meter = PerformanceMeter(warmup=3, iters=50)
        ms = meter.run(lambda acc: acc + step(...))   # step returns scalar
    """

    warmup: int = 3
    iters: int = 50
    metrics: Dict[str, float] = field(default_factory=dict)

    def run(self, step: Callable, *, name: Optional[str] = None,
            bytes_per_iter: Optional[float] = None,
            items_per_iter: Optional[float] = None) -> float:
        """``step(acc) -> acc`` must fold a device scalar through the
        iteration (a jitted function whose output depends on the whole
        computation).  Returns ms/iter; records ``name`` (+ GB/s and
        items/s when sizes are given) in :attr:`metrics`."""
        import jax.numpy as jnp

        def window(n):
            acc = jnp.zeros((), jnp.float32)
            for _ in range(n):
                acc = step(acc)
            return float(acc)  # dependent readback

        for _ in range(self.warmup):
            window(1)
        t0 = time.perf_counter()
        window(1)
        t_small = time.perf_counter() - t0
        t0 = time.perf_counter()
        window(self.iters + 1)
        dt = max(time.perf_counter() - t0 - t_small, 1e-9)
        ms = 1e3 * dt / self.iters
        if name is not None:
            self.metrics[name] = ms
            if bytes_per_iter:
                self.metrics[f"{name}_gbps"] = (
                    bytes_per_iter / (ms * 1e-3) / 1e9)
            if items_per_iter:
                self.metrics[f"{name}_items_per_s"] = (
                    items_per_iter / (ms * 1e-3))
        return ms

    def report(self) -> List[str]:
        return [f"{k}: {v:,.3f}" for k, v in self.metrics.items()]
