"""Tracing / profiling / numerical-debug utilities (SURVEY.md §5.1-5.2).

The reference has none of this (tqdm bars only). TPU-native equivalents:

- :func:`trace` — jax.profiler trace context writing Perfetto-compatible
  dumps (``tensorboard --logdir`` or ui.perfetto.dev);
- :class:`StepTimer` — host-side per-step wall timing with warmup skip
  and percentile summary;
- :func:`annotate` — named TraceAnnotation scope so kernels show up
  labeled in the profile;
- :func:`debug_mode` — context enabling jax_debug_nans +
  jax_disable_most_optimizations-free checking (the stand-in for race
  detectors/sanitizers on an SPMD runtime).
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax


@contextlib.contextmanager
def trace(logdir: str):
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named scope visible in profiler traces."""
    return jax.profiler.TraceAnnotation(name)


@contextlib.contextmanager
def debug_mode(nans: bool = True):
    """Enable NaN checking inside jit for the scope (jax_debug_nans)."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", nans)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


class StepTimer:
    """Wall-clock step timing; call tick() once per step."""

    def __init__(self, warmup: int = 2):
        self.warmup = warmup
        self._times: List[float] = []
        self._last: Optional[float] = None
        self._count = 0

    def tick(self) -> None:
        now = time.perf_counter()
        if self._last is not None:
            self._count += 1
            if self._count > self.warmup:
                self._times.append(now - self._last)
        self._last = now

    def summary(self) -> Dict[str, float]:
        if not self._times:
            return {}
        import numpy as np

        t = np.asarray(self._times)
        return {
            "steps": len(t),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "steps_per_s": float(1.0 / t.mean()),
        }
