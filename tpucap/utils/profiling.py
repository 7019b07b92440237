"""Profiling hooks (SURVEY.md §5.1).

- ``profile_trace(dir)``: context manager around jax.profiler.trace for
  TensorBoard's trace viewer (tensorboard_plugin_profile is installed).
- ``StepTimer``: wall-clock step timing that *synchronizes via device_get*
  — on the remote-TPU (axon) platform block_until_ready returns before
  execution completes, so timing must pull a (small) value to the host.
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def profile_trace(log_dir: str):
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    def __init__(self):
        self.times: list[float] = []
        self._t0 = None

    def start(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_value=None) -> float:
        """Pass a small device array (e.g. the loss) to synchronize on."""
        if sync_value is not None:
            np.asarray(jax.device_get(sync_value))
        dt = time.perf_counter() - self._t0
        self.times.append(dt)
        return dt

    @property
    def median(self) -> float:
        return float(np.median(self.times)) if self.times else 0.0

    def rate(self, items_per_step: int) -> float:
        return items_per_step / self.median if self.median else 0.0
