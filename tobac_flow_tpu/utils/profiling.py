"""Tracing and per-stage timing.

The reference's only instrumentation is ad-hoc ``print(datetime.now())``
lines and a ``time_flow`` helper (SURVEY §5).  Here every pipeline stage can
be wrapped in a :class:`StageTimer` (wall-clock + optional device sync), and
``trace`` turns on a jax.profiler trace for offline analysis.
"""

from __future__ import annotations

import contextlib
import json
import time
from datetime import datetime

import jax

__all__ = ["StageTimer", "trace", "time_flow"]


class StageTimer:
    """Collects named stage durations; blocks on device completion so the
    numbers mean what they say under async dispatch."""

    def __init__(self, verbose=True):
        self.stages = {}
        self.verbose = verbose

    @contextlib.contextmanager
    def stage(self, name, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            elapsed = time.perf_counter() - start
            self.stages[name] = self.stages.get(name, 0.0) + elapsed
            if self.verbose:
                print(f"{datetime.now()} [{name}] {elapsed:.3f}s", flush=True)

    def summary(self):
        return dict(self.stages)

    def dump(self, path):
        with open(path, "w") as f:
            json.dump(self.summary(), f, indent=2)


@contextlib.contextmanager
def trace(log_dir="/tmp/tft_trace"):
    """jax.profiler trace around a block (view with TensorBoard/XProf)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def time_flow(da, model="Farneback", vr_steps=1, smoothing_passes=1):
    """Wall-clock seconds of create_flow (reference ``flow.py:660-666``)."""
    from tobac_flow_tpu.core.flow import create_flow

    start = time.perf_counter()
    create_flow(da, model=model, vr_steps=vr_steps, smoothing_passes=smoothing_passes)
    return time.perf_counter() - start
