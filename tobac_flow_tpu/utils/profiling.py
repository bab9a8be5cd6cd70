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

__all__ = ["StageTimer", "trace", "time_flow", "release_host_memory"]


def release_host_memory():
    """Return freed allocator arenas to the OS (glibc holds the high-water
    mark otherwise, inflating peak RSS across a multi-stage pipeline)."""
    import ctypes
    import gc

    gc.collect()
    try:
        ctypes.CDLL("libc.so.6").malloc_trim(0)
    except Exception:
        pass


def _rss_gb():
    try:
        with open("/proc/self/statm") as f:
            pages = int(f.read().split()[1])
        return pages * 4096 / 1e9
    except Exception:
        return float("nan")


class StageTimer:
    """Collects named stage durations; blocks on device completion so the
    numbers mean what they say under async dispatch.  Also records the host
    RSS at the end of each stage — the lever for keeping GOES-day runs
    inside host memory."""

    def __init__(self, verbose=True, trim_memory=True, on_stage_end=None):
        self.stages = {}
        self.rss = {}
        self.verbose = verbose
        self.trim_memory = trim_memory
        # optional callback(timer, stage_name) after every stage — lets a
        # long run (CONUS day) persist a partial artifact so a killed or
        # timed-out job still leaves its per-stage evidence
        self.on_stage_end = on_stage_end

    @contextlib.contextmanager
    def stage(self, name, sync=None):
        start = time.perf_counter()
        try:
            yield
        finally:
            if sync is not None:
                jax.block_until_ready(sync)
            if self.trim_memory:
                release_host_memory()
            elapsed = time.perf_counter() - start
            self.stages[name] = self.stages.get(name, 0.0) + elapsed
            self.rss[name] = _rss_gb()
            if self.verbose:
                print(
                    f"{datetime.now()} [{name}] {elapsed:.3f}s "
                    f"rss={self.rss[name]:.2f}GB",
                    flush=True,
                )
            if self.on_stage_end is not None:
                try:
                    self.on_stage_end(self, name)
                except Exception:
                    pass

    def summary(self):
        return dict(self.stages)

    def rss_summary(self):
        return dict(self.rss)

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
