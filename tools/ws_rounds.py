"""Report coarse/fine sweep rounds the bench-scene watershed consumes."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

import bench
from tobac_flow_tpu import pipeline
from tobac_flow_tpu.ops import watershed as ws

_real = ws._watershed_sweeps
calls = []


def spy(field, markers, mask, fwd, bwd, state, taps, radius, n, **kw):
    t0 = time.perf_counter()
    out, used = _real(field, markers, mask, fwd, bwd, state, taps, radius, n, **kw)
    used_i = int(used)
    calls.append((field.shape, radius, used_i, time.perf_counter() - t0))
    return out, used


ws._watershed_sweeps = spy


def main():
    t, h, w = 24, 1024, 1536
    bt = bench.make_scene_device(t, h, w)
    fwd, bwd, growth, field, edges = pipeline._fields_stage(bt, 5.0)
    float(fwd[0, 0, 0, 0].astype(jnp.float32))
    calls.clear()
    t0 = time.perf_counter()
    labels = pipeline.fused_flow_watershed(bt, 5.0)
    total = time.perf_counter() - t0
    for shape, radius, used, dt in calls:
        print(f"shape={shape} radius={radius} rounds={used} {dt*1e3:8.1f} ms")
    print(f"total fused (incl. cached fields) {total*1e3:.1f} ms")


if __name__ == "__main__":
    main()
