"""A/B Farneback iteration budgets: device_flow time + flow EPE vs baseline."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp
import numpy as np

import bench
from tobac_flow_tpu import pipeline
from tobac_flow_tpu.models.farneback import FarnebackParams


def main():
    t, h, w = 24, 1024, 1536
    bt = bench.make_scene_device(t, h, w)

    variants = [
        ("base 10/5", FarnebackParams()),
        ("7/4", FarnebackParams(num_iters=7, resamples=4)),
        ("6/3", FarnebackParams(num_iters=6, resamples=3)),
        ("4/2", FarnebackParams(num_iters=4, resamples=2)),
    ]
    ref_fwd = None
    for name, p in variants:
        f, b = pipeline.device_flow(bt, p)
        float(f[0, 0, 0, 0].astype(jnp.float32))  # compile+sync
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            f, b = pipeline.device_flow(bt, p)
            float(f[0, 0, 0, 0].astype(jnp.float32))
            times.append(time.perf_counter() - t0)
        fnp = np.asarray(f)
        if ref_fwd is None:
            ref_fwd = fnp
            epe = 0.0
        else:
            epe = float(
                np.nanmean(np.hypot(*(fnp - ref_fwd).transpose(3, 0, 1, 2)[:2]))
            )
        print(f"{name:<12} {min(times)*1e3:8.1f} ms   EPE vs base {epe:.4f}")


if __name__ == "__main__":
    main()
