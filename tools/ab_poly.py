"""A/B the poly_exp formulations on device_flow timing (3 reps each)."""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax.numpy as jnp

from tobac_flow_tpu.models import farneback


def main():
    import bench
    from tobac_flow_tpu import pipeline

    t, h, w = 24, 1024, 1536
    bt = bench.make_scene_device(t, h, w)

    def run():
        f, b = pipeline.device_flow(bt)
        return float(f[0, 0, 0, 0].astype(jnp.float32))

    for mode in (True, False, True, False):
        farneback.POLY_BATCHED = mode
        pipeline.device_flow.clear_cache()
        run()  # compile
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            run()
            times.append(time.perf_counter() - t0)
        print(f"POLY_BATCHED={mode}: {min(times)*1e3:.1f} ms (best of 3)")


if __name__ == "__main__":
    main()
