"""Per-stage timing of the bench pipeline on the live device.

Times device_flow (Farneback pairs), the fused fields stage, and the
watershed chunk separately so optimisation effort goes where the time is.
"""

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp

import bench
from tobac_flow_tpu import pipeline


def sync(x):
    leaves = jax.tree_util.tree_leaves(x)
    a = jnp.asarray(leaves[0])
    # index a single element (ravel would copy the whole array on device)
    return float(a[(0,) * a.ndim].astype(jnp.float32))


def timeit(label, fn, *args, reps=2):
    fn(*args)  # warm/compile
    best = 1e9
    for _ in range(reps):
        t0 = time.perf_counter()
        sync(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{label:<28} {best*1e3:9.1f} ms")
    return best


def main():
    t, h, w = 24, 1024, 1536
    bt = bench.make_scene_device(t, h, w)
    print(f"scene {t}x{h}x{w} = {t*h*w/1e6:.1f} Mpix")

    flow_t = timeit("device_flow (all pairs)", lambda b: pipeline.device_flow(b), bt)

    fields = jax.jit(lambda b: pipeline._fields_stage(b, 5.0))
    fields_t = timeit("fields stage (flow+filters)", fields, bt)

    def full(b):
        return pipeline.fused_flow_watershed(b, 5.0)

    full_t = timeit("fused full pipeline", full, bt, reps=1)
    print(f"{'derived: filters only':<28} {(fields_t-flow_t)*1e3:9.1f} ms")
    print(f"{'derived: watershed+labels':<28} {(full_t-fields_t)*1e3:9.1f} ms")
    print(f"throughput {t*h*w/1e6/full_t:.2f} Mpix/s")


if __name__ == "__main__":
    main()
