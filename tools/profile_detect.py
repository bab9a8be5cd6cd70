"""Piecewise wall-clock profile of the detection chain at e2e scale.

Wraps the inner fused/label/watershed entry points with accumulating timers
and runs the detect stages (flow -> cores -> markers -> thick -> relabel ->
thin) on the cached bench_e2e scene.  The output attributes each stage's
seconds to its device programs vs host label bookkeeping — the measurement
behind the round-3 e2e optimisation work (VERDICT.md item 2).

Usage (TPU):  python tools/profile_detect.py -t 288 -y 512 -x 768
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")

ACC = defaultdict(lambda: [0.0, 0])


def timed(obj, name, label=None):
    label = label or name
    fn = getattr(obj, name)

    @functools.wraps(fn)
    def wrap(*a, **k):
        t0 = time.perf_counter()
        out = fn(*a, **k)
        dt = time.perf_counter() - t0
        ACC[label][0] += dt
        ACC[label][1] += 1
        return out

    setattr(obj, name, wrap)
    return fn


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-t", default=288, type=int)
    p.add_argument("-y", default=512, type=int)
    p.add_argument("-x", default=768, type=int)
    args = p.parse_args()

    from bench_e2e import make_day_scene
    from tobac_flow_tpu.cli.common import DetectionOptions, run_detection
    from tobac_flow_tpu.data.ncdataset import DataArray, Dataset
    from tobac_flow_tpu.utils.profiling import StageTimer
    import tobac_flow_tpu.detect.fused as fused
    import tobac_flow_tpu.segment.label as seglabel
    import tobac_flow_tpu.utils.labels as ulabels
    import tobac_flow_tpu.detect.detection as det
    from tobac_flow_tpu.core.flow import Flow

    t, h, w = args.t, args.y, args.x
    cache = Path(f"/tmp/bench_e2e_scene_{t}x{h}x{w}_cNone_s0.npz")
    if cache.exists():
        z = np.load(cache)
        bt_v, wvd_v, swd_v = z["bt"], z["wvd"], z["swd"]
    else:
        bt_v, wvd_v, swd_v = make_day_scene(t, h, w)
        np.savez(cache, bt=bt_v, wvd=wvd_v, swd=swd_v)

    times = np.datetime64("2020-06-01T00:00:00", "ns") + np.arange(t) * np.timedelta64(300, "s")
    coords = {"t": times, "y": np.arange(h) * 2000.0, "x": np.arange(w) * 2000.0}

    def da(v, name):
        return DataArray(v, coords=coords, dims=("t", "y", "x"), name=name)

    # --- instrument ---------------------------------------------------------
    timed(fused, "fused_core_markers")
    timed(fused, "fused_anvil_marker_mask")
    timed(fused, "fused_anvil_pre_watershed")
    timed(fused, "fused_anvil_post_watershed")
    timed(seglabel, "flat_label")
    timed(seglabel, "_warped_neighbour_labels")
    timed(seglabel, "_overlap_edges")
    timed(Flow, "watershed", label="flow.watershed")
    timed(ulabels, "labeled_comprehension")
    timed(ulabels, "slice_labels")
    timed(ulabels, "make_step_labels")
    timed(det, "find_object_lengths")
    timed(det, "mask_labels")
    timed(det, "remap_labels")

    # (the per-frame sweep plan is traced inside each frame's map body —
    # ops.convolve._flow_frame_plan — so there is no host plan to report)

    timer = StageTimer(verbose=True)
    opts = DetectionOptions(save_label_props=False, save_field_props=False)
    ds = Dataset(coords=coords)
    t0 = time.perf_counter()
    ds = run_detection(da(bt_v, "bt"), da(wvd_v, "wvd"), da(swd_v, "swd"), ds,
                       opts=opts, timer=timer)
    total = time.perf_counter() - t0

    print("\n=== stages ===")
    for k, v in timer.summary().items():
        print(f"{k:>16}: {v:8.2f} s")
    print(f"{'TOTAL':>16}: {total:8.2f} s")
    print("\n=== inner accumulators ===")
    for k, (s, n) in sorted(ACC.items(), key=lambda kv: -kv[1][0]):
        print(f"{k:>28}: {s:8.2f} s  ({n} calls)")


if __name__ == "__main__":
    main()
