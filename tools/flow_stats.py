"""Displacement-magnitude statistics of the production flow on the e2e scene.

Informs the banded-warp band sizing: the exact 2D banded warp costs
O(band_y x band_x) masked taps, and the band is currently sized by the
whole-volume max |displacement| — this prints per-chunk maxima and
percentiles to show how much of that cost is a tail artefact.

Usage (TPU): python tools/flow_stats.py -t 288 -y 512 -x 768
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")


def main():
    p = argparse.ArgumentParser()
    p.add_argument("-t", default=288, type=int)
    p.add_argument("-y", default=512, type=int)
    p.add_argument("-x", default=768, type=int)
    p.add_argument("--chunk", default=48, type=int)
    args = p.parse_args()

    from bench_e2e import make_day_scene
    from tobac_flow_tpu.core.flow import create_flow

    t, h, w = args.t, args.y, args.x
    cache = Path(f"/tmp/bench_e2e_scene_{t}x{h}x{w}_cNone_s0.npz")
    if cache.exists():
        bt = np.load(cache)["bt"]
    else:
        bt, _, _ = make_day_scene(t, h, w)

    t0 = time.perf_counter()
    flow = create_flow(bt, model="Farneback", vr_steps=1, smoothing_passes=1,
                       interp_method="cubic")
    fwd = np.asarray(flow.forward_flow)
    bwd = np.asarray(flow.backward_flow)
    print(f"flow computed in {time.perf_counter() - t0:.1f} s")

    for name, arr in (("fwd", fwd), ("bwd", bwd)):
        mag = np.abs(arr)
        for ci, cname in ((0, "dx"), (1, "dy")):
            m = mag[..., ci]
            qs = np.percentile(m, [50, 90, 99, 99.9, 99.99])
            print(f"{name}.{cname}: max={m.max():6.2f}  p50={qs[0]:5.2f} "
                  f"p90={qs[1]:5.2f} p99={qs[2]:5.2f} p99.9={qs[3]:5.2f} "
                  f"p99.99={qs[4]:5.2f}")
        # per-chunk maxima (the band a chunked dispatch would need)
        cmax = []
        for s in range(0, t, args.chunk):
            mm = mag[s:s + args.chunk]
            cmax.append((float(mm[..., 1].max()), float(mm[..., 0].max())))
        print(f"{name} per-{args.chunk}-frame chunk (max_dy, max_dx):",
              " ".join(f"({a:.1f},{b:.1f})" for a, b in cmax))
        # per-frame max histogram
        fmax = mag.reshape(t, -1, 2).max(axis=1)
        print(f"{name} frames with max>=20: {(fmax.max(-1) >= 20).sum()}/{t}; "
              f">=10: {(fmax.max(-1) >= 10).sum()}; "
              f">=6: {(fmax.max(-1) >= 6).sum()}; "
              f"median per-frame max: {np.median(fmax.max(-1)):.2f}")


if __name__ == "__main__":
    main()
