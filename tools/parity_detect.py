"""End-to-end detection-chain parity: TPU op stack vs reference-semantics CPU
stack (tools/cpu_reference.CpuFlow) under IDENTICAL science code.

Runs detect_cores → get_anvil_markers → detect_anvils (thick + thin) on a
multi-cell advecting storm scene (>= 20 competing cells) at several sizes,
once over the package's Flow (banded warps, device CCL, Jacobi watershed) and
once over CpuFlow (cv2.remap warps, scipy CCL, serial heap watershed), with
the same flow fields injected into both — so every difference measured is an
op-stack difference.  Reports per-object best-match IoU.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/parity_detect.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))


def make_multistorm_scene(t, h, w, n_cells=24, seed=0):
    """>= 20 competing convective cells advecting at 2 px/frame, each with
    its own phase/depth so watershed basins genuinely compete."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    cy = rng.uniform(0.15 * h, 0.85 * h, n_cells)
    cx = rng.uniform(0.1 * w, 0.6 * w, n_cells)
    radius = rng.uniform(h / 24, h / 12, n_cells)
    phase = rng.uniform(0.0, 0.4, n_cells)
    bt = np.empty((t, h, w), np.float32)
    wvd = np.empty((t, h, w), np.float32)
    swd = np.empty((t, h, w), np.float32)
    for i in range(t):
        prog = i / max(t - 1, 1)
        core_sum = np.zeros((h, w))
        for k in range(n_cells):
            g = min(max((prog - phase[k]) / 0.5, 0.0), 1.0)
            if g <= 0:
                continue
            r2 = (xx - cx[k] - 2.0 * i) ** 2 + (yy - cy[k] - 0.5 * i) ** 2
            core_sum += g * np.exp(-r2 / (2 * radius[k] ** 2))
        core_sum = np.minimum(core_sum, 1.2)
        bt[i] = 290.0 - 80.0 * core_sum + rng.normal(0, 0.3, (h, w))
        wvd[i] = -15.0 + 16.0 * core_sum + rng.normal(0, 0.2, (h, w))
        swd[i] = 5.0 - 4.0 * core_sum + rng.normal(0, 0.1, (h, w))
    return bt, wvd, swd


def object_iou(a, b):
    """Per-object best-match IoU between two label rasters.

    Returns (mean IoU over a's objects weighted by size, worst IoU,
    n_objects_a, n_objects_b)."""
    a = np.asarray(a).ravel().astype(np.int64)
    b = np.asarray(b).ravel().astype(np.int64)
    na, nb = int(a.max()), int(b.max())
    if na == 0 or nb == 0:
        return (1.0 if na == nb else 0.0), (1.0 if na == nb else 0.0), na, nb
    wh = (a > 0) & (b > 0)
    keys = a[wh] * (nb + 1) + b[wh]
    uniq, counts = np.unique(keys, return_counts=True)
    ua, ub = uniq // (nb + 1), uniq % (nb + 1)
    size_a = np.bincount(a, minlength=na + 1)
    size_b = np.bincount(b, minlength=nb + 1)
    iou = counts / (size_a[ua] + size_b[ub] - counts)
    best = np.zeros(na + 1)
    np.maximum.at(best, ua, iou)
    weights = size_a[1:]
    present = weights > 0
    mean_iou = float(np.average(best[1:][present], weights=weights[present]))
    return mean_iou, float(best[1:][present].min()), na, nb


def run_chain(flow_obj, bt, wvd, swd):
    from tobac_flow_tpu.detect import detect_anvils, detect_cores, get_anvil_markers

    cores = np.asarray(
        detect_cores(flow_obj, bt, wvd, swd, overlap=0.5, absolute_overlap=4).values
    )
    markers = get_anvil_markers(
        flow_obj, wvd - swd, threshold=-5.0, overlap=0.5, absolute_overlap=4
    )
    thick = detect_anvils(
        flow_obj, wvd - swd, markers=markers,
        upper_threshold=-5.0, lower_threshold=-12.5, erode_distance=2,
    )
    thin = detect_anvils(
        flow_obj, wvd + swd, markers=thick,
        upper_threshold=0.0, lower_threshold=-7.5, erode_distance=2,
    )
    return cores, np.asarray(markers.values), np.asarray(thick.values), np.asarray(
        thin.values
    )


def _da(vals, name):
    from tobac_flow_tpu.data.ncdataset import DataArray

    t, h, w = vals.shape
    return DataArray(
        vals,
        coords={
            "t": np.datetime64("2020-06-01T00:00", "ns")
            + np.arange(t) * np.timedelta64(300, "s"),
            "y": np.arange(h, dtype=float),
            "x": np.arange(w, dtype=float),
        },
        dims=("t", "y", "x"),
        name=name,
    )


def parity_at(t, h, w, seed=0):
    from cpu_reference import CpuFlow

    from tobac_flow_tpu.core.flow import Flow, create_flow

    bt_v, wvd_v, swd_v = make_multistorm_scene(t, h, w, seed=seed)
    bt, wvd, swd = _da(bt_v, "bt"), _da(wvd_v, "wvd"), _da(swd_v, "swd")
    flow = create_flow(bt_v, vr_steps=1, smoothing_passes=1, interp_method="cubic")
    tpu_flow = Flow(flow.forward_flow, flow.backward_flow)
    cpu_flow = CpuFlow(flow.forward_flow, flow.backward_flow)

    tpu_out = run_chain(tpu_flow, bt, wvd, swd)
    cpu_out = run_chain(cpu_flow, bt, wvd, swd)
    result = {}
    for name, mine, ref in zip(
        ("cores", "anvil_markers", "thick_anvils", "thin_anvils"), tpu_out, cpu_out
    ):
        mean_iou, min_iou, n_mine, n_ref = object_iou(ref, mine)
        result[name] = {
            "mean_iou": round(mean_iou, 4),
            "min_iou": round(min_iou, 4),
            "n_ref": n_ref,
            "n_tpu": n_mine,
        }
    return result


def main():
    sizes = [(12, 192, 256), (16, 256, 384), (16, 384, 512)]
    report = {}
    for t, h, w in sizes:
        key = f"{t}x{h}x{w}"
        print(f"== {key} ==", flush=True)
        report[key] = parity_at(t, h, w)
        print(json.dumps(report[key], indent=2), flush=True)
    print(json.dumps(report))
    return report


if __name__ == "__main__":
    main()
