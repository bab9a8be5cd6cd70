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


def make_multistorm_scene(t, h, w, n_cells=None, seed=0):
    """Competing convective cells advecting at 2 px/frame on a jittered grid.

    Cells are sized and grown so the detection chain's discrete decisions
    (overlap-linking counts, length/cooling filters) sit comfortably away
    from their thresholds: this measures op-stack equivalence, not the
    knife-edge behaviour of integer thresholds under ~1e-6 interpolation
    differences (which flips identically re-run reference configurations
    too)."""
    rng = np.random.default_rng(seed)
    if n_cells is None:
        n_cells = max(6, min(24, (h * w) // 8000))
    cols = int(np.ceil(np.sqrt(n_cells * 1.5)))
    rows = int(np.ceil(n_cells / cols))
    pitch_y = 0.72 * h / rows
    pitch_x = 0.55 * w / cols
    ks = np.arange(n_cells)
    cy = 0.14 * h + (ks // cols + 0.5 + rng.uniform(-0.15, 0.15, n_cells)) * pitch_y
    cx = 0.04 * w + (ks % cols + 0.5 + rng.uniform(-0.15, 0.15, n_cells)) * pitch_x
    pitch = min(pitch_y, pitch_x)
    radius = rng.uniform(pitch / 5.0, pitch / 3.2, n_cells)
    phase = rng.uniform(0.0, 0.3, n_cells)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    bt = np.empty((t, h, w), np.float32)
    wvd = np.empty((t, h, w), np.float32)
    swd = np.empty((t, h, w), np.float32)
    for i in range(t):
        prog = i / max(t - 1, 1)
        core_sum = np.zeros((h, w))
        for k in range(n_cells):
            g = min(max((prog - phase[k]) / 0.35, 0.0), 1.0)
            if g <= 0:
                continue
            r2 = (xx - cx[k] - 2.0 * i) ** 2 + (yy - cy[k] - 0.5 * i) ** 2
            core_sum += g * np.exp(-r2 / (2 * radius[k] ** 2))
        core_sum = np.minimum(core_sum, 1.2)
        bt[i] = 290.0 - 80.0 * core_sum + rng.normal(0, 0.15, (h, w))
        wvd[i] = -15.0 + 16.0 * core_sum + rng.normal(0, 0.1, (h, w))
        swd[i] = 5.0 - 4.0 * core_sum + rng.normal(0, 0.05, (h, w))
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

    # field-level op parity: the same science code over both op stacks must
    # produce near-identical dense growth fields (threshold chaos aside)
    from tobac_flow_tpu.detect.detection import get_growth_rate

    g_tpu = np.asarray(get_growth_rate(tpu_flow, bt, method="cubic"))
    g_cpu = np.asarray(get_growth_rate(cpu_flow, bt, method="cubic"))
    ok = np.isfinite(g_tpu) & np.isfinite(g_cpu)
    growth_max_diff = float(np.abs(g_tpu[ok] - g_cpu[ok]).max())

    tpu_out = run_chain(tpu_flow, bt, wvd, swd)
    cpu_out = run_chain(cpu_flow, bt, wvd, swd)
    result = {"growth_field_max_abs_diff": round(growth_max_diff, 6)}
    for name, mine, ref in zip(
        ("cores", "anvil_markers", "thick_anvils", "thin_anvils"), tpu_out, cpu_out
    ):
        mean_iou, min_iou, n_mine, n_ref = object_iou(ref, mine)
        both = (np.asarray(mine) > 0) & (np.asarray(ref) > 0)
        colabel = (
            float((np.asarray(mine)[both] == np.asarray(ref)[both]).mean())
            if both.any()
            else 1.0
        )
        result[name] = {
            "mean_iou": round(mean_iou, 4),
            "min_iou": round(min_iou, 4),
            "colabel_agreement": round(colabel, 4),
            "n_ref": n_ref,
            "n_tpu": n_mine,
        }
    return result


def main():
    """Two warp modes per scene:

    - ``banded``  — the TPU production path: the exact 2D banded warp
      (``ops/banded.warp_banded_exact``) — the true bilinear/cubic gather
      factorised over the y-floor band with destination-evaluated x
      weights, gather-free and cv2-faithful (since the round-2 separable
      approximation cost core co-label parity on rough flow).
    - ``exact``   — per-pixel 2D ``jnp.take`` gathers (``ops/warp``),
      bitwise-faithful to cv2.remap up to its 1/32 fixed-point
      quantisation; the parity instrument, not a production path.

    ``colabel_agreement`` isolates the watershed assignment: on pixels both
    stacks label positively, does the same basin win?  The residual IoU gap
    beyond that is footprint fuzz at equal-minimax-cost plateau boundaries
    (the serial heap resolves those by push age, a tie class by
    construction)."""
    from tobac_flow_tpu.ops.convolve import set_fast_warp

    sizes = [(12, 192, 256), (16, 256, 384), (16, 384, 512)]
    report = {}
    for t, h, w in sizes:
        for mode in ("banded", "exact"):
            set_fast_warp(mode == "banded")
            key = f"{t}x{h}x{w}:{mode}"
            print(f"== {key} ==", flush=True)
            report[key] = parity_at(t, h, w)
            print(json.dumps(report[key], indent=2), flush=True)
    set_fast_warp(True)
    print(json.dumps(report))
    Path(__file__).parent.parent.joinpath("PARITY_DETECT.json").write_text(
        json.dumps(report, indent=2)
    )
    return report


if __name__ == "__main__":
    main()
