"""Isolate the thin-anvil footprint gap (PARITY_DETECT 12x192x256 min-object
IoU 0.72): run BOTH op stacks' thin-anvil watershed from IDENTICAL (CPU
reference) thick markers, so any remaining difference is the flood itself,
not inherited thick-marker drift; then classify the disagreeing pixels by
their linearised edge cost (finite vs saturated).

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/thin_footprint_probe.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from cpu_reference import CpuFlow  # noqa: E402
from parity_detect import _da, make_multistorm_scene, object_iou, run_chain  # noqa: E402

from tobac_flow_tpu.core.flow import Flow, create_flow  # noqa: E402
from tobac_flow_tpu.detect import detect_anvils  # noqa: E402


def main(t=12, h=192, w=256, seed=0):
    bt_v, wvd_v, swd_v = make_multistorm_scene(t, h, w, seed=seed)
    bt, wvd, swd = _da(bt_v, "bt"), _da(wvd_v, "wvd"), _da(swd_v, "swd")
    flow = create_flow(bt_v, vr_steps=1, smoothing_passes=1, interp_method="cubic")
    tpu_flow = Flow(flow.forward_flow, flow.backward_flow)
    cpu_flow = CpuFlow(flow.forward_flow, flow.backward_flow)

    # CPU chain up to thick anvils (the shared seed source)
    _, _, thick_cpu, thin_cpu_own = run_chain(cpu_flow, bt, wvd, swd)
    thick_da = _da(thick_cpu.astype(np.int32), "thick")

    def thin(fl):
        return np.asarray(
            detect_anvils(
                fl, wvd + swd, markers=thick_da,
                upper_threshold=0.0, lower_threshold=-7.5, erode_distance=2,
            ).values
        )

    thin_tpu = thin(tpu_flow)
    thin_cpu = thin(cpu_flow)

    mean_iou, min_iou, n_t, n_c = object_iou(thin_cpu, thin_tpu)
    both = (thin_tpu > 0) & (thin_cpu > 0)
    colabel = float((thin_tpu[both] == thin_cpu[both]).mean()) if both.any() else 1.0

    only_tpu = (thin_tpu > 0) & (thin_cpu == 0)
    only_cpu = (thin_cpu > 0) & (thin_tpu == 0)

    report = {
        "scene": f"{t}x{h}x{w}",
        "same_markers": {
            "mean_iou": round(mean_iou, 4),
            "min_iou": round(min_iou, 4),
            "colabel": round(colabel, 4),
            "n_cpu": n_c,
            "n_tpu": n_t,
            "px_only_tpu": int(only_tpu.sum()),
            "px_only_cpu": int(only_cpu.sum()),
        },
    }

    # classify disagreement pixels by the linearised field the flood sees
    from tobac_flow_tpu.detect.detection import linearise_field

    lin = linearise_field(np.asarray(wvd_v + swd_v), -7.5, 0.0)
    for name, m in (("only_tpu", only_tpu), ("only_cpu", only_cpu)):
        if m.any():
            v = lin[m]
            report[name + "_field"] = {
                "n": int(m.sum()),
                "finite": int(np.isfinite(v).sum()),
                "min": float(np.nanmin(v)),
                "max": float(np.nanmax(v)),
            }
    # per-frame distribution of the gap (boundary frames vs interior)
    report["only_cpu_per_frame"] = [int(x) for x in only_cpu.sum(axis=(1, 2))]
    report["only_tpu_per_frame"] = [int(x) for x in only_tpu.sum(axis=(1, 2))]

    print(json.dumps(report, indent=2))
    (REPO / "THIN_FOOTPRINT_PROBE.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:5]) if len(sys.argv) > 1 else ())


