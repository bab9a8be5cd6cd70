"""Decompose the residual watershed-vs-heap anvil gap by mechanism.

TIE_SENSITIVITY.json shows the reference heap is *insensitive* to seed
push-order permutation (ref-vs-ref IoU 1.0), so the remaining deviation
(TPU-vs-ref 0.94 thick / 0.89 thin) is NOT seed-age degeneracy.  Two
suspects remain:

1. **Premature convergence** — the production watershed stops after
   ``grace`` rounds without label changes, but claims keep relaxing and a
   later claim crossing can still flip labels; the multigrid V-cycle's
   adopted upper-bound claims lengthen exactly that tail.
2. **Tie semantics** — at exact (claim, claim2) ties the device falls back
   to hop count then label id, while the heap's pop clock recurses through
   the full descending path-value profile and within-plateau BFS order.

This probe runs the thick-anvil stage of the tie-sensitivity scene under
variants that isolate (1): production, long grace, no multigrid, both.  If
IoU climbs with grace/multigrid changes, the gap is convergence, not ties.
Disagreeing pixels are also categorised (ref>0 vs tpu=0 / ref=0 vs tpu>0 /
both>0 different) to show where the fuzz lives.

Usage:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/ws_tie_probe.py
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

from parity_detect import make_multistorm_scene, object_iou  # noqa: E402
from tie_sensitivity import anvil_watershed_inputs, clean_labels  # noqa: E402


def categorise(ref, tpu):
    ref = np.asarray(ref)
    tpu = np.asarray(tpu)
    diff = ref != tpu
    return {
        "n_diff": int(diff.sum()),
        "ref_pos_tpu_zero": int((diff & (ref > 0) & (tpu == 0)).sum()),
        "ref_zero_tpu_pos": int((diff & (ref == 0) & (tpu > 0)).sum()),
        "both_pos_differ": int((diff & (ref > 0) & (tpu > 0)).sum()),
    }


def main(t=16, h=256, w=384, seed=0):
    from cpu_reference import CpuFlow

    import parity_detect as pd

    from tobac_flow_tpu.core.flow import create_flow
    from tobac_flow_tpu.detect import get_anvil_markers
    from tobac_flow_tpu.native import flow_watershed_host
    from tobac_flow_tpu.ops.watershed import watershed

    bt_v, wvd_v, swd_v = make_multistorm_scene(t, h, w, seed=seed)
    wvd = pd._da(wvd_v, "wvd")
    swd = pd._da(swd_v, "swd")
    flow_fields = create_flow(
        bt_v, vr_steps=1, smoothing_passes=1, interp_method="cubic"
    )
    cpu_flow = CpuFlow(flow_fields.forward_flow, flow_fields.backward_flow)
    markers = np.asarray(
        get_anvil_markers(
            cpu_flow, wvd - swd, threshold=-5.0, overlap=0.5, absolute_overlap=4
        ).values
    )
    edges, eroded = anvil_watershed_inputs(
        cpu_flow, wvd_v - swd_v, markers, -12.5, -5.0, erode=2
    )

    t0 = time.perf_counter()
    ref_raw = flow_watershed_host(
        flow_fields.forward_flow, flow_fields.backward_flow, edges, eroded
    )
    ref = clean_labels(ref_raw, markers)
    print(f"oracle heap: {time.perf_counter() - t0:.1f}s", flush=True)

    conn = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    variants = [
        ("production", dict()),
        ("grace16", dict(grace=16)),
        ("no_multigrid", dict(multigrid=False)),
        ("grace16_no_mg", dict(grace=16, multigrid=False)),
        ("grace64_no_mg_iters4x", dict(grace=64, multigrid=False,
                                       max_iters=4 * (t + h + w + 32))),
        ("r21", dict(radius=21)),
    ]
    if len(sys.argv) > 1:  # run only the named variants
        wanted = set(sys.argv[1:])
        variants = [v for v in variants if v[0] in wanted]
    report = {}
    for name, kw in variants:
        t0 = time.perf_counter()
        raw = watershed(
            flow_fields.forward_flow,
            flow_fields.backward_flow,
            np.asarray(edges),
            eroded,
            connectivity=conn,
            **kw,
        )
        dt = time.perf_counter() - t0
        labels = clean_labels(raw, markers)
        mean_iou, min_iou = object_iou(ref, labels)[:2]
        cats = categorise(ref, labels)
        report[name] = {
            "mean_iou": round(float(mean_iou), 4),
            "min_iou": round(float(min_iou), 4),
            "elapsed_s": round(dt, 1),
            **cats,
        }
        print(name, json.dumps(report[name]), flush=True)

    out = Path(__file__).parent.parent / "WS_TIE_PROBE.json"
    out.write_text(json.dumps(report, indent=2))
    return report


if __name__ == "__main__":
    main()
