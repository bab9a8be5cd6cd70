"""Classify watershed-vs-heap disputed pixels by exact minimax class costs.

For every pixel where the serial heap and the TPU flood disagree on the
thick-anvil scene, compute the exact minimax arrival cost from (a) the -1
barrier seed set and (b) the positive marker seed set over the heap's own
directed graph (native flow_watershed_costs), then bucket:

  * ``neg_lt_pos``  — the -1 wave's bottleneck is strictly lower: minimax
    itself says -1, so the HEAP deviates from minimax here (shouldn't
    happen if the heap is pure priority-flood);
  * ``tie``         — equal bottlenecks: only the heap's age clock
    arbitrates; the achievable ceiling for any cost-based device flood;
  * ``pos_lt_neg``  — the positive wave's bottleneck is strictly lower:
    the TPU flood assigned a label its own claims cannot justify — a real
    cost/graph bug on the device side.

Usage:  python tools/ws_claim_probe.py   (TPU; CPU with the usual env)
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


def main(t=16, h=256, w=384, seed=0):
    from cpu_reference import CpuFlow

    import parity_detect as pd

    from tobac_flow_tpu.core.flow import create_flow
    from tobac_flow_tpu.detect import get_anvil_markers
    from tobac_flow_tpu.native import (
        flow_watershed_costs_host,
        flow_watershed_host,
    )
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
    eroded = np.asarray(eroded)

    fwd, bwd = flow_fields.forward_flow, flow_fields.backward_flow
    t0 = time.perf_counter()
    ref_raw = flow_watershed_host(fwd, bwd, edges, eroded)
    ref = clean_labels(ref_raw, markers)
    print(f"oracle heap: {time.perf_counter() - t0:.1f}s", flush=True)

    t0 = time.perf_counter()
    neg_cost = flow_watershed_costs_host(fwd, bwd, edges, eroded < 0)
    pos_cost = flow_watershed_costs_host(fwd, bwd, edges, eroded > 0)
    print(f"class Dijkstras: {time.perf_counter() - t0:.1f}s", flush=True)

    conn = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    variants = [("production", {}), ("no_multigrid", dict(multigrid=False))]
    if len(sys.argv) > 1:
        wanted = set(sys.argv[1:])
        variants = [v for v in variants if v[0] in wanted]
    report = {}
    for name, kw in variants:
        raw = np.asarray(
            watershed(fwd, bwd, np.asarray(edges), eroded, connectivity=conn,
                      **kw)
        )
        labels = clean_labels(raw, markers)
        mean_iou, min_iou = object_iou(ref, labels)[:2]
        diff = (ref != labels) & (ref > 0)
        buckets = {}
        for bname, msk in [
            ("tpu_neg", diff & (raw < 0)),
            ("tpu_zero_raw", diff & (raw == 0)),
            ("tpu_other_pos", diff & (raw > 0)),
        ]:
            nc, pc = neg_cost[msk], pos_cost[msk]
            buckets[bname] = {
                "n": int(msk.sum()),
                "neg_lt_pos": int((nc < pc).sum()),
                "tie": int((nc == pc).sum()),
                "pos_lt_neg": int((nc > pc).sum()),
            }
        report[name] = {
            "mean_iou": round(float(mean_iou), 4),
            "min_iou": round(float(min_iou), 4),
            **buckets,
        }
        print(name, json.dumps(report[name]), flush=True)

    Path("WS_CLAIM_PROBE.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
