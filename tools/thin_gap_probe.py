"""Classify the thin-anvil footprint gap (12x192x256, THIN_FOOTPRINT_PROBE
mean IoU 0.956) at the RAW watershed level: from identical fused-prep inputs
(edges + eroded markers), run the TPU flood and the C++ heap oracle, and
bucket every disagreeing pixel by what the TPU flood actually did there —
claimed by barrier (-1), left unclaimed (0), or claimed by the wrong label —
and by what the post pass (clamp/opening/marker-override) then changed.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/thin_gap_probe.py
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


def main(t=12, h=192, w=256, seed=0):
    bt_v, wvd_v, swd_v = make_multistorm_scene(t, h, w, seed=seed)
    bt, wvd, swd = _da(bt_v, "bt"), _da(wvd_v, "wvd"), _da(swd_v, "swd")
    flow = create_flow(bt_v, vr_steps=1, smoothing_passes=1, interp_method="cubic")
    tpu_flow = Flow(flow.forward_flow, flow.backward_flow)
    cpu_flow = CpuFlow(flow.forward_flow, flow.backward_flow)

    _, _, thick_cpu, _ = run_chain(cpu_flow, bt, wvd, swd)
    markers = thick_cpu.astype(np.int32)

    from tobac_flow_tpu.detect import fused as _fused

    field = (wvd + swd)
    edges, eroded = _fused.fused_anvil_pre_watershed(
        tpu_flow, field, markers, -7.5, 0.0, 2
    )
    edges_np = np.asarray(edges, np.float32)
    eroded_np = np.asarray(eroded, np.int32)

    conn = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    import os as _os

    _os.environ["TFT_WS_DUMP_STATE"] = "/tmp/thin_ws_state.npz"
    raw_tpu = np.asarray(
        tpu_flow.watershed(edges_np, eroded_np, mask=None, connectivity=conn)
    )
    _os.environ.pop("TFT_WS_DUMP_STATE", None)
    raw_cpu = np.asarray(
        cpu_flow.watershed(edges_np, eroded_np, mask=None, connectivity=conn)
    )
    np.savez(
        "/tmp/thin_gap_inputs.npz",
        edges=edges_np, eroded=eroded_np, raw_tpu=raw_tpu, raw_cpu=raw_cpu,
        fwd=np.asarray(flow.forward_flow), bwd=np.asarray(flow.backward_flow),
        markers=markers,
    )

    mean_iou, min_iou, n_t, n_c = object_iou(
        np.maximum(raw_cpu, 0), np.maximum(raw_tpu, 0)
    )
    dis = raw_tpu != raw_cpu
    rep = {
        "scene": f"{t}x{h}x{w}",
        "raw": {
            "mean_iou": round(mean_iou, 4),
            "min_iou": round(min_iou, 4),
            "n_disagree": int(dis.sum()),
        },
    }
    cpu_pos = raw_cpu > 0
    rep["raw"]["cpu_pos_tpu_barrier"] = int((cpu_pos & (raw_tpu == -1)).sum())
    rep["raw"]["cpu_pos_tpu_unclaimed"] = int((cpu_pos & (raw_tpu == 0)).sum())
    rep["raw"]["cpu_pos_tpu_otherlabel"] = int(
        (cpu_pos & (raw_tpu > 0) & dis).sum()
    )
    rep["raw"]["cpu_barrier_tpu_pos"] = int(((raw_cpu == -1) & (raw_tpu > 0)).sum())
    rep["raw"]["cpu_unclaimed_tpu_pos"] = int(((raw_cpu == 0) & (raw_tpu > 0)).sum())
    per_frame = [int(x) for x in (cpu_pos & (raw_tpu == -1)).sum(axis=(1, 2))]
    rep["raw"]["cpu_pos_tpu_barrier_per_frame"] = per_frame

    # exact minimax class costs over the heap's own graph: does minimax
    # itself say barrier at the disagreeing pixels (heap deviates from
    # minimax via arrival races), is it an exact tie (age clock arbitraries),
    # or does the positive wave have the strictly lower bottleneck (our
    # claim/graph bug)?
    from tobac_flow_tpu.native import flow_watershed_costs_host

    fwd, bwd = flow.forward_flow, flow.backward_flow
    neg_cost = flow_watershed_costs_host(fwd, bwd, edges_np, eroded_np < 0)
    pos_cost = flow_watershed_costs_host(fwd, bwd, edges_np, eroded_np > 0)
    gap = cpu_pos & (raw_tpu == -1)
    nc, pc = neg_cost[gap], pos_cost[gap]
    rep["gap_minimax"] = {
        "neg_lt_pos": int((nc < pc).sum()),
        "tie": int((nc == pc).sum()),
        "pos_lt_neg": int((pc < nc).sum()),
    }

    # post pass on both, then the footprint diff the IoU metric sees
    post_tpu = _fused.fused_anvil_post_watershed(raw_tpu, markers)
    post_cpu = _fused.fused_anvil_post_watershed(raw_cpu, markers)
    m2, mn2, _, _ = object_iou(post_cpu, post_tpu)
    rep["post"] = {
        "mean_iou": round(m2, 4),
        "min_iou": round(mn2, 4),
        "only_cpu": int(((post_cpu > 0) & (post_tpu == 0)).sum()),
        "only_tpu": int(((post_tpu > 0) & (post_cpu == 0)).sum()),
    }

    print(json.dumps(rep, indent=2))
    Path(REPO / "THIN_GAP_PROBE.json").write_text(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
