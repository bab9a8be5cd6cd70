"""Dump local geometry of watershed-vs-heap tie pixels (diagnostic).

Runs the no-multigrid flood with TFT_WS_DUMP_STATE, picks a few disputed
(tpu=-1, ref>0, exact-cost-tie) pixels and prints 9x9 windows of the edge
field, seeds, ref labels, our labels, and our (claim, gate, hops) state.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))
sys.path.insert(0, str(Path(__file__).parent))

os.environ["TFT_WS_DUMP_STATE"] = "/tmp/ws_state.npz"

from parity_detect import make_multistorm_scene  # noqa: E402
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
    edges = np.asarray(edges)
    fwd, bwd = flow_fields.forward_flow, flow_fields.backward_flow

    ref_raw = flow_watershed_host(fwd, bwd, edges, eroded)
    ref = clean_labels(ref_raw, markers)
    neg_cost = flow_watershed_costs_host(fwd, bwd, edges, eroded < 0)
    pos_cost = flow_watershed_costs_host(fwd, bwd, edges, eroded > 0)

    conn = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    raw = np.asarray(
        watershed(fwd, bwd, edges, eroded, connectivity=conn, multigrid=False)
    )
    labels = clean_labels(raw, markers)
    st = np.load("/tmp/ws_state.npz")
    claim, gate, meta = st["claim"], st["claim2"], st["meta"]
    hops = meta >> 23
    lab = (meta & ((1 << 23) - 1)) - 2

    diff = (ref != labels) & (ref > 0) & (raw < 0) & (neg_cost == pos_cost)
    idx = np.argwhere(diff)
    print(f"{len(idx)} tie-dispute pixels; dumping 4 spread samples")
    np.set_printoptions(linewidth=250, precision=3, suppress=True)
    for k in np.linspace(0, len(idx) - 1, 4).astype(int):
        tt, yy, xx = idx[k]
        y0, y1 = max(yy - 4, 0), min(yy + 5, h)
        x0, x1 = max(xx - 4, 0), min(xx + 5, w)
        s = np.s_[tt, y0:y1, x0:x1]
        print(f"\n=== pixel (t={tt}, y={yy}, x={xx}) "
              f"neg=pos cost {neg_cost[tt, yy, xx]:.4f}, "
              f"claim={claim[tt, yy, xx]:.4f} ===")
        print("edges:\n", edges[s])
        print("seeds:\n", eroded[s])
        print("ref:\n", ref_raw[s])
        print("ours:\n", raw[s])
        print("claim:\n", claim[s])
        print("gate:\n", gate[s])
        print("hops:\n", hops[s])
        print("negcost:\n", neg_cost[s])
        print("poscost:\n", pos_cost[s])


if __name__ == "__main__":
    main()
