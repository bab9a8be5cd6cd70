"""Offline analysis of the thin-anvil barrier-vs-positive tie loss.

Loads /tmp/thin_gap_inputs.npz (written by tools/thin_gap_probe.py), floods
the barrier seeds and the positive seeds in ISOLATION, and at every gap
pixel (heap says positive, mixed TPU flood said barrier) compares the two
waves' full lex tuples (claim, hops, gate) to attribute the loss to the
component that decided it.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/thin_state_analysis.py
"""

from __future__ import annotations

import json
import os
import sys
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))


def flood_state(fwd, bwd, edges, markers, dump):
    os.environ["TFT_WS_DUMP_STATE"] = dump
    from tobac_flow_tpu.ops.watershed import watershed

    conn = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    watershed(fwd, bwd, edges, markers, connectivity=conn)
    os.environ.pop("TFT_WS_DUMP_STATE", None)
    z = np.load(dump)
    return z["claim"], z["claim2"], z["meta"]


def main():
    z = np.load("/tmp/thin_gap_inputs.npz")
    edges, eroded = z["edges"], z["eroded"]
    raw_tpu, raw_cpu = z["raw_tpu"], z["raw_cpu"]
    fwd, bwd = z["fwd"], z["bwd"]

    gap = (raw_cpu > 0) & (raw_tpu == -1)
    neg = np.where(eroded < 0, eroded, 0).astype(np.int32)
    pos = np.where(eroded > 0, eroded, 0).astype(np.int32)

    nc, nc2, nm = flood_state(fwd, bwd, edges, neg, "/tmp/ws_neg.npz")
    pc, pc2, pm = flood_state(fwd, bwd, edges, pos, "/tmp/ws_pos.npz")

    nh, ph = nm >> 23, pm >> 23
    g = gap
    rep = {
        "n_gap": int(g.sum()),
        "claim_neg_lt": int((nc[g] < pc[g]).sum()),
        "claim_tie": int((nc[g] == pc[g]).sum()),
        "claim_pos_lt": int((pc[g] < nc[g]).sum()),
    }
    ct = g & (nc == pc)
    rep["claim_tie_hops_neg_lt"] = int((nh[ct] < ph[ct]).sum())
    rep["claim_tie_hops_tie"] = int((nh[ct] == ph[ct]).sum())
    rep["claim_tie_hops_pos_lt"] = int((ph[ct] < nh[ct]).sum())
    ht = ct & (nh == ph)
    rep["hops_tie_gate_neg_lt"] = int((nc2[ht] < pc2[ht]).sum())
    rep["hops_tie_gate_tie"] = int((nc2[ht] == pc2[ht]).sum())
    rep["hops_tie_gate_pos_lt"] = int((pc2[ht] < nc2[ht]).sum())

    # distribution of the deciding hop difference where hops decided for neg
    hd = g & (nc == pc) & (nh < ph)
    if hd.any():
        d = (ph[hd] - nh[hd]).astype(int)
        rep["hops_margin"] = {
            "min": int(d.min()), "median": float(np.median(d)),
            "max": int(d.max()),
            "pos_hops_saturated_255": int((ph[hd] == 255).sum()),
        }
    # where in (t, field value) do the hop-decided losses live?
    if hd.any():
        per_frame = [int(x) for x in hd.sum(axis=(1, 2))]
        rep["hops_decided_per_frame"] = per_frame
        rep["field_at_losses"] = {
            "min": float(edges[hd].min()), "max": float(edges[hd].max()),
        }
        rep["claim_eq_field"] = int((nc[hd] == edges[hd]).sum())

    print(json.dumps(rep, indent=2))
    Path(REPO / "THIN_STATE_ANALYSIS.json").write_text(json.dumps(rep, indent=2))


if __name__ == "__main__":
    main()
