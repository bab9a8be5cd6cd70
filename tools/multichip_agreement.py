"""Single-chip vs 8-device-mesh agreement at a non-toy shape (VERDICT r3 #9).

Runs the COMPLETE sharded detection chain (``parallel/pipeline.py:
sharded_detect_all`` — flow science, anvil markers, thick watershed,
overlap-threshold relabel, thin watershed) over a virtual 8-device CPU mesh
on a multi-cell storm scene large enough that halo and cross-shard label
reconciliation bugs actually surface, against the single-chip functions
under injected identical flows, and records the agreement as
``MULTICHIP_AGREEMENT.json``.

Usage:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    python tools/multichip_agreement.py -t 16 -y 512 -x 768
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["PALLAS_AXON_POOL_IPS"] = ""
os.environ["JAX_PLATFORMS"] = "cpu"

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

import numpy as np  # noqa: E402


def agreement(sh, sc):
    both = (sh != 0) | (sc != 0)
    if not both.any():
        return 1.0
    return float((sh[both] == sc[both]).mean())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-t", type=int, default=16)
    ap.add_argument("-y", type=int, default=512)
    ap.add_argument("-x", type=int, default=768)
    ap.add_argument("--n_t", type=int, default=4, help="mesh t-shards")
    ap.add_argument("--n_x", type=int, default=2, help="mesh x-shards")
    ap.add_argument("--ws_sweeps", type=int, default=64)
    args = ap.parse_args()

    import jax

    from parity_detect import make_multistorm_scene  # noqa: E402

    from tobac_flow_tpu.core.flow import Flow, create_flow
    from tobac_flow_tpu.detect.detection import (
        detect_anvils,
        detect_cores,
        get_anvil_markers,
        relabel_anvils,
    )
    from tobac_flow_tpu.parallel.pipeline import make_mesh, sharded_detect_all

    t, h, w = args.t, args.y, args.x
    print(f"devices: {jax.devices()}", flush=True)
    print(f"scene {t}x{h}x{w}", flush=True)
    bt, wvd, swd = make_multistorm_scene(t, h, w)
    bt_v, wvd_v, swd_v = (np.asarray(a, np.float32) for a in (bt, wvd, swd))

    t0 = time.time()
    cf = create_flow(bt_v, vr_steps=1, smoothing_passes=1, interp_method="cubic")
    fwd = np.clip(np.asarray(cf.forward_flow), -6, 6)
    bwd = np.clip(np.asarray(cf.backward_flow), -6, 6)
    flow = Flow(fwd, bwd)
    print(f"flow {time.time() - t0:.1f}s", flush=True)

    mesh = make_mesh(n_t=args.n_t, n_x=args.n_x)
    t0 = time.time()
    out = sharded_detect_all(
        mesh, bt_v, wvd_v, swd_v, flows=(fwd, bwd),
        hx=24, warp_radius=6, ws_sweeps=args.ws_sweeps,
    )
    sharded_s = time.time() - t0
    print(f"sharded chain {sharded_s:.1f}s", flush=True)

    t0 = time.time()
    field = wvd_v - swd_v
    markers_sc = np.asarray(
        get_anvil_markers(
            flow, field, threshold=-5.0, overlap=0.5,
            absolute_overlap=4, min_length=3,
        )
    )
    thick_sc = np.asarray(
        detect_anvils(
            flow, field, markers=markers_sc, upper_threshold=-5.0,
            lower_threshold=-12.5, erode_distance=2, min_length=3,
        )
    )
    thick_sc = np.asarray(
        relabel_anvils(
            flow, thick_sc, markers=markers_sc, overlap=0.5,
            absolute_overlap=4, min_length=3,
        )
    )
    thin_sc = np.asarray(
        detect_anvils(
            flow, wvd_v + swd_v, markers=thick_sc, upper_threshold=0.0,
            lower_threshold=-7.5, erode_distance=2, min_length=3,
        )
    )
    single_s = time.time() - t0
    print(f"single-chip chain {single_s:.1f}s", flush=True)

    report = {
        "shape": [t, h, w],
        "mesh": {"t": args.n_t, "x": args.n_x},
        "n_devices": len(jax.devices()),
        "anvil_markers_exact": bool(
            np.array_equal(out["anvil_marker_labels"], markers_sc)
        ),
        "n_markers": int(markers_sc.max()),
        "thick_agreement": agreement(out["thick_anvil_labels"], thick_sc),
        "thin_agreement": agreement(out["thin_anvil_labels"], thin_sc),
        "n_thick_sc": int(thick_sc.max()),
        "n_thick_sh": int(out["thick_anvil_labels"].max()),
        "n_thin_sc": int(thin_sc.max()),
        "n_thin_sh": int(out["thin_anvil_labels"].max()),
        "sharded_s": round(sharded_s, 1),
        "single_chip_s": round(single_s, 1),
    }
    print(json.dumps(report, indent=2), flush=True)
    (REPO / "MULTICHIP_AGREEMENT.json").write_text(json.dumps(report, indent=2))


if __name__ == "__main__":
    main()
