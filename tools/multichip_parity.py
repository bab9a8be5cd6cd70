"""Multi-chip parity artifact at a non-toy shape (VERDICT r3 #9).

Runs the COMPLETE sharded detection chain (flow science, anvil markers,
thick watershed, overlap relabel, thin watershed — parallel/pipeline.py:
sharded_detect_all) over the virtual 8-device CPU mesh at a shape where
halo and cross-shard reconciliation bugs actually surface, and compares
against the single-chip chain under injected identical flows.  Writes
MULTICHIP_PARITY.json at the repo root.

Usage:
    PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
    python tools/multichip_parity.py [-t 16 -y 512 -x 768]

Reference scale contract: /root/reference/scripts/dcc_detect_goes.py:42-45
(the sharded step mirrors the single-chip science of detection.py:372-687).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import numpy as np  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-t", default=16, type=int)
    parser.add_argument("-y", default=512, type=int)
    parser.add_argument("-x", default=768, type=int)
    parser.add_argument("--seed", default=2, type=int)
    parser.add_argument("--no-write", action="store_true")
    args = parser.parse_args(argv)
    t, h, w = args.t, args.y, args.x

    import jax

    from tests.synthetic import growing_storm_scene
    from tobac_flow_tpu.core.flow import Flow, create_flow
    from tobac_flow_tpu.detect.detection import (
        detect_anvils,
        get_anvil_markers,
        relabel_anvils,
    )
    from tobac_flow_tpu.parallel.mesh import make_mesh
    from tobac_flow_tpu.parallel.pipeline import sharded_detect_all

    n_dev = len(jax.devices())
    assert n_dev >= 8, f"need 8 virtual devices, got {n_dev}"

    print(f"scene {t}x{h}x{w} over {n_dev} devices", flush=True)
    bt, wvd, swd = growing_storm_scene(t=t, h=h, w=w, seed=args.seed)
    bt_v = np.asarray(bt.values)
    wvd_v = np.asarray(wvd.values)
    swd_v = np.asarray(swd.values)
    cf = create_flow(bt_v, vr_steps=1, smoothing_passes=1,
                     interp_method="cubic")
    fwd = np.clip(np.asarray(cf.forward_flow), -6, 6)
    bwd = np.clip(np.asarray(cf.backward_flow), -6, 6)
    flow = Flow(fwd, bwd)

    mesh = make_mesh(n_t=4, n_x=2)
    t0 = time.perf_counter()
    out = sharded_detect_all(
        mesh, bt_v, wvd_v, swd_v, flows=(fwd, bwd),
        hx=24, warp_radius=6, ws_sweeps=max(64, t + max(h, w) // 4),
    )
    t_sharded = time.perf_counter() - t0
    print(f"sharded chain: {t_sharded:.1f}s", flush=True)

    # single-chip chain, same thresholds (cli/common.py defaults)
    t0 = time.perf_counter()
    markers_sc = np.asarray(
        get_anvil_markers(
            flow, wvd_v - swd_v, threshold=-5.0, overlap=0.5,
            absolute_overlap=4, min_length=3,
        )
    )
    thick_sc = np.asarray(
        detect_anvils(
            flow, wvd_v - swd_v, markers=markers_sc, upper_threshold=-5.0,
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
    t_single = time.perf_counter() - t0
    print(f"single-chip chain: {t_single:.1f}s", flush=True)

    result = {
        "metric": "sharded full detection chain vs single chip "
        "(markers exact; watershed partition agreement on labeled px)",
        "shape": [t, h, w],
        "mesh": {"t": 4, "x": 2},
        "n_devices": n_dev,
        "sharded_s": round(t_sharded, 1),
        "single_chip_s": round(t_single, 1),
        "markers_exact": bool(
            np.array_equal(out["anvil_marker_labels"], markers_sc)
        ),
        "n_markers": int(markers_sc.max()),
    }
    for key, sc in (
        ("thick_anvil_labels", thick_sc),
        ("thin_anvil_labels", thin_sc),
    ):
        sh = np.asarray(out[key])
        both = (sh != 0) | (sc != 0)
        agree = float((sh[both] == sc[both]).mean()) if both.any() else 1.0
        result[key.replace("_labels", "") + "_agreement"] = round(agree, 5)
        result["n_" + key.replace("_labels", "s")] = int(sc.max())
    print(json.dumps(result, indent=2))
    ok = (
        result["markers_exact"]
        and result["thick_anvil_agreement"] >= 0.99
        and result["thin_anvil_agreement"] >= 0.99
    )
    result["ok"] = bool(ok)
    if not args.no_write:
        (REPO / "MULTICHIP_PARITY.json").write_text(
            json.dumps(result, indent=2)
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
