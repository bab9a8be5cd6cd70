"""Label-fidelity report: fused TPU pipeline vs the CPU reference-semantics
reconstruction (cv2 Farneback + remap warps + serial heap watershed).

Writes PARITY.md with foreground IoU and per-pixel agreement at several
scene sizes — the BASELINE.md "label IoU >= 0.99" evidence.

Usage: PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python tools/parity_report.py
(or run on the TPU by omitting the env overrides)
"""

from __future__ import annotations

import sys
from datetime import datetime
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np


def main():
    import jax

    import bench
    from tobac_flow_tpu.pipeline import fused_flow_watershed

    rows = []
    for t, h, w in [(6, 128, 192), (8, 256, 384), (10, 384, 512)]:
        scene = jax.block_until_ready(bench.make_scene_device(t, h, w))
        markers, n_markers = bench.make_markers(np.asarray(scene))
        _, _, _, labels = fused_flow_watershed(scene, 5.0, markers=markers)
        ours = np.asarray(labels)
        _, oracle = bench.cpu_reference_pipeline(np.asarray(scene), markers=markers)
        inter = np.logical_and(ours != 0, oracle != 0).sum()
        union = np.logical_or(ours != 0, oracle != 0).sum()
        iou = inter / union if union else 1.0
        both = (ours != 0) & (oracle != 0)
        agree = (ours[both] == oracle[both]).mean() if both.any() else 1.0
        rows.append((f"{t}x{h}x{w}", n_markers, iou, agree, int(union)))
        print(rows[-1], flush=True)

    lines = [
        "# PARITY — fused TPU pipeline vs CPU reference reconstruction",
        "",
        f"Generated {datetime.now().isoformat()} by tools/parity_report.py.",
        "",
        "The CPU oracle reconstructs the reference compute path with the same",
        "native libraries the reference uses (cv2 pyramidal Farneback, cv2.remap",
        "warps, a serial (value, age)-heap watershed — cf.",
        "/root/reference/tobac_flow/flow.py, convolve.py, _watershed.pyx).",
        "",
        "Watershed seeds: one label per storm cell (3D CCL of the core",
        "threshold, shared by both stacks) — label agreement measures the",
        "multi-marker minimax assignment across competing basins.",
        "",
        "| scene (t,y,x) | markers | foreground IoU | label agreement | union px |",
        "|---|---|---|---|---|",
    ]
    for name, n_markers, iou, agree, union in rows:
        lines.append(
            f"| {name} | {n_markers} | {iou:.4f} | {agree:.4f} | {union} |"
        )
    lines.append("")
    lines.append(
        "Gate: BASELINE.md requires label IoU >= 0.99 vs the CPU reference."
    )
    Path(__file__).parent.parent.joinpath("PARITY.md").write_text("\n".join(lines))
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
