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

    detect_json = Path(__file__).parent.parent / "PARITY_DETECT.json"
    if detect_json.exists():
        import json

        report = json.loads(detect_json.read_text())
        lines += [
            "",
            "## Detect-chain parity (tools/parity_detect.py)",
            "",
            "The full `detect_cores -> get_anvil_markers -> detect_anvils`",
            "chain over the package op stack vs the reference-semantics CPU",
            "stack, identical flow fields injected into both.  Two warp",
            "modes: `banded` is the TPU production path (separable",
            "banded-shift warps, exact for locally smooth flow); `exact` is",
            "per-pixel 2D gathers, cv2.remap-faithful to its 1/32",
            "fixed-point quantisation.",
            "",
            "| scene:mode | growth max diff (K/min) | cores IoU | anvil-marker IoU | thick IoU / co-label | thin IoU / co-label |",
            "|---|---|---|---|---|---|",
        ]
        banded_core_min = min(
            v["cores"]["mean_iou"]
            for k, v in report.items()
            if k.endswith(":banded")
        )
        for key, v in report.items():
            lines.append(
                f"| {key} | {v['growth_field_max_abs_diff']:.3f} "
                f"| {v['cores']['mean_iou']:.3f} "
                f"| {v['anvil_markers']['mean_iou']:.3f} "
                f"| {v['thick_anvils']['mean_iou']:.3f} / {v['thick_anvils']['colabel_agreement']:.3f} "
                f"| {v['thin_anvils']['mean_iou']:.3f} / {v['thin_anvils']['colabel_agreement']:.3f} |"
            )
        lines += [
            "",
            "Reading: the dense growth fields match cv2 to its fixed-point",
            "quantisation and core objects are identical (IoU 1.0) in BOTH",
            "modes — the production `banded` path is the exact 2D",
            "bounded-displacement factorisation (ops/banded.warp_banded_exact:",
            "both displacement components evaluated at the destination pixel,",
            f"cv2.remap-faithful; banded cores IoU min {banded_core_min:.3f}).",
            "`exact` is the per-pixel XLA-gather instrument it is verified",
            "against.  Anvil co-label agreement ~1.0 shows the watershed",
            "assigns the same basin wherever both stacks label a pixel; the",
            "residual anvil IoU gap is footprint fuzz at the anvil rims",
            "against the -1 barrier seeds.  The tie-sensitivity study below",
            "tests (and REFUTES) the round-2 hypothesis that this fuzz is",
            "heap push-age degeneracy; tools/ws_tie_probe.py decomposes the",
            "actual mechanism (see WS_TIE_PROBE.json).",
        ]

    tie_json = Path(__file__).parent.parent / "TIE_SENSITIVITY.json"
    if tie_json.exists():
        import json

        tie = json.loads(tie_json.read_text())
        lines += [
            "",
            "## Watershed tie-class sensitivity (tools/tie_sensitivity.py)",
            "",
            f"Scene {tie['scene']}: the C++ heap oracle re-run with",
            f"{tie['thick_anvil']['n_perms']} seed push-order permutations",
            "(the reference's own tie-breaking freedom,",
            "``_watershed.pyx:308-337``), pairwise per-object IoU, vs the",
            "TPU watershed's deviation from each oracle run.",
            "",
            "| stage | ref-vs-ref mean IoU (min/mean) | ref-vs-ref min-object IoU | TPU-vs-ref mean IoU (min/mean) | TPU-vs-ref min-object IoU | TPU inside ref spread |",
            "|---|---|---|---|---|---|",
        ]
        for stage in ("thick_anvil", "thin_anvil"):
            v = tie[stage]
            lines.append(
                f"| {stage} "
                f"| {v['ref_vs_ref_mean_iou']['min']:.4f} / {v['ref_vs_ref_mean_iou']['mean']:.4f} "
                f"| {v['ref_vs_ref_min_iou']:.4f} "
                f"| {v['tpu_vs_ref_mean_iou']['min']:.4f} / {v['tpu_vs_ref_mean_iou']['mean']:.4f} "
                f"| {v['tpu_vs_ref_min_iou']:.4f} "
                f"| {'yes' if v['tpu_inside_ref_spread'] else 'NO'} |"
            )
        lines += [
            "",
            "Measured result: the reference heap's answer is INVARIANT to",
            "seed push-order permutation (ref-vs-ref IoU 1.0), so the",
            "residual anvil IoU gap is NOT seed-age tie degeneracy — the",
            "round-2 hand-wave is refuted, not confirmed.  The deviation is",
            "a real algorithmic difference between the device relaxation",
            "(hop-count tie-breaking, grace-bounded convergence, multigrid",
            "upper-bound adoption) and the serial heap; its mechanism is",
            "decomposed by tools/ws_tie_probe.py (WS_TIE_PROBE.json).",
        ]
    probe_json = Path(__file__).parent.parent / "WS_TIE_PROBE.json"
    if probe_json.exists():
        import json

        probe = json.loads(probe_json.read_text())
        lines += [
            "",
            "## Gap decomposition (tools/ws_tie_probe.py)",
            "",
            "Thick-anvil stage of the tie-sensitivity scene under variants",
            "isolating premature convergence (grace rounds / multigrid",
            "upper-bound adoption) from genuine tie-semantics differences:",
            "",
            "| variant | mean object IoU | min object IoU | diff px | ref>0,tpu=0 | ref=0,tpu>0 | both>0 differ |",
            "|---|---|---|---|---|---|---|",
        ]
        for name, v in probe.items():
            if not isinstance(v, dict) or "mean_iou" not in v:
                continue
            lines.append(
                f"| {name} | {v['mean_iou']:.4f} | {v['min_iou']:.4f} "
                f"| {v.get('n_diff', '-')} | {v.get('ref_pos_tpu_zero', '-')} "
                f"| {v.get('ref_zero_tpu_pos', '-')} "
                f"| {v.get('both_pos_differ', '-')} |"
            )

    Path(__file__).parent.parent.joinpath("PARITY.md").write_text("\n".join(lines))
    print("wrote PARITY.md")


if __name__ == "__main__":
    main()
