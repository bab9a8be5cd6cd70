"""Fused device pipeline vs the exact modular path, and vs the CPU
reference reconstruction (bench oracle): the banded/approx fast path must
reproduce the reference-semantics labels at IoU >= 0.99."""

import numpy as np
import jax
import pytest


def iou(a, b):
    inter = np.logical_and(a != 0, b != 0).sum()
    union = np.logical_or(a != 0, b != 0).sum()
    return inter / union if union else 1.0


@pytest.fixture(scope="module")
def scene():
    import bench

    return jax.block_until_ready(bench.make_scene_device(8, 160, 224))


def test_fused_matches_cpu_reference(scene):
    import bench

    markers, n_markers = bench.make_markers(np.asarray(scene))
    assert n_markers >= 5  # the scene must yield competing basins
    _, nlab = bench.tpu_pipeline(scene, markers)
    _, l2 = bench.cpu_reference_pipeline(np.asarray(scene), markers=markers)
    n2 = int((l2 != 0).sum())
    assert nlab > 0
    # foreground pixel counts agree closely (boundary ties only)
    assert abs(nlab - n2) / max(n2, 1) < 0.02


def test_fused_labels_iou_vs_cpu(scene):
    """Multi-marker minimax assignment parity: the same per-cell seeds go to
    both stacks, so label agreement checks which basin wins each pixel — not
    just flood extent."""
    from tobac_flow_tpu.pipeline import fused_flow_watershed
    import bench

    markers, _ = bench.make_markers(np.asarray(scene))
    _, _, _, labels = fused_flow_watershed(scene, 5.0, markers=markers)
    labels = np.asarray(labels)
    _, oracle = bench.cpu_reference_pipeline(np.asarray(scene), markers=markers)
    assert iou(labels, oracle) >= 0.98
    both = (labels != 0) & (oracle != 0)
    assert both.any()
    assert (labels[both] == oracle[both]).mean() >= 0.97


def test_multigrid_watershed_matches_flat(scene):
    from tobac_flow_tpu.pipeline import _fields_stage
    from tobac_flow_tpu.ops.watershed import watershed

    fwd, bwd, growth, field, edges = _fields_stage(scene, 5.0)
    markers = np.asarray((field >= 1.0)).astype(np.int32)
    mask = np.asarray(field > 0.05)
    with_mg = watershed(fwd, bwd, edges, markers, mask=mask, multigrid=True)
    without = watershed(fwd, bwd, edges, markers, mask=mask, multigrid=False)
    assert iou(with_mg, without) >= 0.99
    agree = (with_mg == without).mean()
    assert agree > 0.99


def test_midrun_checkpoint_bounds_memory(tmp_path):
    """The mid-run checkpoint (reference dcc_detect_goes.py:191-213,275-284)
    moves the core-label dataset to disk during anvil detection: outputs are
    identical and the traced host-memory peak drops."""
    import tracemalloc

    import numpy as np

    from tobac_flow_tpu.cli.common import DetectionOptions, run_detection
    from tobac_flow_tpu.cli.dcc_detect_synthetic import make_scene
    from tobac_flow_tpu.data.ncdataset import Dataset

    ckpt_path = tmp_path / "mid.checkpoint.nc"

    def run(checkpoint):
        tracemalloc.start()
        bt, wvd, swd = make_scene(12, 128, 160, 0)
        ds = Dataset(
            coords={"t": bt.coords["t"], "y": bt.coords["y"], "x": bt.coords["x"]}
        )
        opts = DetectionOptions(
            save_label_props=False,
            save_field_props=False,
            checkpoint_path=ckpt_path if checkpoint else None,
        )
        out = run_detection(bt, wvd, swd, ds, opts=opts)
        _, peak = tracemalloc.get_traced_memory()
        tracemalloc.stop()
        return out, peak

    plain, peak_plain = run(False)
    assert not ckpt_path.exists()
    ckpt, peak_ckpt = run(True)
    assert not ckpt_path.exists()  # removed after the reopen

    for var in ("core_label", "thick_anvil_label", "thin_anvil_label"):
        np.testing.assert_array_equal(plain[var].values, ckpt[var].values)
    assert peak_ckpt < peak_plain, (
        f"checkpointed peak {peak_ckpt} not below plain peak {peak_plain}"
    )
