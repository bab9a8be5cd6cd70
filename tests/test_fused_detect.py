"""Fused detection stages (detect/fused.py) vs the op-by-op science layer.

The fused single-dispatch programs must be bit-identical to the op-by-op
path they replace — detect_cores / get_anvil_markers / detect_anvils run the
same inner jitted ops either way, so label rasters must agree exactly.
"""

import numpy as np
import pytest

from tests.synthetic import growing_storm_scene

from tobac_flow_tpu.core.flow import create_flow
from tobac_flow_tpu.detect import detect_anvils, detect_cores, get_anvil_markers
from tobac_flow_tpu.detect import fused as fused_mod


@pytest.fixture(scope="module")
def scene():
    bt, wvd, swd = growing_storm_scene(t=10, h=96, w=128, seed=4)
    flow = create_flow(
        np.asarray(bt.values), vr_steps=1, smoothing_passes=1, interp_method="cubic"
    )
    return bt, wvd, swd, flow


def _run_chain(flow, bt, wvd, swd):
    cores = np.asarray(
        detect_cores(flow, bt, wvd, swd, overlap=0.5, absolute_overlap=4).values
    )
    markers = get_anvil_markers(
        flow, wvd - swd, threshold=-5.0, overlap=0.5, absolute_overlap=4
    )
    thick = detect_anvils(
        flow, wvd - swd, markers=markers,
        upper_threshold=-5.0, lower_threshold=-12.5, erode_distance=2,
    )
    return cores, np.asarray(markers.values), np.asarray(thick.values)


def test_fused_chain_matches_op_by_op(scene):
    bt, wvd, swd, flow = scene
    prev = fused_mod.set_fused_detect(True)
    try:
        assert fused_mod.supports_fused(flow)
        cores_f, markers_f, thick_f = _run_chain(flow, bt, wvd, swd)
        fused_mod.set_fused_detect(False)
        cores_o, markers_o, thick_o = _run_chain(flow, bt, wvd, swd)
    finally:
        fused_mod.set_fused_detect(prev)
    assert np.array_equal(cores_f, cores_o)
    assert np.array_equal(markers_f, markers_o)
    assert np.array_equal(thick_f, thick_o)
    assert cores_f.max() > 0  # the scene actually detects something
    assert thick_f.max() > 0


def test_cpu_parity_stack_not_hijacked():
    # CpuFlow subclasses Flow for API reuse but carries its own op stack —
    # the fused device programs must NOT be keyed off the base class
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).parent.parent / "tools"))
    from cpu_reference import CpuFlow

    z = np.zeros((2, 4, 4, 2), np.float32)
    assert not fused_mod.supports_fused(CpuFlow(z, z))

    from tobac_flow_tpu.core.flow import Flow

    assert fused_mod.supports_fused(Flow(z, z))


def test_fused_core_markers_chunked_matches_whole(scene, monkeypatch):
    bt, wvd, swd, flow = scene
    whole, bt_area, wvd_area = fused_mod.fused_core_markers(
        flow, bt, wvd, swd, use_wvd=True, wvd_threshold=0.25, bt_threshold=0.5
    )
    # force the host time-chunked path (tiny budget -> 4-frame chunks)
    monkeypatch.setattr(fused_mod, "BUDGET_PX", 1)
    chunked, bt_area_c, wvd_area_c = fused_mod.fused_core_markers(
        flow, bt, wvd, swd, use_wvd=True, wvd_threshold=0.25, bt_threshold=0.5
    )
    assert np.array_equal(whole, chunked)
    assert (bt_area, wvd_area) == (bt_area_c, wvd_area_c)


def test_fused_anvil_pre_chunked_matches_whole(scene, monkeypatch):
    bt, wvd, swd, flow = scene
    markers = get_anvil_markers(
        flow, wvd - swd, threshold=-5.0, overlap=0.5, absolute_overlap=4
    )
    edges_w, seeds_w = fused_mod.fused_anvil_pre_watershed(
        flow, wvd - swd, np.asarray(markers.values), -12.5, -5.0, 2
    )
    monkeypatch.setattr(fused_mod, "BUDGET_PX", 1)
    edges_c, seeds_c = fused_mod.fused_anvil_pre_watershed(
        flow, wvd - swd, np.asarray(markers.values), -12.5, -5.0, 2
    )
    assert np.array_equal(np.asarray(seeds_w), np.asarray(seeds_c))
    ew, ec = np.asarray(edges_w), np.asarray(edges_c)
    same_nan = np.array_equal(np.isfinite(ew), np.isfinite(ec))
    assert same_nan
    ok = np.isfinite(ew)
    assert np.allclose(ew[ok], ec[ok], atol=1e-5)


def test_fused_anvil_pre_chunked_host_stitch_matches(scene, monkeypatch):
    """Above DEVICE_STITCH_BUDGET_BYTES the chunked outputs stitch on host —
    values must match the device-stitched form exactly."""
    bt, wvd, swd, flow = scene
    markers = get_anvil_markers(
        flow, wvd - swd, threshold=-5.0, overlap=0.5, absolute_overlap=4
    )
    monkeypatch.setattr(fused_mod, "BUDGET_PX", 1)
    edges_d, seeds_d = fused_mod.fused_anvil_pre_watershed(
        flow, wvd - swd, np.asarray(markers.values), -12.5, -5.0, 2
    )
    monkeypatch.setattr(fused_mod, "DEVICE_STITCH_BUDGET_BYTES", 0)
    edges_h, seeds_h = fused_mod.fused_anvil_pre_watershed(
        flow, wvd - swd, np.asarray(markers.values), -12.5, -5.0, 2
    )
    assert isinstance(edges_h, np.ndarray)
    assert np.array_equal(np.asarray(seeds_d), seeds_h)
    ed = np.asarray(edges_d)
    assert np.array_equal(np.isfinite(ed), np.isfinite(edges_h))
    ok = np.isfinite(ed)
    assert np.allclose(ed[ok], edges_h[ok], atol=1e-6)
