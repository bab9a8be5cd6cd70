"""Detection-layer tests: reference contracts
(/root/reference/tests/test_detection.py — watershed mask and edge field) and
an end-to-end synthetic growing-storm detection."""

import numpy as np
import pytest

from tests.synthetic import growing_storm_scene
from tobac_flow_tpu.core.flow import Flow, create_flow
from tobac_flow_tpu.data.ncdataset import DataArray
from tobac_flow_tpu.detect import (
    detect_anvils,
    detect_cores,
    get_anvil_markers,
    get_combined_edge_field,
    get_watershed_mask,
    relabel_anvils,
)


def zero_flow_obj(shape):
    z = np.zeros(shape + (2,), dtype=np.float32)
    return Flow(z, z)


# --- reference contracts (tests/test_detection.py) ---------------------------


def test_get_watershed_mask_erosion():
    field = np.ones((5, 10, 10), np.float32)
    field[:, 4:6, 4:6] = -1  # small negative region erodes away
    mask = get_watershed_mask(field, erode_distance=1)
    assert not mask.any()

    field2 = np.ones((5, 12, 12), np.float32)
    field2[:, 2:10, 2:10] = -1  # large negative region survives erosion
    mask2 = get_watershed_mask(field2, erode_distance=1)
    assert mask2[:, 4:8, 4:8].all()
    assert not mask2[:, 0, 0].any()


def test_get_watershed_mask_nan_stays_masked():
    field = np.ones((3, 8, 8), np.float32)
    field[:, 3, 3] = np.nan
    mask = get_watershed_mask(field, erode_distance=1)
    assert mask[:, 3, 3].all()


def test_get_combined_edge_field_contract():
    # flat field: edges=0 -> result is -field; NaN -> +inf
    field = np.full((3, 9, 9), 0.5, np.float32)
    field[:, 0, 0] = np.nan
    flow = zero_flow_obj(field.shape)
    edges = get_combined_edge_field(flow, field)
    assert np.isinf(edges[:, 0, 0]).all()
    inner = edges[:, 3:6, 3:6]
    assert np.allclose(inner, -0.5, atol=1e-4)


# --- end-to-end synthetic storm ---------------------------------------------


@pytest.fixture(scope="module")
def storm():
    bt, wvd, swd = growing_storm_scene()
    flow = create_flow(bt, model="Farneback", vr_steps=0, smoothing_passes=1)
    return bt, wvd, swd, flow


def test_detect_cores_finds_growing_storm(storm):
    bt, wvd, swd, flow = storm
    cores = detect_cores(flow, bt, wvd, swd)
    assert isinstance(cores, DataArray)
    assert cores.name == "core_label"
    vals = cores.values
    assert vals.max() >= 1
    # the core must sit on the storm centre track
    hit = 0
    for i in range(4, bt.shape[0]):
        cx, cy = 30 + 2 * i, 40 + 1 * i
        if vals[i, int(cy) - 3 : int(cy) + 4, int(cx) - 3 : int(cx) + 4].any():
            hit += 1
    assert hit >= 3


def test_anvil_pipeline(storm):
    bt, wvd, swd, flow = storm
    field = wvd - swd
    markers = get_anvil_markers(flow, field)
    assert markers.values.max() >= 1
    anvils = detect_anvils(flow, field, markers=markers)
    assert anvils.values.max() >= 1
    # anvil must cover the late-stage cold cloud
    i = bt.shape[0] - 2
    cx, cy = 30 + 2 * i, 40 + 1 * i
    assert anvils.values[i, int(cy) - 2 : int(cy) + 3, int(cx) - 2 : int(cx) + 3].any()
    relabelled = relabel_anvils(flow, anvils, markers=markers.values)
    assert relabelled.values.max() >= 1
