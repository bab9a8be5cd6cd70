"""Schema-layer tests: full post-detection bookkeeping on a synthetic scene."""

import numpy as np
import pytest

from tests.synthetic import growing_storm_scene
from tobac_flow_tpu.core.flow import create_flow
from tobac_flow_tpu.data.ncdataset import Dataset
from tobac_flow_tpu.detect import detect_anvils, detect_cores, get_anvil_markers
from tobac_flow_tpu.schema import (
    add_label_coords,
    add_step_labels,
    calculate_label_properties,
    flag_edge_labels,
    flag_nan_adjacent_labels,
    link_cores_and_anvils,
    link_step_labels,
)


@pytest.fixture(scope="module")
def detection_ds():
    bt, wvd, swd = growing_storm_scene()
    flow = create_flow(bt, smoothing_passes=1)
    cores = detect_cores(flow, bt, wvd, swd)
    field = wvd - swd
    markers = get_anvil_markers(flow, field)
    thick = detect_anvils(flow, field, markers=markers)
    thin = detect_anvils(flow, wvd + swd, markers=thick)

    ds = Dataset(
        coords={"t": bt.coords["t"], "y": bt.coords["y"], "x": bt.coords["x"]}
    )
    ds["bt"] = bt
    ds["core_label"] = cores
    ds["thick_anvil_label"] = thick
    ds["thin_anvil_label"] = thin
    add_step_labels(ds)
    ds = add_label_coords(ds)
    link_cores_and_anvils(ds)
    link_step_labels(ds)
    flag_edge_labels(ds)
    flag_nan_adjacent_labels(ds, bt)
    calculate_label_properties(ds)
    return ds


def test_coords_present(detection_ds):
    ds = detection_ds
    for c in ("core", "anvil", "core_step", "thick_anvil_step", "thin_anvil_step"):
        assert c in ds.coords
        assert ds.coords[c].size >= 1


def test_core_anvil_link(detection_ds):
    ds = detection_ds
    idx = ds["core_anvil_index"].values
    assert idx.shape == (ds.coords["core"].size,)
    # the storm core must link to an anvil
    assert (idx > 0).any()
    counts = ds["anvil_core_count"].values
    assert counts.sum() == (idx > 0).sum()


def test_cores_painted_into_anvils(detection_ds):
    ds = detection_ds
    core_vals = ds["core_label"].values
    thick = ds["thick_anvil_label"].values
    idx = ds["core_anvil_index"].values
    for core, anvil in zip(ds.coords["core"], idx):
        if anvil > 0:
            wh = core_vals == core
            assert (thick[wh] == anvil).all()


def test_step_links(detection_ds):
    ds = detection_ds
    csi = ds["core_step_core_index"].values
    assert csi.shape == (ds.coords["core_step"].size,)
    assert (csi > 0).all()


def test_edge_flags(detection_ds):
    ds = detection_ds
    for name, dim in [
        ("core_edge_label_flag", "core"),
        ("core_start_label_flag", "core"),
        ("core_end_label_flag", "core"),
        ("thick_anvil_edge_label_flag", "anvil"),
    ]:
        assert ds[name].values.shape == (ds.coords[dim].size,)
    # the growing storm persists to the end of the window
    assert ds["thick_anvil_end_label_flag"].values.any()


def test_nan_flags_all_false_for_clean_data(detection_ds):
    ds = detection_ds
    assert not ds["core_nan_flag"].values.any()


def test_label_properties(detection_ds):
    ds = detection_ds
    pix = ds["core_pixel_count"].values
    assert (pix > 0).all()
    area = ds["core_total_area"].values
    assert (area > 0).all()
    lifetime = ds["core_lifetime"].values
    assert (lifetime.astype("timedelta64[m]").astype(int) >= 0).all()
    # step areas grow over the storm's life for the thick anvil
    sa = ds["thick_anvil_step_area"].values
    assert sa.max() > sa.min()
    assert "thick_anvil_max_area" in ds.data_vars
    assert "core_start_x" in ds.data_vars
    assert "anvil_start_x" in ds.data_vars


def test_netcdf_roundtrip(detection_ds, tmp_path):
    from tobac_flow_tpu.data.ncdataset import open_dataset

    path = tmp_path / "schema.nc"
    detection_ds.to_netcdf(path)
    back = open_dataset(path)
    assert np.array_equal(
        back["core_label"].values, detection_ds["core_label"].values
    )
    assert back["core_anvil_index"].values.shape == (
        detection_ds.coords["core"].size,
    )
