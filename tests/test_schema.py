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


# -- output-variable contract vs the reference statistics files ---------------

# frozen inventory derived from reference postprocess.py:313-1314 (every
# dataset["..."] assignment in process_core_properties,
# process_thick/thin_anvil_properties and add_validity_flags, minus the
# commented-out core_max_cooling_rate_t at reference postprocess.py:428)
CORE_MANIFEST = [
    "core_initial_core_step_index",
    "core_start_x", "core_start_y", "core_start_lat", "core_start_lon",
    "core_start_t",
    "core_end_x", "core_end_y", "core_end_lat", "core_end_lon", "core_end_t",
    "core_lifetime",
    "core_average_x", "core_average_y", "core_average_lat", "core_average_lon",
    "core_average_area", "core_total_area", "core_max_area", "core_max_area_t",
    "core_max_area_core_step_index",
    "core_min_bt_t", "core_min_bt_core_step_index",
    "core_max_cooling_rate", "core_max_cooling_rate_core_step_index",
    "core_min_ctt_t", "core_min_ctt_core_step_index",
    "core_ctt_cooling_rate", "core_ctt_cooling_rate_core_step_index",
    "core_min_ctt_corrected_t", "core_min_ctt_corrected_core_step_index",
    "core_ctt_corrected_cooling_rate",
    "core_ctt_corrected_cooling_rate_core_step_index",
    "core_max_cth_t", "core_max_cth_core_step_index",
    "core_cth_growth_rate", "core_cth_growth_rate_core_step_index",
    "core_max_cth_corrected_t", "core_max_cth_corrected_core_step_index",
    "core_cth_corrected_growth_rate",
    "core_cth_corrected_growth_rate_core_step_index",
    "core_propagation_direction", "core_propagation_speed",
]
THICK_MANIFEST = [
    "thick_anvil_initial_thick_anvil_step_index",
    "thick_anvil_start_x", "thick_anvil_start_y", "thick_anvil_start_lat",
    "thick_anvil_start_lon", "thick_anvil_start_t",
    "thick_anvil_end_x", "thick_anvil_end_y", "thick_anvil_end_lat",
    "thick_anvil_end_lon", "thick_anvil_end_t", "thick_anvil_lifetime",
    "thick_anvil_average_x", "thick_anvil_average_y", "thick_anvil_average_lat",
    "thick_anvil_average_lon", "thick_anvil_average_area",
    "thick_anvil_total_area", "thick_anvil_max_area", "thick_anvil_max_area_t",
    "thick_anvil_max_area_thick_anvil_step_index",
    "thick_anvil_min_bt_t", "thick_anvil_min_bt_thick_anvil_step_index",
    "thick_anvil_min_ctt_t", "thick_anvil_min_ctt_thick_anvil_step_index",
    "thick_anvil_min_ctt_corrected_t",
    "thick_anvil_min_ctt_corrected_thick_anvil_step_index",
    "thick_anvil_max_cth_t", "thick_anvil_max_cth_thick_anvil_step_index",
    "thick_anvil_max_cth_corrected_thick_anvil_step_index",
    "anvil_propagation_direction", "anvil_propagation_speed",
]
THIN_MANIFEST = [
    "thin_anvil_initial_thin_anvil_step_index",
    "thin_anvil_start_x", "thin_anvil_start_y", "thin_anvil_start_lat",
    "thin_anvil_start_lon", "thin_anvil_start_t",
    "thin_anvil_end_x", "thin_anvil_end_y", "thin_anvil_end_lat",
    "thin_anvil_end_lon", "thin_anvil_end_t", "thin_anvil_lifetime",
    "thin_anvil_average_x", "thin_anvil_average_y", "thin_anvil_average_lat",
    "thin_anvil_average_lon", "thin_anvil_average_area",
    "thin_anvil_total_area", "thin_anvil_max_area", "thin_anvil_max_area_t",
    "thin_anvil_max_area_thin_anvil_step_index",
    "thin_anvil_min_bt_t", "thin_anvil_min_bt_thin_anvil_step_index",
    "thin_anvil_min_ctt_t", "thin_anvil_min_ctt_thin_anvil_step_index",
    "thin_anvil_min_ctt_corrected_t",
    "thin_anvil_min_ctt_corrected_thin_anvil_step_index",
    "thin_anvil_max_cth_t", "thin_anvil_max_cth_thin_anvil_step_index",
    "thin_anvil_max_cth_corrected_t",
    "thin_anvil_max_cth_corrected_thin_anvil_step_index",
]
VALIDITY_MANIFEST = [
    "core_has_anvil_flag", "core_anvil_removed", "anvil_core_count",
    "anvil_initial_core_index", "anvil_no_growth_flag",
    "anvil_no_initial_core_flag", "core_is_valid", "thick_anvil_is_valid",
    "thin_anvil_is_valid",
]


def _statistics_input_ds():
    """Synthetic step-level statistics input covering every conditional
    family (bt/ctt/ctt_corrected/cth/cth_corrected means present)."""
    from tobac_flow_tpu.data.ncdataset import DataArray, Dataset

    ds = Dataset()
    t0 = np.datetime64("2020-06-01T00:00:00", "ns")
    step = np.timedelta64(300, "s")
    rng = np.random.default_rng(0)

    def add(name, vals, dim):
        ds[name] = DataArray(np.asarray(vals), dims=(dim,), name=name)

    ds.coords["core"] = np.array([1, 2], np.int32)
    ds.coords["anvil"] = np.array([1], np.int32)
    ds.coords["core_step"] = np.array([1, 2, 3, 4], np.int32)
    ds.coords["thick_anvil_step"] = np.array([1, 2, 3], np.int32)
    ds.coords["thin_anvil_step"] = np.array([1, 2, 3], np.int32)

    add("core_step_core_index", [1, 1, 2, 2], "core_step")
    add("thick_anvil_step_anvil_index", [1, 1, 1], "thick_anvil_step")
    add("thin_anvil_step_anvil_index", [1, 1, 1], "thin_anvil_step")
    add("core_anvil_index", [1, 0], "core")

    for prefix, dim, n in [
        ("core_step", "core_step", 4),
        ("thick_anvil_step", "thick_anvil_step", 3),
        ("thin_anvil_step", "thin_anvil_step", 3),
    ]:
        add(f"{prefix}_t", t0 + np.arange(n) * step, dim)
        add(f"{prefix}_x", 10.0 + np.arange(n), dim)
        add(f"{prefix}_y", 20.0 + np.arange(n), dim)
        add(f"{prefix}_lat", 30.0 + 0.01 * np.arange(n), dim)
        add(f"{prefix}_lon", -90.0 + 0.01 * np.arange(n), dim)
        add(f"{prefix}_area", 16.0 + np.arange(n), dim)
        for field, base in [
            ("bt", 270.0), ("ctt", 230.0), ("ctt_corrected", 228.0),
            ("cth", 9000.0), ("cth_corrected", 9500.0),
        ]:
            add(f"{prefix}_{field}_mean", base + rng.normal(0, 3, n), dim)

    for obj, dim in [("core", "core"), ("thick_anvil", "anvil"), ("thin_anvil", "anvil")]:
        n = len(ds.coords[dim])
        for flag in ("edge_label_flag", "start_label_flag", "end_label_flag"):
            add(f"{obj}_{flag}", np.zeros(n, bool), dim)
    return ds


def test_statistics_variable_manifest():
    """The statistics pipeline emits the reference's full per-object variable
    inventory with the right dims (frozen manifest from reference
    postprocess.py:313-1314)."""
    from tobac_flow_tpu.schema.postprocess import (
        add_validity_flags,
        process_core_properties,
        process_thick_anvil_properties,
        process_thin_anvil_properties,
    )

    ds = _statistics_input_ds()
    ds = process_core_properties(ds)
    ds = process_thick_anvil_properties(ds)
    ds = process_thin_anvil_properties(ds)
    ds = add_validity_flags(ds)

    missing = []
    wrong_dims = []
    for name in CORE_MANIFEST + VALIDITY_MANIFEST[:2] + ["core_is_valid"]:
        want = ("core",)
        if name not in ds.data_vars:
            missing.append(name)
        elif ds[name].dims != want:
            wrong_dims.append((name, ds[name].dims))
    for name in THICK_MANIFEST + THIN_MANIFEST + [
        "anvil_core_count", "anvil_initial_core_index", "anvil_no_growth_flag",
        "anvil_no_initial_core_flag", "thick_anvil_is_valid",
        "thin_anvil_is_valid",
    ]:
        if name not in ds.data_vars:
            missing.append(name)
        elif ds[name].dims != ("anvil",):
            wrong_dims.append((name, ds[name].dims))
    assert not missing, f"missing statistics variables: {missing}"
    assert not wrong_dims, f"wrong dims: {wrong_dims}"

    # spot-check the semantics of the new rate families
    assert np.isfinite(ds["core_ctt_cooling_rate"].values).all()
    assert (ds["core_lifetime"].values > np.timedelta64(0, "s")).all()
