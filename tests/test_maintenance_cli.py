"""Smoke-drive the maintenance/repair CLIs (reference scripts:
combine_dccs_goes, relabel_postprocess_goes, quick_fix, fix_seviri_dccs,
grid_flux_native)."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset


def _window_name(own_start_frame, own_end_frame):
    base = datetime(2020, 6, 1)

    def tok(frame):
        dt = base + timedelta(seconds=300 * frame)
        return f"{dt.year}{dt.timetuple().tm_yday:03d}{dt:%H%M%S}"

    return f"detected_dccs_SYN_S{tok(own_start_frame)}_E{tok(own_end_frame)}.nc"


@pytest.fixture(scope="module")
def detection_file(tmp_path_factory):
    from tobac_flow_tpu.cli.common import DetectionOptions, run_detection, save_dataset
    from tobac_flow_tpu.cli.dcc_detect_synthetic import make_scene

    tmp_path = tmp_path_factory.mktemp("maintenance")
    bt, wvd, swd = make_scene(12, 96, 128, 0)
    ds = Dataset(coords={"t": bt.coords["t"], "y": bt.coords["y"], "x": bt.coords["x"]})
    opts = DetectionOptions(
        save_label_props=False, save_field_props=False, save_bt=True, save_wvd=True
    )
    ds = run_detection(bt, wvd, swd, ds, opts=opts)
    path = tmp_path / _window_name(0, 12)
    save_dataset(ds, path)
    return tmp_path, path


def test_fix_seviri_dccs(detection_file):
    from tobac_flow_tpu.cli import fix_seviri_dccs

    tmp_path, path = detection_file
    outs = fix_seviri_dccs.main(["-sd", str(tmp_path / "fixed"), str(path)])
    assert len(outs) == 1
    ds = open_dataset(str(outs[0]))
    # schema fully re-derived
    for var in (
        "core_step_label", "core_step_core_index", "core_edge_label_flag",
        "core_total_area", "core_anvil_index",
    ):
        assert var in ds.data_vars, var


def test_quick_fix_adds_field_stats(detection_file):
    from tobac_flow_tpu.cli import quick_fix

    tmp_path, path = detection_file
    out = quick_fix.main(
        [str(path), "-src", str(path), "-vars", "wvd", "-sd", str(tmp_path / "qf")]
    )
    ds = open_dataset(str(out))
    assert "core_wvd_mean" in ds.data_vars
    assert "thick_anvil_step_wvd_std" in ds.data_vars


def test_combine_dccs_runs(detection_file):
    from tobac_flow_tpu.cli import combine_dccs

    tmp_path, path = detection_file
    outs = combine_dccs.main(["-sd", str(tmp_path / "combined"), str(path)])
    assert len(outs) == 1 and outs[0].exists()


def test_relabel_postprocess(detection_file):
    from tobac_flow_tpu.cli import linking_parallel, relabel_postprocess

    tmp_path, path = detection_file
    links = linking_parallel.main(
        ["-sd", str(tmp_path / "links"), str(path), str(path)]
    )
    out = relabel_postprocess.main(
        [str(path), str(links), "-sd", str(tmp_path / "rp")]
    )
    ds = open_dataset(str(out))
    assert "core_total_area" in ds.data_vars
    assert "core_step_bt_mean" in ds.data_vars
    assert "bt" not in ds.data_vars  # dropped to shrink the output


def test_grid_flux_native(tmp_path):
    from tobac_flow_tpu.cli import grid_flux_native

    rng = np.random.default_rng(0)
    n = 500
    files = []
    for i in range(2):
        ds = Dataset(
            coords={
                "t": np.asarray(
                    [np.datetime64("2020-06-01T00:00") + np.timedelta64(i, "h")]
                ),
                "pix": np.arange(n),
            }
        )
        ds["lat"] = DataArray(rng.uniform(-60, 60, n), dims=("pix",), name="lat")
        ds["lon"] = DataArray(rng.uniform(-60, 60, n), dims=("pix",), name="lon")
        for var in (
            "toa_swdn", "toa_swup", "toa_lwup",
            "boa_swdn", "boa_swup", "boa_lwdn", "boa_lwup",
        ):
            ds[var] = DataArray(
                rng.uniform(0, 1000, n).astype(np.float32), dims=("pix",), name=var
            )
            ds[f"{var}_clr"] = DataArray(
                rng.uniform(0, 1000, n).astype(np.float32), dims=("pix",),
                name=f"{var}_clr",
            )
        p = tmp_path / f"flux_{i}.nc"
        ds.to_netcdf(p)
        files.append(str(p))

    out = grid_flux_native.main(["-sd", str(tmp_path / "grid")] + files)
    g = open_dataset(str(out))
    assert g["toa_swup"].values.shape == (2, 180, 360)
    assert "toa_net_cre" in g.data_vars
    assert np.isfinite(g["toa_swup"].values).any()
