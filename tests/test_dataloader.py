"""GOES dataloader tests on synthetic MCMIP-like netCDF files."""

from datetime import datetime, timedelta

import numpy as np
import pytest

from tobac_flow_tpu.data.dataloader import (
    fill_time_gap_nan,
    get_stripe_deviation,
    load_mcmip,
)
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset


def write_mcmip(path, time, h=24, w=32, stripe_row=None, dqf_box=None, seed=0):
    rng = np.random.default_rng(seed)
    ds = Dataset(
        coords={
            "t": np.asarray([time], dtype="datetime64[ns]")[0:1],
            "y": (np.arange(h) * -56e-6 + 0.09),
            "x": (np.arange(w) * 56e-6 - 0.1),
        }
    )
    base = 270.0 + rng.normal(0, 2, (h, w))
    for ch, offset in [("C08", -30), ("C10", -25), ("C13", 0), ("C15", -2)]:
        ds[f"CMI_{ch}"] = DataArray(
            (base + offset).astype(np.float32), dims=("y", "x"),
            attrs={"units": "K"},
        )
        dqf = np.zeros((h, w), np.float32)
        if dqf_box and ch == "C13":
            y0, y1, x0, x1 = dqf_box
            dqf[y0:y1, x0:x1] = 1
        if stripe_row is not None and ch == "C08":
            dqf[stripe_row] = 1
        ds[f"DQF_{ch}"] = DataArray(dqf, dims=("y", "x"))
    ds["goes_imager_projection"] = DataArray(
        np.zeros((), np.int32), dims=(),
        attrs={
            "semi_major_axis": 6378137.0,
            "semi_minor_axis": 6356752.31414,
            "perspective_point_height": 35786023.0,
            "longitude_of_projection_origin": -75.0,
        },
    )
    ds.to_netcdf(path)
    return path


@pytest.fixture
def mcmip_files(tmp_path):
    t0 = np.datetime64("2020-06-01T00:00:00", "ns")
    files = []
    for i in range(3):
        files.append(
            write_mcmip(
                tmp_path / f"OR_ABI-L2-MCMIPC-M6_G16_s{i}.nc",
                t0 + i * np.timedelta64(300, "s"),
                seed=i,
                dqf_box=(2, 5, 3, 8) if i == 1 else None,
            )
        )
    return files


def test_load_mcmip_channels(mcmip_files):
    bt, wvd, swd, proj = load_mcmip(mcmip_files)
    assert bt.shape == (3, 24, 32)
    assert bt.name == "bt" and wvd.name == "wvd" and swd.name == "swd"
    # channel arithmetic: wvd = C08 - C10 = -5, swd = C13 - C15 = 2
    assert np.isclose(np.nanmean(wvd.values), -5.0, atol=0.5)
    assert np.isclose(np.nanmean(swd.values), 2.0, atol=0.5)
    assert proj["longitude_of_projection_origin"] == -75.0


def test_load_mcmip_dqf_masking(mcmip_files):
    bt, _, _, _ = load_mcmip(mcmip_files)
    # the DQF box in frame 1 must be NaN in every field
    assert np.isnan(bt.values[1, 2:5, 3:8]).all()
    assert np.isfinite(bt.values[0, 2:5, 3:8]).all()


def test_load_mcmip_subsetting(mcmip_files):
    bt, _, _, _ = load_mcmip(mcmip_files, x0=5, x1=15, y0=2, y1=10)
    assert bt.shape == (3, 8, 10)


def test_fill_time_gap_nan():
    t0 = np.datetime64("2020-06-01T00:00:00", "ns")
    times = np.asarray([t0, t0 + np.timedelta64(300, "s"), t0 + np.timedelta64(3600, "s")])
    da = DataArray(
        np.ones((3, 4, 4), np.float32), coords={"t": times}, dims=("t", "y", "x"),
        name="bt",
    )
    out = fill_time_gap_nan(da, timedelta(minutes=15))
    assert out.shape[0] == 4
    assert np.isnan(out.values[2]).all()
    assert np.all(np.diff(out.coords["t"]).astype(int) > 0)


def test_stripe_deviation_flags_stripes():
    dqf = np.zeros((20, 30), np.float32)
    dqf[7] = 1.0  # full-row stripe
    dev = get_stripe_deviation(dqf)
    assert dev[7, 0] > 2
    assert dev[3, 0] < 2
