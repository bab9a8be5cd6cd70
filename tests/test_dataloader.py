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


def test_seviri_dataloader_channels_and_gap_fill(tmp_path):
    from datetime import datetime, timedelta

    from tobac_flow_tpu.data.dataloader import seviri_dataloader

    h, w = 12, 16
    base = np.datetime64("2021-07-01T00:00")
    # three frames at 15-min cadence with one 45-min gap after the second
    offsets = [0, 15, 60]
    paths = []
    for k, off in enumerate(offsets):
        ds = Dataset(coords={"t": np.array([base + np.timedelta64(off, "m")])})
        ds["IR_108"] = DataArray(np.full((h, w), 250.0 + k), dims=("y", "x"))
        ds["WV_062"] = DataArray(np.full((h, w), 230.0), dims=("y", "x"))
        ds["WV_073"] = DataArray(np.full((h, w), 235.0 + k), dims=("y", "x"))
        ds["IR_087"] = DataArray(np.full((h, w), 248.0), dims=("y", "x"))
        ds["IR_120"] = DataArray(np.full((h, w), 246.0), dims=("y", "x"))
        p = tmp_path / f"seviri_{k}.nc"
        ds.to_netcdf(str(p))
        paths.append(str(p))

    bt, wvd, swd = seviri_dataloader(
        datetime(2021, 7, 1), datetime(2021, 7, 1, 2), paths,
        time_gap=timedelta(minutes=20),
    )
    vals = np.asarray(bt.values)
    # gap fill inserts NaN frame(s) between 00:15 and 01:00
    assert vals.shape[0] > 3
    assert np.isnan(vals).any(axis=(1, 2)).sum() >= 1
    real = vals[~np.isnan(vals[:, 0, 0])]
    np.testing.assert_allclose(real[:, 0, 0], [250.0, 251.0, 252.0])
    w0 = np.asarray(wvd.values)[0, 0, 0]
    assert w0 == 230.0 - 235.0
    s0 = np.asarray(swd.values)[0, 0, 0]
    assert s0 == 248.0 - 246.0


class TestSeviriNat:
    """From-scratch MSG native (.nat) format decode (data/seviri_nat.py)."""

    def _fixture(self, tmp_path, t0, seed=0):
        from datetime import datetime, timedelta

        from tobac_flow_tpu.data.seviri_nat import write_nat

        rng = np.random.default_rng(seed)
        h, w = 24, 32
        fields = {}
        for ch, base in [
            ("WV_062", 235.0), ("WV_073", 245.0), ("IR_087", 275.0),
            ("IR_108", 280.0), ("IR_120", 272.0),
        ]:
            fields[ch] = (base + rng.normal(0, 5, (h, w))).astype(np.float32)
        path = tmp_path / f"MSG4-SEVI-MSG15-0100-NA-{t0:%Y%m%d%H%M%S}.nat"
        write_nat(path, fields, t0)
        return path, fields

    def test_10bit_roundtrip(self):
        from tobac_flow_tpu.data.seviri_nat import pack_10bit, unpack_10bit

        rng = np.random.default_rng(1)
        v = rng.integers(0, 1024, 101).astype(np.uint16)
        assert (unpack_10bit(pack_10bit(v), 101) == v).all()

    def test_planck_roundtrip(self):
        from tobac_flow_tpu.data.seviri_nat import bt_from_radiance, radiance_from_bt

        t = np.linspace(180.0, 320.0, 29)
        for ch in ("IR_108", "WV_062", "IR_087", "IR_120", "WV_073"):
            np.testing.assert_allclose(
                bt_from_radiance(radiance_from_bt(t, ch), ch), t, atol=1e-6
            )

    def test_decode_matches_written_fields(self, tmp_path):
        from datetime import datetime

        from tobac_flow_tpu.data.seviri_nat import decode_nat

        t0 = datetime(2020, 6, 1, 12, 0)
        path, fields = self._fixture(tmp_path, t0)
        decoded, meta, scan_time = decode_nat(path)
        assert scan_time == t0
        assert meta["SelectedBandIDs"].count("X") == 5
        for ch, truth in fields.items():
            # 10-bit count quantisation bounds the decode error
            np.testing.assert_allclose(decoded[ch], truth, atol=0.2)

    def test_nat_dataloader_recipe(self, tmp_path):
        from datetime import datetime, timedelta

        from tobac_flow_tpu.data.seviri_nat import seviri_nat_dataloader

        t0 = datetime(2020, 6, 1, 12, 0)
        paths = []
        truths = []
        for i in range(3):
            p, f = self._fixture(tmp_path, t0 + timedelta(minutes=15 * i), seed=i)
            paths.append(p)
            truths.append(f)
        bt, wvd, twd = seviri_nat_dataloader(None, None, paths)
        assert bt.values.shape == (3, 24, 32)
        np.testing.assert_allclose(bt.values[0], truths[0]["IR_108"], atol=0.2)
        np.testing.assert_allclose(
            wvd.values[1],
            truths[1]["WV_062"] - truths[1]["WV_073"],
            atol=0.4,
        )
        np.testing.assert_allclose(
            twd.values[2],
            np.maximum(truths[2]["IR_087"] - truths[2]["IR_120"], 0),
            atol=0.4,
        )
        assert (twd.values >= 0).all()

    def test_nat_detect_cli(self, tmp_path):
        from datetime import datetime, timedelta

        from tobac_flow_tpu.cli import dcc_detect_seviri_nat
        from tobac_flow_tpu.data.ncdataset import open_dataset
        from tobac_flow_tpu.data.seviri_nat import write_nat

        # a small advecting warm anomaly so the pipeline runs end to end
        h, w = 48, 64
        yy, xx = np.mgrid[0:h, 0:w]
        paths = []
        t0 = datetime(2020, 6, 1, 12, 0)
        for i in range(6):
            core = np.exp(-((xx - 16 - 2 * i) ** 2 + (yy - 20) ** 2) / 30.0)
            fields = {
                "WV_062": (235.0 + 12 * core).astype(np.float32),
                "WV_073": (245.0 - 2 * core).astype(np.float32),
                "IR_087": (275.0 - 20 * core).astype(np.float32),
                "IR_108": (280.0 - (20.0 + 8 * i) * core).astype(np.float32),
                "IR_120": (272.0 - 18 * core).astype(np.float32),
            }
            ti = t0 + timedelta(minutes=15 * i)
            paths.append(
                str(write_nat(tmp_path / f"f{i}.nat", fields, ti))
            )
        out = dcc_detect_seviri_nat.main(["-sd", str(tmp_path / "out")] + paths)
        ds = open_dataset(str(out))
        for var in ("core_label", "thick_anvil_label", "thin_anvil_label"):
            assert var in ds.data_vars
