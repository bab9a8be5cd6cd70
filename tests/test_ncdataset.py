"""Round-trip and API robustness tests for the h5py-backed dataset layer."""

import numpy as np
import pytest

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset


def _ds():
    t = np.datetime64("2020-01-01T00:00") + np.arange(4) * np.timedelta64(600, "s")
    y = np.arange(6) * 2.0
    x = np.arange(8) * 2.0
    ds = Dataset(coords={"t": t, "y": y, "x": x}, attrs={"title": "test"})
    ds["bt"] = DataArray(
        np.arange(4 * 6 * 8, dtype=np.float32).reshape(4, 6, 8),
        dims=("t", "y", "x"),
        attrs={"units": "K", "long_name": "brightness temperature"},
    )
    ds["scalar_flag"] = DataArray(np.float64(3.5), dims=())
    ds["core"] = DataArray(np.array([1, 2, 3]), dims=("core",))
    return ds


def test_netcdf_roundtrip(tmp_path):
    ds = _ds()
    path = str(tmp_path / "out.nc")
    ds.to_netcdf(path)
    back = open_dataset(path)
    assert back.attrs["title"] == "test"
    np.testing.assert_array_equal(back["bt"].values, ds["bt"].values)
    assert back["bt"].dims == ("t", "y", "x")
    assert back["bt"].attrs["units"] == "K"
    # CF time decodes back to datetime64 with identical instants
    np.testing.assert_array_equal(
        back.coords["t"].astype("datetime64[s]"),
        ds.coords["t"].astype("datetime64[s]"),
    )
    assert float(back["scalar_flag"].values) == 3.5


def test_roundtrip_nan_and_bool(tmp_path):
    ds = Dataset(coords={"x": np.arange(3)})
    vals = np.array([1.0, np.nan, 3.0], np.float32)
    ds["v"] = DataArray(vals, dims=("x",))
    ds["m"] = DataArray(np.array([True, False, True]), dims=("x",))
    path = str(tmp_path / "nb.nc")
    ds.to_netcdf(path)
    back = open_dataset(path)
    np.testing.assert_array_equal(np.isnan(back["v"].values), [False, True, False])
    np.testing.assert_array_equal(np.asarray(back["m"].values, bool), ds["m"].values)


def test_value_based_sel_and_isel():
    ds = _ds()
    sub = ds.sel(t=ds.coords["t"][1:3])
    assert sub["bt"].shape == (2, 6, 8)
    np.testing.assert_array_equal(sub.coords["t"], ds.coords["t"][1:3])
    sub2 = ds.isel(x=slice(0, 4), y=slice(1, 3))
    assert sub2["bt"].shape == (4, 2, 4)
    np.testing.assert_array_equal(sub2.coords["x"], ds.coords["x"][:4])


def test_dataarray_arithmetic_preserves_metadata():
    ds = _ds()
    diff = ds["bt"] - 273.15
    assert isinstance(diff, DataArray)
    assert diff.dims == ("t", "y", "x")
    np.testing.assert_allclose(diff.values, ds["bt"].values - 273.15)
    prod = 2.0 * ds["bt"]
    np.testing.assert_allclose(prod.values, ds["bt"].values * 2)
    comp = ds["bt"] > 10.0
    assert comp.values.dtype == bool


def test_dataset_contains_iter_drop():
    ds = _ds()
    assert "bt" in ds
    assert "missing" not in ds
    # "core" was assigned as a 1-D variable named after its own dim, so it
    # becomes a coordinate (xarray semantics) and is not iterated as a var
    assert set(iter(ds)) == {"bt", "scalar_flag"}
    assert "core" in ds.coords
    np.testing.assert_array_equal(ds["core"].values, [1, 2, 3])
    ds2 = ds.drop_vars(["scalar_flag"])
    assert "scalar_flag" not in ds2
    assert "bt" in ds2


def test_missing_variable_raises():
    ds = _ds()
    with pytest.raises(KeyError):
        ds["nope"]


def test_setitem_accepts_plain_numpy_with_matching_dims():
    ds = _ds()
    ds["bt2"] = ds["bt"].copy()
    np.testing.assert_array_equal(ds["bt2"].values, ds["bt"].values)
    assert ds["bt2"].dims == ("t", "y", "x")
