"""ABI fixed-grid geometry and GLM gridding tests."""

import numpy as np
import pytest

from tobac_flow_tpu.data.abi import ABIProjection
from tobac_flow_tpu.data.glm import get_glm_parallax_offsets, regrid_glm
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset


@pytest.fixture
def proj():
    return ABIProjection(longitude_of_projection_origin=-75.0)


def test_subsatellite_point(proj):
    lat, lon = proj.to_latlon(0.0, 0.0)
    assert abs(lat) < 1e-6
    assert abs(lon - (-75.0)) < 1e-6


def test_latlon_xy_roundtrip(proj):
    lats = np.array([0.0, 20.0, 45.0, -30.0])
    lons = np.array([-75.0, -90.0, -60.0, -100.0])
    x, y = proj.to_xy(lats, lons)
    lat2, lon2 = proj.to_latlon(x, y)
    assert np.allclose(lat2, lats, atol=1e-6)
    assert np.allclose(lon2, lons, atol=1e-6)


def test_off_disk_is_nan(proj):
    lat, lon = proj.to_latlon(0.2, 0.0)  # far beyond the limb
    assert np.isnan(lat)
    x, y = proj.to_xy(0.0, 105.0)  # other side of the planet
    assert np.isnan(x)


def test_sat_zenith(proj):
    z0 = proj.sat_zenith(0.0, -75.0)
    assert z0 < 1e-3  # nadir
    z1 = proj.sat_zenith(45.0, -75.0)
    assert 45 < z1 < 60  # oblique view


def test_parallax_offsets_move_away_from_nadir():
    lat, lon = 30.0, -90.0
    plat, plon = get_glm_parallax_offsets(np.array([lat]), np.array([lon]))
    # a flash at lightning-ellipsoid height projects along the satellite view
    # ray to an apparent surface position displaced AWAY from the
    # sub-satellite point (0, -75): higher lat, more-westerly lon
    assert plat[0] > lat
    assert plon[0] < lon
    assert abs(plat[0] - lat) < 0.5
    # at nadir there is no parallax
    plat0, plon0 = get_glm_parallax_offsets(np.array([0.0]), np.array([-75.0]))
    assert abs(plat0[0]) < 1e-6 and abs(plon0[0] + 75.0) < 1e-6


def _grid_ds():
    # small fixed-grid dataset around nadir, 2km-class resolution
    n = 40
    x = (np.arange(n) - n / 2) * 56e-6
    y = ((np.arange(n) - n / 2) * 56e-6)[::-1]  # ABI y decreases
    ds = Dataset(coords={"x": x, "y": y})
    ds["goes_imager_projection"] = DataArray(
        np.zeros((), np.int32),
        dims=(),
        attrs={
            "semi_major_axis": 6378137.0,
            "semi_minor_axis": 6356752.31414,
            "perspective_point_height": 35786023.0,
            "longitude_of_projection_origin": -75.0,
        },
    )
    return ds


def test_regrid_glm_counts():
    ds = _grid_ds()
    proj = ABIProjection()
    # flashes at the centres of two known pixels
    xs = np.array([ds.coords["x"][10], ds.coords["x"][30]])
    ys = np.array([ds.coords["y"][5], ds.coords["y"][20]])
    lat, lon = proj.to_latlon(np.array(xs), np.array(ys))
    t0 = np.datetime64("2020-01-01T00:00:00", "ns")
    times = np.array([t0 + np.timedelta64(10, "s"), t0 + np.timedelta64(70, "s")])
    t_bins = np.array([t0, t0 + np.timedelta64(60, "s"), t0 + np.timedelta64(120, "s")])
    counts = regrid_glm(times, lat, lon, ds, t_bins, correct_parallax=False)
    assert counts.shape == (2, 40, 40)
    assert counts[0, 5, 10] == 1
    assert counts[1, 20, 30] == 1
    assert counts.sum() == 2
