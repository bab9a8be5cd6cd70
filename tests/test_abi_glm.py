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


def test_abi_bt_planck_roundtrip():
    from tobac_flow_tpu.data.abi import get_abi_bt

    # C13 coefficients (typical GOES-16 values)
    fk1, fk2, bc1, bc2 = 10803.3, 1392.74, 0.07550, 0.99975
    bt_true = np.array([200.0, 250.0, 300.0])
    # forward Planck: rad from bt
    t_eff = bt_true * bc2 + bc1
    rad = fk1 / (np.exp(fk2 / t_eff) - 1.0)
    bt = get_abi_bt(rad, fk1, fk2, bc1, bc2)
    np.testing.assert_allclose(bt, bt_true, atol=1e-3)


def test_abi_ref_scales_and_clips():
    from tobac_flow_tpu.data.abi import get_abi_ref

    rad = np.array([-5.0, 0.0, 100.0])
    ref = get_abi_ref(rad, kappa0=0.002)
    np.testing.assert_allclose(ref, [0.0, 0.0, 0.2])


def test_abi_da_dispatches_on_band():
    from tobac_flow_tpu.data.abi import get_abi_da
    from tobac_flow_tpu.data.ncdataset import DataArray, Dataset

    ds = Dataset()
    ds["Rad"] = DataArray(np.full((4, 4), 50.0), dims=("y", "x"))
    ds["band_id"] = DataArray(np.array([2]), dims=("band",))
    ds["kappa0"] = DataArray(np.float64(0.003), dims=())
    ref = get_abi_da(ds)
    np.testing.assert_allclose(ref, 0.15)

    ds["band_id"] = DataArray(np.array([13]), dims=("band",))
    for k, v in zip(
        ("planck_fk1", "planck_fk2", "planck_bc1", "planck_bc2"),
        (10803.3, 1392.74, 0.07550, 0.99975),
    ):
        ds[k] = DataArray(np.float64(v), dims=())
    bt = get_abi_da(ds)
    assert 150.0 < float(bt.mean()) < 350.0


def test_rgb_composites_shapes_and_range():
    from tobac_flow_tpu.data.abi import get_abi_deep_cloud_rgb, get_abi_rgb

    ref = np.random.default_rng(0).uniform(0, 1, (8, 8))
    rgb = get_abi_rgb(ref, ref * 0.8, ref * 0.6)
    assert rgb.shape == (8, 8, 3)
    assert rgb.min() >= 0 and rgb.max() <= 1

    bt = np.random.default_rng(1).uniform(190, 290, (8, 8))
    dc = get_abi_deep_cloud_rgb(bt, ref, sza=np.full((8, 8), 30.0))
    assert dc.shape == (8, 8, 3)
    assert dc.min() >= 0 and dc.max() <= 1
    # colder clouds -> redder
    assert dc[..., 0][bt < 220].mean() > dc[..., 0][bt > 260].mean()


def test_nexrad_site_table_complete():
    """All 160 operational WSR-88D sites, incl. OCONUS, with sane coords
    (reference nexrad.py:234-572)."""
    from tobac_flow_tpu.data.nexrad import (
        NEXRAD_SITES,
        get_nexrad_site_latlons,
        get_nexrad_sitenames,
    )

    names = get_nexrad_sitenames()
    assert len(names) == 160
    # spot-check known sites across the network
    for site, lat, lon in [
        ("KTLX", 35.333, -97.278),   # Oklahoma City
        ("PGUA", 13.456, 144.811),   # Guam (eastern longitude)
        ("PHKI", 21.894, -159.553),  # Hawaii
        ("PABC", 60.792, -161.876),  # Alaska
        ("TJUA", 18.116, -66.078),   # Puerto Rico
        ("RODN", 26.308, 127.903),   # Okinawa
    ]:
        assert site in NEXRAD_SITES
        np.testing.assert_allclose(NEXRAD_SITES[site], (lat, lon), atol=1e-3)
    lats, lons = get_nexrad_site_latlons(["KTLX", "PGUA"])
    np.testing.assert_allclose(lats, [35.3331, 13.456], atol=1e-3)
    assert ((lats > -90) & (lats < 90)).all()
