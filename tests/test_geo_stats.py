"""Geodesy + statistics utility tests (mirrors reference
tests/test_geo_utils.py and exercises the stats layer)."""

import numpy as np

from tobac_flow_tpu.utils.geo import (
    get_mean_object_azimuth_and_speed,
    get_sza,
    haversine_distance,
    initial_bearing,
)
from tobac_flow_tpu.utils.stats import (
    calc_combined_mean,
    calc_combined_std,
    calc_max_cooling_rate,
    find_overlap_mode,
    get_weighted_proportions,
    groupby_apply,
    weighted_average_and_std,
    weighted_stats,
    weighted_stats_and_uncertainties,
)


def test_haversine_equator_degree():
    d = haversine_distance(0.0, 0.0, 1.0, 0.0)
    assert abs(d - 111195) < 300  # ~111.2 km per degree at the equator


def test_initial_bearing_cardinals():
    assert abs(initial_bearing(0, 0, 0, 1) - 0.0) < 1e-6  # due north
    assert abs(initial_bearing(0, 0, 1, 0) - 90.0) < 1e-6  # due east
    assert abs(initial_bearing(0, 1, 0, 0) - 180.0) < 1e-6  # due south


def test_object_azimuth_and_speed():
    # object moving due east along the equator, 0.1 deg per 10 minutes
    lons = np.array([0.0, 0.1, 0.2])
    lats = np.zeros(3)
    times = np.datetime64("2020-01-01T00:00") + np.arange(3) * np.timedelta64(
        600, "s"
    )
    azi, speed = get_mean_object_azimuth_and_speed(lons, lats, times)
    assert abs(azi - 90.0) < 1.0
    assert abs(speed - 111195 * 0.1 / 600) < 1.0  # ~18.5 m/s


def test_object_azimuth_single_point():
    out = get_mean_object_azimuth_and_speed([0.0], [0.0], np.array([np.datetime64("2020-01-01")]))
    assert np.isnan(out[0]) and np.isnan(out[1])


def test_sza_noon_equator():
    # near an equinox at local noon on the Greenwich meridian, the sun is
    # close to overhead at the equator
    t = np.datetime64("2020-03-20T12:00:00")
    sza = get_sza(t, 0.0, 0.0)
    assert sza < 5.0


def test_find_overlap_mode():
    assert find_overlap_mode(np.array([0, 0, 2, 2, 3])) == 2
    assert find_overlap_mode(np.array([0, 0, 0])) == 0


def test_weighted_average_and_std():
    data = np.array([1.0, 2.0, 3.0])
    w = np.ones(3)
    mean, std = weighted_average_and_std(data, w)
    assert np.isclose(mean, 2.0)
    assert np.isclose(std, np.std(data, ddof=1))  # Bessel-corrected


def test_weighted_stats_nan_handling():
    data = np.array([1.0, np.nan, 3.0])
    w = np.array([1.0, 5.0, 1.0])
    mean, std, mn, mx = weighted_stats(data, w)
    assert np.isclose(mean, 2.0)
    assert mn == 1.0 and mx == 3.0


def test_weighted_stats_and_uncertainties():
    data = np.array([1.0, 2.0, 3.0])
    err = np.array([0.1, 0.1, 0.1])
    w = np.ones(3)
    out = weighted_stats_and_uncertainties(data, err, w)
    assert len(out) == 8
    assert np.isclose(out[0], 2.0)
    assert out[4] > 0  # mean uncertainty


def test_weighted_proportions():
    data = np.array([1, 1, 2, 3])
    w = np.ones(4)
    props = get_weighted_proportions(data, w, [1, 2, 3])
    assert np.allclose(props, [0.5, 0.25, 0.25])


def test_combined_mean_std():
    means = np.array([1.0, 3.0])
    stds = np.array([0.5, 0.5])
    areas = np.array([1.0, 1.0])
    assert np.isclose(calc_combined_mean(means, areas), 2.0)
    assert calc_combined_std(stds, means, areas) > 0


def test_calc_max_cooling_rate():
    t = np.datetime64("2020-01-01T00:00") + np.arange(4) * np.timedelta64(60, "s")
    bt = np.array([250.0, 245.0, 243.0, 242.0])
    rate = calc_max_cooling_rate(bt, t, t_steps=1)
    assert np.isclose(rate, 5.0)  # 5 K per minute at the first step


def test_groupby_apply_basic():
    groups = np.array([1, 1, 2, 2, 2, 0])
    vals = np.array([1.0, 3.0, 5.0, 7.0, 9.0, 100.0])
    out = groupby_apply(np.mean, groups, vals)
    assert np.allclose(out, [2.0, 7.0])  # group 0 excluded


def test_solar_azimuth_directions():
    from tobac_flow_tpu.utils.geo import get_sza_and_azi

    # morning sun is east of a mid-latitude observer, afternoon sun west
    morning = np.array([np.datetime64("2020-06-21T11:00")])  # ~7am local at 60W
    afternoon = np.array([np.datetime64("2020-06-21T21:00")])  # ~5pm local
    _, azi_am = get_sza_and_azi(morning, 35.0, -60.0)
    _, azi_pm = get_sza_and_azi(afternoon, 35.0, -60.0)
    assert 45 < float(np.ravel(azi_am)[0]) < 135  # eastish
    assert 225 < float(np.ravel(azi_pm)[0]) < 315  # westish


def test_satellite_viewing_angles_nadir_and_limb():
    from tobac_flow_tpu.utils.geo import get_satellite_viewing_angles

    zen_nadir, azi_nadir = get_satellite_viewing_angles(0.0, -75.0, sat_lon=-75.0)
    assert float(np.ravel(zen_nadir)[0]) < 1.0
    zen_limb, _ = get_satellite_viewing_angles(0.0, -155.0, sat_lon=-75.0)
    assert float(np.ravel(zen_limb)[0]) > 75.0


def test_pixel_lengths_and_area_scale_with_latitude():
    from tobac_flow_tpu.utils.geo import get_pixel_area

    lon, lat = np.meshgrid(np.arange(0, 3, 1.0), np.arange(0, 3, 1.0))
    area_eq = get_pixel_area(lat, lon)
    lon60, lat60 = np.meshgrid(np.arange(0, 3, 1.0), np.arange(60, 63, 1.0))
    area_60 = get_pixel_area(lat60, lon60)
    # 1-degree cells shrink roughly with cos(latitude)
    ratio = np.nanmean(area_60) / np.nanmean(area_eq)
    assert 0.35 < ratio < 0.65
