"""Datetime helper tests: filename parsing, centred time_diff, pad trimming."""

from datetime import datetime

import numpy as np
import pytest

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset
from tobac_flow_tpu.utils.datetime_utils import (
    get_dates_from_filename,
    get_time_diff_from_coord,
    time_diff,
    trim_file_start_and_end,
)


def test_get_dates_from_filename_goes_style():
    name = "OR_ABI-L2-MCMIPC-M6_G16_s_S20201531200204_E20201531209512_X.nc"
    start, end = get_dates_from_filename(name)
    assert start == datetime(2020, 6, 1, 12, 0, 20)
    assert end == datetime(2020, 6, 1, 12, 9, 51)


def test_get_dates_from_filename_rejects_plain_names():
    with pytest.raises(ValueError):
        get_dates_from_filename("no_dates_here.nc")


def test_time_diff_centred_fractional_minutes():
    base = np.datetime64("2020-01-01T00:00")
    # 5-min cadence with one 15-min gap
    times = base + np.array([0, 5, 10, 25, 30]) * np.timedelta64(60, "s")
    d = get_time_diff_from_coord(times)
    assert d[0] == 5.0  # one-sided start
    assert d[1] == 5.0  # (10-0)/2
    assert d[2] == 10.0  # (25-5)/2 across the gap
    assert d[3] == 10.0  # (30-10)/2
    assert d[4] == 5.0  # one-sided end


def test_time_diff_needs_two():
    with pytest.raises(ValueError):
        time_diff([datetime(2020, 1, 1)])


def test_trim_file_start_and_end_drops_padding():
    t = np.datetime64("2020-06-01T00:00") + np.arange(10) * np.timedelta64(
        600, "s"
    )
    ds = Dataset(coords={"t": t})
    ds["v"] = DataArray(np.arange(10.0), dims=("t",))
    out = trim_file_start_and_end(
        ds, datetime(2020, 6, 1, 0, 20), datetime(2020, 6, 1, 1, 10)
    )
    np.testing.assert_array_equal(out["v"].values, [2.0, 3.0, 4.0, 5.0, 6.0])
