"""GCS path construction and filename-date helpers (no network)."""

from datetime import datetime

from tobac_flow_tpu.data.io import (
    _abi_prefix,
    _hours_in_range,
    _l1b_prefix,
    get_goes_date,
)


def test_abi_prefix_layout():
    d = datetime(2018, 6, 19, 17)
    assert _abi_prefix(d) == "ABI-L2-MCMIPC/2018/170/17/OR_ABI-L2-MCMIPC-M3"
    assert (
        _abi_prefix(d, product="ACHA", view="F", mode=6)
        == "ABI-L2-ACHAF/2018/170/17/OR_ABI-L2-ACHAF-M6"
    )


def test_l1b_prefix_layout():
    d = datetime(2020, 1, 1, 0)
    assert (
        _l1b_prefix(d, view="C", mode=6, channel=2)
        == "ABI-L1b-RadC/2020/001/00/OR_ABI-L1b-RadC-M6C02"
    )


def test_get_goes_date_parses_scan_start():
    name = (
        "OR_ABI-L2-MCMIPC-M3_G16_s20181701700204_e20181701702577_c20181701703086.nc"
    )
    assert get_goes_date(name) == datetime(2018, 6, 19, 17, 0, 20)
    assert get_goes_date("not_a_goes_file.nc") is None


def test_hours_in_range_covers_partial_hours():
    hours = list(
        _hours_in_range(datetime(2020, 1, 1, 10, 30), datetime(2020, 1, 1, 12, 10))
    )
    assert hours == [
        datetime(2020, 1, 1, 10),
        datetime(2020, 1, 1, 11),
        datetime(2020, 1, 1, 12),
    ]
