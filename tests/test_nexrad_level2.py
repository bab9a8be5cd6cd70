"""From-scratch NEXRAD Level-II (AR2V) decoder: crafted-archive round trip,
gate geolocation geometry, and the tar extraction path
(reference ``tobac_flow/nexrad.py:21-58``, there via pyart)."""

import bz2
import io
import struct
import tarfile
from datetime import datetime, timedelta

import numpy as np
import pytest

from tobac_flow_tpu.data.nexrad_level2 import (
    decode_archive_bytes,
    gate_lat_lon_alt,
    read_nexrad_archive,
)

SITE_LAT, SITE_LON, SITE_ALT = 35.333, -97.278, 384.0


def _msg31(az, el, raw_gates, collect_date=18500, collect_ms=43_200_000):
    """Build one message-31 radial with an RVOL and a DREF block."""
    vol = struct.pack(
        ">1s3sHBBffhhf", b"R", b"VOL", 44, 1, 0, SITE_LAT, SITE_LON,
        int(SITE_ALT), 25, 0.0,
    )
    raw = np.asarray(raw_gates, dtype=np.uint8)
    ref = struct.pack(
        ">1s3sIHHHHHBBff", b"D", b"REF", 0, raw.size, 2125, 250, 16, 16,
        0, 8, 2.0, 66.0,
    ) + raw.tobytes()

    header_size = 32 + 2 * 4  # msg31 header + two block pointers
    p_vol = header_size
    p_ref = header_size + len(vol)
    body = (
        struct.pack(
            ">4sIHHfBBHBBBBfBbH",
            b"KTLX", collect_ms, collect_date, 1, az, 0, 0, 0, 1, 0, 1, 0,
            el, 0, 0, 2,
        )
        + struct.pack(">2i", p_vol, p_ref)
        + vol
        + ref
    )
    size_hw = (16 + len(body) + 1) // 2  # message header + body, in halfwords
    if (16 + len(body)) % 2:
        body += b"\x00"
    msg_header = struct.pack(">HBBHHIHH", size_hw, 0, 31, 1, collect_date,
                             collect_ms, 1, 1)
    return b"\x00" * 12 + msg_header + body


def _archive(radials):
    """Volume header + one bzip2 LDM record holding the radials."""
    payload = b"".join(radials)
    compressed = bz2.compress(payload)
    return (
        struct.pack(">9s3siI4s", b"AR2V0006.", b"001", 18500, 0, b"KTLX")
        + struct.pack(">i", -len(compressed))
        + compressed
    )


@pytest.fixture(scope="module")
def archive_bytes():
    return _archive(
        [
            _msg31(90.0, 0.5, [66, 70, 74, 78, 82, 86, 90, 94]),
            _msg31(180.0, 0.5, [0, 1, 100, 110, 120, 130, 140, 150]),
            _msg31(0.0, 2.4, [200, 210, 220, 230]),
        ]
    )


def _msg29(body_len):
    """Variable-length message-29 frame (model data): CTM + header + body."""
    size_hw = (16 + body_len) // 2
    msg_header = struct.pack(">HBBHHIHH", size_hw, 0, 29, 1, 18500, 0, 1, 1)
    return b"\x00" * 12 + msg_header + b"\x07" * body_len


def test_uncompressed_archive_decodes(archive_bytes):
    """A non-bzip2 archive is a raw message stream starting right after the
    24-byte volume header (pyart framing: no 4-byte control-word skip)."""
    from tobac_flow_tpu.data.nexrad_level2 import decode_archive_bytes

    radials_stream = (
        _msg31(90.0, 0.5, [66, 70, 74, 78])
        + _msg31(180.0, 0.5, [80, 84, 88, 92])
    )
    raw_archive = (
        struct.pack(">9s3siI4s", b"AR2V0006.", b"001", 18500, 0, b"KTLX")
        + radials_stream
    )
    header, radials = decode_archive_bytes(raw_archive)
    assert header["icao"] == "KTLX"
    assert len(radials) == 2
    assert radials[0]["azimuth"] == 90.0
    assert radials[1]["azimuth"] == 180.0


def test_variable_length_message29_does_not_desync(archive_bytes):
    """Message 29 is variable-length: its size field must be honoured (a
    fixed 2432-byte skip would desync every following radial)."""
    from tobac_flow_tpu.data.nexrad_level2 import decode_archive_bytes

    stream = (
        _msg31(90.0, 0.5, [66, 70, 74, 78])
        + _msg29(body_len=300)  # != 2432 - 12 - 16: would desync if skipped
        + _msg31(180.0, 0.5, [80, 84, 88, 92])
    )
    raw_archive = (
        struct.pack(">9s3siI4s", b"AR2V0006.", b"001", 18500, 0, b"KTLX")
        + stream
    )
    _, radials = decode_archive_bytes(raw_archive)
    assert [r["azimuth"] for r in radials] == [90.0, 180.0]


def test_decode_header_and_radials(archive_bytes):
    header, radials = decode_archive_bytes(archive_bytes)
    assert header["icao"] == "KTLX"
    assert header["version"].startswith("AR2V")
    assert len(radials) == 3
    r0 = radials[0]
    assert r0["azimuth"] == 90.0
    assert r0["elevation"] == pytest.approx(0.5)
    assert r0["site"] == (pytest.approx(SITE_LAT), pytest.approx(SITE_LON), SITE_ALT)
    assert r0["first_gate"] == 2125.0 and r0["gate_spacing"] == 250.0
    # value decode: (raw - offset) / scale with offset 66, scale 2
    np.testing.assert_allclose(
        np.ma.getdata(r0["reflectivity"]), (np.arange(66, 95, 4) - 66.0) / 2.0
    )
    # collect_date is days since 1 Jan 1970 with day 1 = 1970-01-01
    assert r0["time"] == datetime(1970, 1, 1) + timedelta(
        days=18500 - 1, milliseconds=43_200_000
    )


def test_below_threshold_and_range_folded_masked(archive_bytes):
    _, radials = decode_archive_bytes(archive_bytes)
    refl = radials[1]["reflectivity"]
    assert bool(refl.mask[0]) and bool(refl.mask[1])  # raw 0 and 1 masked
    assert not refl.mask[2:].any()


def test_read_archive_gate_geometry(archive_bytes):
    times, alts, lats, lons, refs = read_nexrad_archive(archive_bytes)
    assert times.shape == (3,)
    assert refs.shape == (3, 8)  # padded to the longest radial
    assert refs.mask[2, 4:].all()  # short radial padded with mask
    # radial 0 points due east: longitude grows, latitude ~constant
    assert np.all(np.diff(lons[0]) > 0)
    np.testing.assert_allclose(lats[0], SITE_LAT, atol=0.01)
    # radial 1 points due south: latitude falls
    assert np.all(np.diff(lats[1]) < 0)
    # higher elevation -> higher gates at matching range
    assert alts[2, 3] > alts[0, 3]
    assert np.all(alts >= SITE_ALT - 1e-6)


def test_gate_geometry_against_haversine():
    """Ground range from the aeqd inverse must match a haversine distance."""
    from tobac_flow_tpu.utils.geo import haversine_distance

    rng = np.array([50_000.0, 150_000.0])
    lat, lon, alt = gate_lat_lon_alt(SITE_LAT, SITE_LON, SITE_ALT, 45.0, 1.0, rng)
    for i, r in enumerate(rng):
        d = haversine_distance(SITE_LON, SITE_LAT, lon[i], lat[i])
        # ground range < slant range, within ~1% at these distances
        assert d == pytest.approx(r, rel=0.02)
    # beam height for 150 km at 1 deg: ~3.9 km AGL (4/3-Earth standard)
    assert alt[1] - SITE_ALT == pytest.approx(3940, rel=0.05)


def test_get_gates_from_tar(tmp_path, archive_bytes):
    from tobac_flow_tpu.data.nexrad import get_gates_from_tar

    tar_path = tmp_path / "KTLX20200826_120000.tar"
    with tarfile.open(tar_path, "w") as tar:
        info = tarfile.TarInfo("KTLX20200826_120000_V06.ar2v")
        info.size = len(archive_bytes)
        tar.addfile(info, io.BytesIO(archive_bytes))
        junk = b"not a radar file"
        info2 = tarfile.TarInfo("metadata.txt")
        info2.size = len(junk)
        tar.addfile(info2, io.BytesIO(junk))

    lats, lons, alts, refls = get_gates_from_tar(tar_path)
    assert lats.shape == lons.shape == alts.shape == refls.shape == (24,)
    assert np.isnan(refls[8])  # masked gate -> NaN fill
    assert np.nanmax(refls) > 0
