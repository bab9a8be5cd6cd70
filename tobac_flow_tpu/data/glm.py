"""GLM lightning-flash gridding onto the ABI fixed grid.

Parity target: reference ``tobac_flow/glm.py`` — parallax correction of
flash locations using the GLM lightning ellipsoid (25-37), per-time-bin 2D
histogramming onto the ABI grid (``regrid_glm`` 107-145) and the
download+grid+save driver (``create_gridded_flash_ds`` 148-220).  The
lightning-ellipsoid coordinate transform (reference ``_lmatools.py:184-281``)
is implemented directly: flash lat/lon on the inflated ellipsoid are
re-projected to the surface along the satellite view ray.
"""

from __future__ import annotations

import warnings
from datetime import timedelta

import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset

__all__ = ["get_glm_parallax_offsets", "read_glm_flashes", "regrid_glm", "create_gridded_flash_ds"]

# GLM lightning ellipsoid (reference _lmatools.py:184-265): the GLM L2 fixed
# grid assumes flashes at cloud-top height on an inflated ellipsoid
_GLM_EQ_RADIUS = 6.394140e6  # equatorial radius + 16 km
_GRS80_EQ = 6378137.0
_GRS80_POL = 6356752.31414
_GLM_POL_RADIUS = _GRS80_POL + (_GLM_EQ_RADIUS - _GRS80_EQ)


def _geodetic_to_ecef(lat, lon, eq_radius, pol_radius):
    lat = np.radians(lat)
    lon = np.radians(lon)
    e2 = 1 - (pol_radius**2 / eq_radius**2)
    n = eq_radius / np.sqrt(1 - e2 * np.sin(lat) ** 2)
    x = n * np.cos(lat) * np.cos(lon)
    y = n * np.cos(lat) * np.sin(lon)
    z = n * (1 - e2) * np.sin(lat)
    return x, y, z


def _ecef_to_geodetic(x, y, z, eq_radius, pol_radius):
    # Bowring's method, one iteration (sufficient at these scales)
    e2 = 1 - (pol_radius**2 / eq_radius**2)
    ep2 = (eq_radius**2 - pol_radius**2) / pol_radius**2
    p = np.sqrt(x**2 + y**2)
    theta = np.arctan2(z * eq_radius, p * pol_radius)
    lat = np.arctan2(
        z + ep2 * pol_radius * np.sin(theta) ** 3,
        p - e2 * eq_radius * np.cos(theta) ** 3,
    )
    lon = np.arctan2(y, x)
    return np.degrees(lat), np.degrees(lon)


def get_glm_parallax_offsets(lat, lon, sat_lon=-75.0, sat_height=35786023.0):
    """Parallax-corrected (lat, lon) of GLM flashes: the L2 location on the
    lightning ellipsoid is re-projected along the satellite ray onto the
    GRS80 surface (reference ``glm.py:25-37``)."""
    # flash position on the inflated ellipsoid
    fx, fy, fz = _geodetic_to_ecef(lat, lon, _GLM_EQ_RADIUS, _GLM_POL_RADIUS)
    # satellite position
    sx, sy, sz = _geodetic_to_ecef(0.0, sat_lon, _GRS80_EQ + sat_height, _GRS80_POL + sat_height)
    # ray from satellite through the flash; intersect with the GRS80 ellipsoid
    dx, dy, dz = fx - sx, fy - sy, fz - sz
    a = (dx**2 + dy**2) / _GRS80_EQ**2 + dz**2 / _GRS80_POL**2
    b = 2 * ((sx * dx + sy * dy) / _GRS80_EQ**2 + sz * dz / _GRS80_POL**2)
    c = (sx**2 + sy**2) / _GRS80_EQ**2 + sz**2 / _GRS80_POL**2 - 1.0
    disc = np.maximum(b**2 - 4 * a * c, 0.0)
    t = (-b - np.sqrt(disc)) / (2 * a)
    px, py, pz = sx + t * dx, sy + t * dy, sz + t * dz
    return _ecef_to_geodetic(px, py, pz, _GRS80_EQ, _GRS80_POL)


def get_corrected_glm_x_y(flash_lats, flash_lons, goes_ds):
    """Parallax-corrected fixed-grid scan angles of flashes (reference
    ``glm.py:40-70``)."""
    from tobac_flow_tpu.data.abi import get_abi_proj

    proj = get_abi_proj(goes_ds)
    lat_c, lon_c = get_glm_parallax_offsets(
        flash_lats, flash_lons, sat_lon=proj.lon0, sat_height=proj.h - proj.req
    )
    return proj.to_xy(lat_c, lon_c)


def get_uncorrected_glm_x_y(flash_lats, flash_lons, goes_ds):
    """Fixed-grid scan angles without parallax correction (reference
    ``glm.py:73-104``)."""
    from tobac_flow_tpu.data.abi import get_abi_proj

    return get_abi_proj(goes_ds).to_xy(flash_lats, flash_lons)


def read_glm_flashes(files):
    """Flash (time, lat, lon, energy) arrays from GLM L2 LCFA files."""
    times, lats, lons, energies = [], [], [], []
    for f in files:
        try:
            ds = open_dataset(f)
            lats.append(np.asarray(ds["flash_lat"].values, dtype=np.float64))
            lons.append(np.asarray(ds["flash_lon"].values, dtype=np.float64))
            if "flash_energy" in ds.data_vars:
                energies.append(np.asarray(ds["flash_energy"].values, dtype=np.float64))
            else:
                energies.append(np.ones_like(lats[-1]))
            t = ds["flash_time_offset_of_first_event"]
            times.append(np.asarray(t.values).astype("datetime64[ns]"))
        except Exception as exc:
            warnings.warn(f"could not read {f}: {exc}")
    if not lats:
        return (
            np.empty(0, "datetime64[ns]"),
            np.empty(0),
            np.empty(0),
            np.empty(0),
        )
    return (
        np.concatenate(times),
        np.concatenate(lats),
        np.concatenate(lons),
        np.concatenate(energies),
    )


def regrid_glm(flash_times, flash_lats, flash_lons, goes_ds, t_bins, correct_parallax=True):
    """Histogram flashes onto the ABI grid per time bin
    (reference ``glm.py:107-145``).  goes_ds must carry x/y scan-angle coords
    and goes_imager_projection metadata."""
    from tobac_flow_tpu.data.abi import get_abi_proj

    proj = get_abi_proj(goes_ds)
    if correct_parallax and flash_lats.size:
        flash_lats, flash_lons = get_glm_parallax_offsets(
            flash_lats, flash_lons, sat_lon=proj.lon0, sat_height=proj.h - proj.req
        )
    fx, fy = proj.to_xy(flash_lats, flash_lons) if flash_lats.size else (
        np.empty(0), np.empty(0)
    )

    x = np.asarray(goes_ds.coords["x"], dtype=np.float64)
    y = np.asarray(goes_ds.coords["y"], dtype=np.float64)

    def edges(c):
        mid = 0.5 * (c[1:] + c[:-1])
        first = c[0] - (c[1] - c[0]) / 2
        last = c[-1] + (c[-1] - c[-2]) / 2
        return np.concatenate([[first], mid, [last]])

    x_edges = edges(x)
    y_edges = edges(y)
    # y scan angles decrease northwards in ABI files; histogram needs
    # monotonically increasing edges
    y_flip = y_edges[0] > y_edges[-1]
    if y_flip:
        y_edges = y_edges[::-1]

    counts = np.zeros((len(t_bins) - 1, y.size, x.size), dtype=np.int32)
    if flash_lats.size:
        tidx = np.searchsorted(t_bins, flash_times, side="right") - 1
        ok = (tidx >= 0) & (tidx < len(t_bins) - 1) & np.isfinite(fx) & np.isfinite(fy)
        for ti in np.unique(tidx[ok]):
            wh = ok & (tidx == ti)
            h, _, _ = np.histogram2d(fy[wh], fx[wh], bins=[y_edges, x_edges])
            counts[ti] = h[::-1] if y_flip else h
    return counts


def create_gridded_flash_ds(goes_ds, start_date, end_date, glm_save_dir=".", io_kwargs=None):
    """Find GLM files, grid the flashes onto the goes_ds grid at its time
    steps, and return a Dataset (reference ``glm.py:148-220``)."""
    from tobac_flow_tpu.data.io import find_glm_files

    io_kwargs = io_kwargs or {}
    files = find_glm_files(
        start_date, end_date, save_dir=glm_save_dir, **io_kwargs
    )
    flash_times, flash_lats, flash_lons, _ = read_glm_flashes(files)
    times = np.asarray(goes_ds.coords["t"])
    half = np.diff(times) / 2
    t_bins = np.concatenate(
        [
            [times[0] - (half[0] if half.size else np.timedelta64(150, "s"))],
            times[:-1] + half,
            [times[-1] + (half[-1] if half.size else np.timedelta64(150, "s"))],
        ]
    )
    counts = regrid_glm(flash_times, flash_lats, flash_lons, goes_ds, t_bins)
    out = Dataset(coords=dict(goes_ds.coords))
    out["glm_flashes"] = DataArray(
        counts,
        dims=("t", "y", "x"),
        attrs={"long_name": "number of GLM flashes detected", "units": ""},
    )
    return out
