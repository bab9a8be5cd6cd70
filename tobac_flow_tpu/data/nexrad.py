"""NEXRAD Level-II reflectivity regridding onto the ABI fixed grid.

Parity target: reference ``tobac_flow/nexrad.py`` — radar gate extraction
(21-58, there via arm_pyart), parallax mapping of gates to the GOES grid
(60-77), 2D/3D reflectivity histograms (80-178), multi-site merging
(``regrid_nexrad`` 194-232), the site tables (234-572) and the in-domain
site filter (573-588).

arm_pyart is not available in this image, so Level-II decoding is pluggable:
``get_gates_from_tar`` uses pyart when importable and otherwise raises with
instructions; every downstream step takes plain (lat, lon, alt, refl) gate
arrays.  The site table ships as a bundled CSV of the public NWS site list
(subset; extend ``NEXRAD_SITES`` as needed).
"""

from __future__ import annotations


import numpy as np

__all__ = [
    "get_gates_from_tar",
    "map_nexrad_to_goes",
    "get_nexrad_hist",
    "get_3d_nexrad_hist",
    "regrid_nexrad",
    "get_nexrad_sitenames",
    "get_nexrad_site_latlons",
    "filter_nexrad_sites",
]

# public NWS WSR-88D site locations (site: lat, lon) — CONUS subset
NEXRAD_SITES = {
    "KABR": (45.4558, -98.4131), "KAMA": (35.2334, -101.7092),
    "KBIS": (46.7708, -100.7608), "KBMX": (33.1722, -86.7698),
    "KBOX": (41.9558, -71.1369), "KBRO": (25.9159, -97.4189),
    "KBUF": (42.9488, -78.7369), "KCLE": (41.4131, -81.8597),
    "KCYS": (41.1519, -104.8061), "KDDC": (37.7608, -99.9689),
    "KDVN": (41.6116, -90.5809), "KEAX": (38.8103, -94.2644),
    "KFFC": (33.3636, -84.5658), "KFTG": (39.7866, -104.5458),
    "KFWS": (32.5731, -97.3031), "KGLD": (39.3667, -101.7004),
    "KHGX": (29.4719, -95.0789), "KICT": (37.6546, -97.4431),
    "KILN": (39.4203, -83.8217), "KINX": (36.1750, -95.5644),
    "KJAX": (30.4847, -81.7019), "KLIX": (30.3367, -89.8256),
    "KLSX": (38.6989, -90.6828), "KLVX": (37.9753, -85.9439),
    "KMAF": (31.9433, -102.1892), "KMHX": (34.7759, -76.8762),
    "KMKX": (42.9678, -88.5506), "KMLB": (28.1133, -80.6542),
    "KMPX": (44.8489, -93.5656), "KOAX": (41.3203, -96.3667),
    "KOHX": (36.2472, -86.5625), "KOKX": (40.8656, -72.8639),
    "KPAH": (37.0683, -88.7720), "KSGF": (37.2353, -93.4003),
    "KSHV": (32.4508, -93.8414), "KTBW": (27.7056, -82.4017),
    "KTLX": (35.3331, -97.2778), "KTWX": (38.9969, -96.2325),
    "KUDX": (44.1250, -102.8297), "KUEX": (40.3208, -98.4419),
    "TJUA": (18.1156, -66.0781),
}


def get_nexrad_sitenames():
    """Known WSR-88D site identifiers (reference ``nexrad.py:234-397``)."""
    return sorted(NEXRAD_SITES.keys())


def get_nexrad_site_latlons(sites=None):
    """(lats, lons) arrays for the given sites (reference 400-572)."""
    if sites is None:
        sites = get_nexrad_sitenames()
    lats = np.array([NEXRAD_SITES[s][0] for s in sites])
    lons = np.array([NEXRAD_SITES[s][1] for s in sites])
    return lats, lons


def get_gates_from_tar(nexrad_archive):
    """Extract (lat, lon, alt, reflectivity) gate arrays from a Level-II tar
    archive (reference ``nexrad.py:21-58``).  Requires arm_pyart."""
    try:
        import pyart  # noqa: F401
    except ImportError as exc:
        raise ImportError(
            "reading NEXRAD Level-II archives requires arm_pyart, which is "
            "not available in this environment; pass pre-extracted gate "
            "arrays to the gridding functions instead"
        ) from exc
    import tarfile
    import tempfile

    lats, lons, alts, refls = [], [], [], []
    with tarfile.open(nexrad_archive) as tar:
        for member in tar.getmembers():
            if not member.isfile():
                continue
            with tempfile.NamedTemporaryFile(suffix="_V06") as tmp:
                tmp.write(tar.extractfile(member).read())
                tmp.flush()
                radar = pyart.io.read_nexrad_archive(tmp.name)
                lat, lon, alt = radar.get_gate_lat_lon_alt(0)
                for sweep in range(radar.nsweeps):
                    lat, lon, alt = radar.get_gate_lat_lon_alt(sweep)
                    refl = radar.get_field(sweep, "reflectivity")
                    lats.append(lat.ravel())
                    lons.append(lon.ravel())
                    alts.append(alt.ravel())
                    refls.append(np.ma.filled(refl, np.nan).ravel())
    return (
        np.concatenate(lats),
        np.concatenate(lons),
        np.concatenate(alts),
        np.concatenate(refls),
    )


def map_nexrad_to_goes(nexrad_lat, nexrad_lon, nexrad_alt, goes_ds):
    """Parallax-map radar gates (at altitude) to fixed-grid scan angles as
    seen by the satellite (reference ``nexrad.py:60-77``)."""
    from tobac_flow_tpu.data.abi import get_abi_proj

    proj = get_abi_proj(goes_ds)
    # displace the gate position along the satellite view ray: a scatterer at
    # altitude h at surface distance d from nadir appears at the surface
    # intersection of the ray — approximate with the standard parallax shift
    lat = np.asarray(nexrad_lat, dtype=np.float64)
    lon = np.asarray(nexrad_lon, dtype=np.float64)
    alt = np.asarray(nexrad_alt, dtype=np.float64)
    zen = np.radians(proj.sat_zenith(lat, lon))
    shift = alt * np.tan(zen)  # metres along the surface away from nadir
    # direction away from the sub-satellite point
    dlat = lat - 0.0
    dlon = lon - proj.lon0
    norm = np.sqrt(dlat**2 + (dlon * np.cos(np.radians(lat))) ** 2) + 1e-12
    m_per_deg = 111.32e3
    lat_c = lat + shift * (dlat / norm) / m_per_deg
    lon_c = lon + shift * (dlon / norm) / (m_per_deg * np.cos(np.radians(lat)))
    return proj.to_xy(lat_c, lon_c)


def _grid_edges(coord):
    c = np.asarray(coord, dtype=np.float64)
    mid = 0.5 * (c[1:] + c[:-1])
    return np.concatenate([[c[0] - (c[1] - c[0]) / 2], mid, [c[-1] + (c[-1] - c[-2]) / 2]])


def get_nexrad_hist(gate_x, gate_y, gate_refl, goes_ds, min_refl=-33.0):
    """(count, mean reflectivity) 2D histograms of gates on the ABI grid
    (reference ``nexrad.py:80-119``)."""
    x_edges = _grid_edges(goes_ds.coords["x"])
    y_edges = _grid_edges(goes_ds.coords["y"])
    y_flip = y_edges[0] > y_edges[-1]
    if y_flip:
        y_edges = y_edges[::-1]
    ok = np.isfinite(gate_x) & np.isfinite(gate_y) & np.isfinite(gate_refl)
    ok &= gate_refl >= min_refl
    counts, _, _ = np.histogram2d(gate_y[ok], gate_x[ok], bins=[y_edges, x_edges])
    sums, _, _ = np.histogram2d(
        gate_y[ok], gate_x[ok], bins=[y_edges, x_edges], weights=gate_refl[ok]
    )
    if y_flip:
        counts = counts[::-1]
        sums = sums[::-1]
    with np.errstate(invalid="ignore"):
        mean = np.where(counts > 0, sums / np.maximum(counts, 1), np.nan)
    return counts.astype(np.int32), mean.astype(np.float32)


def get_3d_nexrad_hist(
    gate_x, gate_y, gate_alt, gate_refl, goes_ds, alt_edges=None, min_refl=-33.0
):
    """3D (altitude-resolved) reflectivity histogram
    (reference ``nexrad.py:122-178``)."""
    if alt_edges is None:
        alt_edges = np.arange(0, 20001, 1000.0)
    x_edges = _grid_edges(goes_ds.coords["x"])
    y_edges = _grid_edges(goes_ds.coords["y"])
    y_flip = y_edges[0] > y_edges[-1]
    if y_flip:
        y_edges = y_edges[::-1]
    ok = (
        np.isfinite(gate_x)
        & np.isfinite(gate_y)
        & np.isfinite(gate_refl)
        & (gate_refl >= min_refl)
    )
    sample = np.stack([gate_alt[ok], gate_y[ok], gate_x[ok]], axis=-1)
    counts, _ = np.histogramdd(sample, bins=[alt_edges, y_edges, x_edges])
    sums, _ = np.histogramdd(
        sample, bins=[alt_edges, y_edges, x_edges], weights=gate_refl[ok]
    )
    if y_flip:
        counts = counts[:, ::-1]
        sums = sums[:, ::-1]
    mean = np.where(counts > 0, sums / np.maximum(counts, 1), np.nan)
    return counts.astype(np.int32), mean.astype(np.float32)


def regrid_nexrad(site_gates, goes_ds, **kwargs):
    """Merge per-site gate arrays into one gridded reflectivity field
    (reference ``nexrad.py:194-232``): max-reflectivity composite where
    sites overlap.

    site_gates: list of (lat, lon, alt, refl) tuples per site.
    """
    merged_counts = None
    merged_mean = None
    for lat, lon, alt, refl in site_gates:
        gx, gy = map_nexrad_to_goes(lat, lon, alt, goes_ds)
        counts, mean = get_nexrad_hist(gx, gy, refl, goes_ds, **kwargs)
        if merged_counts is None:
            merged_counts, merged_mean = counts, mean
        else:
            merged_counts = merged_counts + counts
            merged_mean = np.where(
                np.isnan(merged_mean),
                mean,
                np.where(np.isnan(mean), merged_mean, np.fmax(merged_mean, mean)),
            )
    return merged_counts, merged_mean


def filter_nexrad_sites(goes_ds, extend=0.005):
    """Sites whose location falls inside the dataset's fixed-grid extent
    (reference ``nexrad.py:573-588``)."""
    from tobac_flow_tpu.data.abi import get_abi_proj

    proj = get_abi_proj(goes_ds)
    x = np.asarray(goes_ds.coords["x"], dtype=np.float64)
    y = np.asarray(goes_ds.coords["y"], dtype=np.float64)
    x0, x1 = min(x[0], x[-1]) - extend, max(x[0], x[-1]) + extend
    y0, y1 = min(y[0], y[-1]) - extend, max(y[0], y[-1]) + extend
    sites = get_nexrad_sitenames()
    lats, lons = get_nexrad_site_latlons(sites)
    sx, sy = proj.to_xy(lats, lons)
    keep = (sx >= x0) & (sx <= x1) & (sy >= y0) & (sy <= y1)
    keep &= np.isfinite(sx) & np.isfinite(sy)
    return [s for s, k in zip(sites, keep) if k]
