"""CLI: grid flux files onto a regular 1° lat/lon grid and add cloud
radiative effects (counterpart of ``scripts/grid_flux_native.py``).

Usage: python -m tobac_flow_tpu.cli.grid_flux_native -sd OUT flux_*.nc
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset
from tobac_flow_tpu.schema.postprocess import add_cre_to_dataset

FLUX_VARS = (
    "toa_swdn", "toa_swup", "toa_lwup",
    "boa_swdn", "boa_swup", "boa_lwdn", "boa_lwup",
)


def bin_to_latlon(values, lats, lons, lat_bins, lon_bins):
    """Mean of ``values`` within each 1° lat/lon cell."""
    ok = np.isfinite(values) & np.isfinite(lats) & np.isfinite(lons)
    sums, _, _ = np.histogram2d(
        lats[ok], lons[ok], bins=[lat_bins, lon_bins], weights=values[ok]
    )
    counts, _, _ = np.histogram2d(lats[ok], lons[ok], bins=[lat_bins, lon_bins])
    with np.errstate(invalid="ignore"):
        return np.where(counts > 0, sums / np.maximum(counts, 1), np.nan).astype(
            np.float32
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", help="Directory to save output", default=".")
    parser.add_argument("files", nargs="+", type=str, help="Flux netCDF files")
    args = parser.parse_args(argv)

    lon_bins = np.arange(-180.0, 181.0)
    lat_bins = np.arange(-90.0, 91.0)
    lons = lon_bins[1:] - 0.5
    lats = lat_bins[1:] - 0.5

    times = []
    gridded = {}
    for f in sorted(args.files):
        print(datetime.now(), "Gridding", f, flush=True)
        ds = open_dataset(f)
        flat = np.asarray(ds["lat"].values, np.float64).ravel()
        flon = np.asarray(ds["lon"].values, np.float64).ravel()
        times.append(np.ravel(np.asarray(ds.coords["t"]))[0])
        for var in list(FLUX_VARS) + [f"{v}_clr" for v in FLUX_VARS]:
            if var not in ds.data_vars:
                continue
            grid = bin_to_latlon(
                np.asarray(ds[var].values, np.float64).ravel(),
                flat, flon, lat_bins, lon_bins,
            )
            gridded.setdefault(var, []).append(grid)

    order = np.argsort(np.asarray(times))
    out = Dataset(
        coords={"t": np.asarray(times)[order], "lat": lats, "lon": lons}
    )
    for var, grids in gridded.items():
        out[var] = DataArray(
            np.stack([grids[i] for i in order]),
            dims=("t", "lat", "lon"),
            name=var,
            attrs={"units": "W m-2"},
        )
    # CRE needs every all-sky/clear-sky pair
    cre_ready = all(
        v in out.data_vars and f"{v}_clr" in out.data_vars
        for v in ("toa_swup", "toa_lwup", "boa_swdn", "boa_swup", "boa_lwdn",
                  "boa_lwup")
    ) and "toa_swdn" in out.data_vars
    if cre_ready:
        out = add_cre_to_dataset(out)

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    stamp = str(np.asarray(times)[order][0].astype("datetime64[s]"))
    stamp = stamp.replace("-", "").replace(":", "").replace("T", "_")
    save_path = save_dir / f"flux_regrid_S{stamp}.nc"
    save_dataset(out, save_path)
    return save_path


if __name__ == "__main__":
    main()
