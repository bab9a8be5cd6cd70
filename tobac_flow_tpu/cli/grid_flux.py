"""CLI: regrid flux/field data from a lat/lon grid onto a detection file's
ABI fixed grid (counterpart of ``scripts/grid_flux.py`` /
``grid_flux_native.py``): each source cell is projected to fixed-grid scan
angles and area-averaged into the target pixels.

Usage: python -m tobac_flow_tpu.cli.grid_flux TARGET.nc -src FLUX.nc \
    -vars toa_swup toa_lwup -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.abi import get_abi_proj
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset


def regrid_latlon_to_abi(values, lats, lons, goes_ds):
    """Histogram-average a lat/lon field onto the fixed grid."""
    proj = get_abi_proj(goes_ds)
    gx, gy = proj.to_xy(lats, lons)
    x = np.asarray(goes_ds.coords["x"], dtype=np.float64)
    y = np.asarray(goes_ds.coords["y"], dtype=np.float64)

    def edges(c):
        mid = 0.5 * (c[1:] + c[:-1])
        return np.concatenate(
            [[c[0] - (c[1] - c[0]) / 2], mid, [c[-1] + (c[-1] - c[-2]) / 2]]
        )

    xe, ye = edges(x), edges(y)
    flip = ye[0] > ye[-1]
    if flip:
        ye = ye[::-1]
    ok = np.isfinite(gx) & np.isfinite(gy) & np.isfinite(values)
    counts, _, _ = np.histogram2d(gy[ok], gx[ok], bins=[ye, xe])
    sums, _, _ = np.histogram2d(gy[ok], gx[ok], bins=[ye, xe], weights=values[ok])
    if flip:
        counts, sums = counts[::-1], sums[::-1]
    with np.errstate(invalid="ignore"):
        return np.where(counts > 0, sums / np.maximum(counts, 1), np.nan).astype(
            np.float32
        )


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("target", help="Target netCDF with ABI grid")
    parser.add_argument("-src", required=True, help="Source field netCDF (lat/lon)")
    parser.add_argument("-vars", nargs="+", required=True)
    parser.add_argument("-sd", default=".", help="Directory to save output")
    args = parser.parse_args(argv)

    goes_ds = open_dataset(args.target)
    src = open_dataset(args.src)
    lats = np.asarray(src["lat"].values, dtype=np.float64)
    lons = np.asarray(src["lon"].values, dtype=np.float64)
    if lats.ndim == 1:
        lons, lats = np.meshgrid(lons, lats)

    out = Dataset(coords={"x": goes_ds.coords["x"], "y": goes_ds.coords["y"]})
    if "goes_imager_projection" in goes_ds.data_vars:
        out["goes_imager_projection"] = goes_ds["goes_imager_projection"]
    for var in args.vars:
        vals = np.asarray(src[var].values, dtype=np.float64)
        if vals.ndim == 2:
            grid = regrid_latlon_to_abi(vals.ravel(), lats.ravel(), lons.ravel(), goes_ds)
            out[var] = DataArray(grid, dims=("y", "x"), attrs=dict(src[var].attrs))
        else:  # (t, y, x)
            frames = np.stack(
                [
                    regrid_latlon_to_abi(
                        v.ravel(), lats.ravel(), lons.ravel(), goes_ds
                    )
                    for v in vals
                ]
            )
            out.coords["t"] = np.asarray(src.coords["t"])
            out[var] = DataArray(frames, dims=("t", "y", "x"), attrs=dict(src[var].attrs))

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / ("gridded_flux_" + pathlib.Path(args.src).name)
    save_dataset(out, save_path)
    return save_path


if __name__ == "__main__":
    main()
