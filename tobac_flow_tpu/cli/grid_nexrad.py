"""CLI: regrid NEXRAD Level-II reflectivity onto a detection file's ABI grid
(counterpart of ``scripts/grid_nexrad.py``): finds in-domain radar sites,
reads their archives (pyart when available, or pre-extracted gate netCDFs),
parallax-maps gates and composites the reflectivity.

Usage: python -m tobac_flow_tpu.cli.grid_nexrad TARGET.nc -nexrad DATA_DIR -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib
import warnings

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset
from tobac_flow_tpu.data.nexrad import (
    filter_nexrad_sites,
    get_gates_from_tar,
    regrid_nexrad,
)


def _load_gates(path):
    """Gate arrays from a Level-II tar (pyart) or a pre-extracted netCDF with
    gate_lat/gate_lon/gate_alt/gate_refl variables."""
    path = pathlib.Path(path)
    if path.suffix in (".nc", ".nc4", ".h5"):
        ds = open_dataset(path)
        return (
            np.asarray(ds["gate_lat"].values, dtype=np.float64).ravel(),
            np.asarray(ds["gate_lon"].values, dtype=np.float64).ravel(),
            np.asarray(ds["gate_alt"].values, dtype=np.float64).ravel(),
            np.asarray(ds["gate_refl"].values, dtype=np.float64).ravel(),
        )
    return get_gates_from_tar(path)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("target", help="Target netCDF with ABI grid")
    parser.add_argument("-nexrad", required=True, help="NEXRAD archive directory")
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-min_refl", default=-33.0, type=float)
    args = parser.parse_args(argv)

    goes_ds = open_dataset(args.target)
    sites = filter_nexrad_sites(goes_ds)
    print("in-domain sites:", sites, flush=True)

    nexrad_dir = pathlib.Path(args.nexrad)
    site_gates = []
    for f in sorted(nexrad_dir.glob("*")):
        if not f.is_file():
            continue
        if sites and not any(s in f.name for s in sites):
            continue
        try:
            site_gates.append(_load_gates(f))
        except Exception as exc:
            warnings.warn(f"could not read {f}: {exc}")
    if not site_gates:
        raise SystemExit("no readable NEXRAD archives for the in-domain sites")

    counts, mean = regrid_nexrad(site_gates, goes_ds, min_refl=args.min_refl)
    out = Dataset(coords={"x": goes_ds.coords["x"], "y": goes_ds.coords["y"]})
    if "goes_imager_projection" in goes_ds.data_vars:
        out["goes_imager_projection"] = goes_ds["goes_imager_projection"]
    out["nexrad_gate_count"] = DataArray(
        counts, dims=("y", "x"), attrs={"long_name": "number of radar gates"}
    )
    out["nexrad_refl_mean"] = DataArray(
        mean, dims=("y", "x"),
        attrs={"long_name": "mean radar reflectivity", "units": "dBZ"},
    )
    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / ("nexrad_regrid_" + pathlib.Path(args.target).stem + ".nc")
    save_dataset(out, save_path)
    return save_path


if __name__ == "__main__":
    main()
