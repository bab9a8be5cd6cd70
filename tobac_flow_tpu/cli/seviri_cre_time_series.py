"""CLI: CRE time series over detected objects (counterpart of
``scripts/seviri_cre_time_series.py``): for postprocessed files carrying CRE
statistics, aggregate area-weighted cloud-radiative-effect time series per
step and per object class.

Usage: python -m tobac_flow_tpu.cli.seviri_cre_time_series POSTPROCESSED.nc -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset, open_dataset
from tobac_flow_tpu.utils.stats import weighted_average_groupby


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("files", nargs="+", help="Postprocessed netCDF files")
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument(
        "-vars",
        nargs="*",
        default=["toa_net_cre", "toa_swup_cre", "toa_lwup_cre"],
        help="CRE variables (per-step statistics expected as *_mean)",
    )
    args = parser.parse_args(argv)

    out = Dataset()
    series = {}
    for f in args.files:
        ds = open_dataset(f)
        for prefix in ("core_step", "thick_anvil_step", "thin_anvil_step"):
            if f"{prefix}_t" not in ds.data_vars:
                continue
            t = np.asarray(ds[f"{prefix}_t"].values)
            area = np.asarray(ds[f"{prefix}_area"].values)
            for var in args.vars:
                name = f"{prefix}_{var}_mean"
                if name not in ds.data_vars:
                    continue
                vals = np.asarray(ds[name].values)
                # bin the step statistics into an hourly time series
                hours = t.astype("datetime64[h]")
                uniq = np.unique(hours)
                mean = weighted_average_groupby(
                    vals, area, hours.astype(np.int64), index=uniq.astype(np.int64)
                )
                key = f"{prefix}_{var}_hourly"
                series.setdefault(key, []).append((uniq, np.asarray(mean, float)))

    for key, chunks in series.items():
        times = np.concatenate([c[0] for c in chunks])
        vals = np.concatenate([c[1] for c in chunks])
        order = np.argsort(times)
        dim = f"{key}_time"
        out.coords[dim] = times[order].astype("datetime64[ns]")
        out[key] = DataArray(vals[order], dims=(dim,), name=key)

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / "cre_time_series.nc"
    save_dataset(out, save_path)
    return save_path


if __name__ == "__main__":
    main()
