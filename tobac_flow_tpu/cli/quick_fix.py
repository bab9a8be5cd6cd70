"""CLI: repair a detection file by (re)computing per-label weighted field
statistics from companion field files (counterpart of
``scripts/quick_fix.py``, which re-attached flux statistics to existing
SEVIRI DCC files).

Usage: python -m tobac_flow_tpu.cli.quick_fix FILE -src FIELDS.nc \
    -vars toa_swup toa_lwup -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import open_dataset
from tobac_flow_tpu.detect.analysis import weighted_statistics_on_labels


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file", help="Detection file to repair", type=str)
    parser.add_argument(
        "-src", nargs="+", required=True,
        help="Field netCDF file(s) on the same (t, y, x) grid",
    )
    parser.add_argument("-vars", nargs="+", required=True, help="Field variables")
    parser.add_argument("-sd", help="Directory to save output", default=".")
    args = parser.parse_args(argv)

    filename = pathlib.Path(args.file)
    dataset = open_dataset(filename)
    if "area" in dataset.data_vars:
        weights = np.repeat(
            np.asarray(dataset["area"].values)[np.newaxis],
            dataset.coords["t"].size,
            0,
        )
    else:
        weights = np.ones(
            (dataset.coords["t"].size, dataset.coords["y"].size,
             dataset.coords["x"].size),
            np.float32,
        )

    label_groups = [
        ("core_label", "core", "core"),
        ("thick_anvil_label", "thick_anvil", "anvil"),
        ("thin_anvil_label", "thin_anvil", "anvil"),
        ("core_step_label", "core_step", "core_step"),
        ("thick_anvil_step_label", "thick_anvil_step", "thick_anvil_step"),
        ("thin_anvil_step_label", "thin_anvil_step", "thin_anvil_step"),
    ]
    for src in args.src:
        field_ds = open_dataset(src)
        for var in args.vars:
            if var not in field_ds.data_vars:
                continue
            print(datetime.now(), "Adding statistics for", var, flush=True)
            field = field_ds[var]
            for label_var, name, dim in label_groups:
                if label_var not in dataset.data_vars or dim not in dataset.coords:
                    continue
                for da in weighted_statistics_on_labels(
                    dataset[label_var], field, weights, name=name, dim=dim,
                    dtype=np.float32,
                ):
                    dataset[da.name] = da

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / filename.name
    save_dataset(dataset, save_path)
    return save_path


if __name__ == "__main__":
    main()
