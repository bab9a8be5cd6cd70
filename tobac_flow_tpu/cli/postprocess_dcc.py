"""CLI: post-process detected DCCs with per-object statistics from auxiliary
field files (counterpart of ``scripts/postprocess_goes_dcc.py`` /
``postprocess_seviri_dcc.py``): weighted per-label statistics of requested
variables, optional CRE fields, object property aggregation and validity
flags.

Usage: python -m tobac_flow_tpu.cli.postprocess_dcc DETECTED.nc \
    -fields FIELDS.nc -vars ctt cth cre -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import open_dataset
from tobac_flow_tpu.schema.postprocess import (
    add_cre_to_dataset,
    add_validity_flags,
    add_weighted_stats_to_dataset,
    process_core_properties,
    process_thick_anvil_properties,
    process_thin_anvil_properties,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file", help="Detection netCDF file")
    parser.add_argument("-fields", default=None, help="Auxiliary field netCDF file")
    parser.add_argument("-vars", nargs="*", default=[], help="Variables to aggregate")
    parser.add_argument("--cre", action="store_true", help="Compute CRE fields first")
    parser.add_argument("-sd", default=".", help="Directory to save output")
    args = parser.parse_args(argv)

    dataset = open_dataset(args.file)

    if args.fields:
        fields = open_dataset(args.fields)
        if args.cre:
            fields = add_cre_to_dataset(fields)
        if "area" in dataset:
            weights = np.repeat(
                np.asarray(dataset["area"].values)[np.newaxis],
                dataset.coords["t"].size,
                0,
            )
        else:
            weights = np.ones(dataset["core_label"].shape)
        for var in args.vars:
            for dim, dim_name in [
                ("core", "core"),
                ("anvil", "thick_anvil"),
                ("anvil", "thin_anvil"),
                ("core_step", "core_step"),
                ("thick_anvil_step", "thick_anvil_step"),
                ("thin_anvil_step", "thin_anvil_step"),
            ]:
                if f"{dim_name}_label" in dataset or f"{dim_name}_label" in dataset.data_vars:
                    add_weighted_stats_to_dataset(
                        dataset, fields, weights, var, dim, dim_name=dim_name
                    )

    print(datetime.now(), "Aggregating object properties", flush=True)
    dataset = process_core_properties(dataset)
    dataset = process_thick_anvil_properties(dataset)
    dataset = process_thin_anvil_properties(dataset)
    dataset = add_validity_flags(dataset)

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / pathlib.Path(args.file).name.replace(
        "detected_", "postprocessed_"
    )
    save_dataset(dataset, out)
    return out


if __name__ == "__main__":
    main()
