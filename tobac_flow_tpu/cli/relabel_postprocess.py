"""CLI: apply a links file to a detection file, then postprocess in one pass
(counterpart of ``scripts/relabel_postprocess_goes.py`` /
``relabel_postprocess_seviri_cci.py``): relabel → label properties →
optional spatial properties → per-step weighted field statistics → save.

Usage: python -m tobac_flow_tpu.cli.relabel_postprocess FILE LINKS -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import open_dataset
from tobac_flow_tpu.detect.analysis import (
    get_label_stats,
    weighted_statistics_on_labels,
)
from tobac_flow_tpu.schema import calculate_label_properties
from tobac_flow_tpu.track.linking import relabel_file
from tobac_flow_tpu.utils.datetime_utils import get_dates_from_filename


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file", help="Detection file to relabel", type=str)
    parser.add_argument("links_file", help="Links file with the new labels", type=str)
    parser.add_argument("-sd", help="Directory to save output", default="")
    parser.add_argument(
        "-sdf", help="Date formatting string for subdirectories", default=""
    )
    parser.add_argument("--save_spatial_props", action="store_true")
    args = parser.parse_args(argv)

    filename = pathlib.Path(args.file)
    if not filename.exists():
        raise FileNotFoundError(filename)
    start_date, _ = get_dates_from_filename(filename)

    save_path = pathlib.Path(args.sd or ".")
    if args.sdf:
        save_path = save_path / start_date.strftime(args.sdf)
    save_path.mkdir(parents=True, exist_ok=True)
    save_path = save_path / filename.name

    links_ds = open_dataset(args.links_file)
    dataset = relabel_file(filename, links_ds)

    print(datetime.now(), "Calculating label properties", flush=True)
    calculate_label_properties(dataset)

    if args.save_spatial_props:
        print(datetime.now(), "Calculating spatial properties", flush=True)
        for var in ("core_label", "thick_anvil_label", "thin_anvil_label"):
            get_label_stats(dataset[var], dataset)

    bt_name = next((n for n in ("bt", "BT") if n in dataset.data_vars), None)
    if bt_name is not None:
        print(datetime.now(), "Calculating statistics", flush=True)
        if "area" in dataset.data_vars:
            weights = np.repeat(
                np.asarray(dataset["area"].values)[np.newaxis],
                dataset.coords["t"].size,
                0,
            )
        else:
            weights = np.ones_like(np.asarray(dataset[bt_name].values))
        field = dataset[bt_name]
        for labels, name, dim in [
            (dataset["core_step_label"], "core_step", "core_step"),
            (
                dataset["thick_anvil_step_label"],
                "thick_anvil_step",
                "thick_anvil_step",
            ),
            (dataset["thin_anvil_step_label"], "thin_anvil_step", "thin_anvil_step"),
        ]:
            for da in weighted_statistics_on_labels(
                labels, field, weights, name=name, dim=dim, dtype=np.float32
            ):
                dataset[da.name] = da
        # the raster is only needed for the statistics — drop it to shrink
        # the output (reference relabel_postprocess_goes.py:99-100)
        dataset = dataset.drop_vars(bt_name)

    save_dataset(dataset, save_path)
    return save_path


if __name__ == "__main__":
    main()
