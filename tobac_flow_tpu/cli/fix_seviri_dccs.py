"""CLI: repair SEVIRI DCC detection files (counterpart of
``scripts/fix_seviri_dccs.py``): re-derive the label coordinates, step
labels, core↔anvil links, quality flags and label properties of an existing
detection file in place — the maintenance pass used when schema code moved
ahead of already-processed archives.

Usage: python -m tobac_flow_tpu.cli.fix_seviri_dccs -sd OUT detected_*.nc
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import open_dataset
from tobac_flow_tpu.schema import (
    add_label_coords,
    add_step_labels,
    calculate_label_properties,
    flag_edge_labels,
    flag_nan_adjacent_labels,
    link_cores_and_anvils,
    link_step_labels,
)
from tobac_flow_tpu.utils.datetime_utils import get_dates_from_filename

# schema-derived variables that get rebuilt (everything except the rasters
# and the raw fields)
_RASTERS = ("core_label", "thick_anvil_label", "thin_anvil_label")
_KEEP = _RASTERS + (
    "goes_imager_projection", "lat", "lon", "area", "bt", "BT", "wvd", "WVD",
    "swd", "SWD",
)


def fix_file(filename, save_dir=None):
    filename = pathlib.Path(filename)
    print(datetime.now(), "Fixing", filename, flush=True)
    dataset = open_dataset(filename)
    drop = [v for v in list(dataset.data_vars) if v not in _KEEP]
    if drop:
        dataset = dataset.drop_vars(drop)

    dataset = add_label_coords(dataset)
    link_cores_and_anvils(dataset)
    add_step_labels(dataset)
    dataset = add_label_coords(dataset)
    link_step_labels(dataset)
    try:
        start_date, end_date = get_dates_from_filename(filename)
    except ValueError:
        start_date = end_date = None
    flag_edge_labels(dataset, start_date, end_date)
    field = next((n for n in ("wvd", "WVD", "bt", "BT") if n in dataset.data_vars), None)
    if field is not None:
        flag_nan_adjacent_labels(dataset, dataset[field])
    calculate_label_properties(dataset)

    out_dir = pathlib.Path(save_dir) if save_dir else filename.parent
    out_dir.mkdir(parents=True, exist_ok=True)
    save_path = out_dir / filename.name
    save_dataset(dataset, save_path)
    return save_path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", help="Directory to save repaired files", default=None)
    parser.add_argument("files", nargs="+", type=str)
    args = parser.parse_args(argv)
    return [fix_file(f, args.sd) for f in sorted(args.files)]


if __name__ == "__main__":
    main()
