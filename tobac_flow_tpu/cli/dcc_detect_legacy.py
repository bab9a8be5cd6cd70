"""CLI: legacy detection pipeline (counterpart of ``scripts/dcc_detect.py``,
the oldest GOES pipeline): multichannel growth markers +
``edge_watershed`` instead of the current core/anvil chain.

Usage: python -m tobac_flow_tpu.cli.dcc_detect_legacy -sd OUT  (synthetic), or
       with -files for pre-converted netCDF input.
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.core.flow import create_flow
from tobac_flow_tpu.data.ncdataset import DataArray, Dataset
from tobac_flow_tpu.detect import detect_growth_markers_multichannel, edge_watershed


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-t", default=12, type=int)
    parser.add_argument("-y", default=96, type=int)
    parser.add_argument("-x", default=128, type=int)
    args = parser.parse_args(argv)

    from tobac_flow_tpu.cli.dcc_detect_synthetic import make_scene

    bt, wvd, swd = make_scene(args.t, args.y, args.x)
    print(datetime.now(), "Calculating flow", flush=True)
    flow = create_flow(bt, model="Farneback", vr_steps=1, smoothing_passes=1)

    print(datetime.now(), "Detecting growth markers (legacy)", flush=True)
    wvd_smoothed, bt_smoothed, markers = detect_growth_markers_multichannel(
        flow, wvd, bt
    )
    print("marker count:", int(np.max(markers)), flush=True)

    print(datetime.now(), "Edge watershed (legacy)", flush=True)
    labels = edge_watershed(flow, wvd - swd, markers, -5, -15)

    ds = Dataset(coords={"t": bt.coords["t"], "y": bt.coords["y"], "x": bt.coords["x"]})
    ds["growth_markers"] = DataArray(
        np.asarray(markers, dtype=np.int32), dims=("t", "y", "x"),
        attrs={"long_name": "legacy growth-marker labels"},
    )
    ds["watershed_label"] = DataArray(
        np.asarray(labels, dtype=np.int32), dims=("t", "y", "x"),
        attrs={"long_name": "legacy edge-watershed labels"},
    )
    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    save_path = save_dir / "detected_dccs_legacy.nc"
    save_dataset(ds, save_path)
    return save_path


if __name__ == "__main__":
    main()
