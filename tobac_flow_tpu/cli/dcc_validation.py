"""CLI: validate detected DCCs against GLM lightning (counterpart of
``scripts/dcc_validation.py``): grids GLM flashes onto the detection grid
and computes POD/FAR for cores and anvils.

Usage: python -m tobac_flow_tpu.cli.dcc_validation DETECTED.nc -glm GLM_DIR -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

import numpy as np

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.ncdataset import DataArray, open_dataset
from tobac_flow_tpu.validate import validate_anvils, validate_cores


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file", help="Detection netCDF file")
    parser.add_argument("-glm", default=None, help="GLM data directory (or pre-gridded flash netCDF)")
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-margin", default=10, type=int)
    parser.add_argument("-time_margin", default=3, type=int)
    args = parser.parse_args(argv)

    dataset = open_dataset(args.file)

    glm_path = pathlib.Path(args.glm) if args.glm else None
    if glm_path is not None and glm_path.is_file():
        glm_ds = open_dataset(glm_path)
        glm_grid = np.asarray(glm_ds["glm_flashes"].values)
    elif glm_path is not None:
        from tobac_flow_tpu.data.glm import create_gridded_flash_ds

        times = dataset.coords["t"]
        start = times[0].astype("datetime64[s]").item()
        end = times[-1].astype("datetime64[s]").item()
        glm_ds = create_gridded_flash_ds(dataset, start, end, glm_save_dir=glm_path)
        glm_grid = np.asarray(glm_ds["glm_flashes"].values)
    else:
        raise SystemExit("need -glm directory or gridded flash file")

    print(datetime.now(), "Validating cores", flush=True)
    pod, far = validate_cores(
        dataset, glm_grid, margin=args.margin, time_margin=args.time_margin
    )
    print(f"core POD = {pod:.3f}, FAR = {far:.3f}", flush=True)
    print(datetime.now(), "Validating anvils", flush=True)
    pod_a, far_a = validate_anvils(
        dataset, glm_grid, margin=args.margin, time_margin=args.time_margin
    )
    print(f"anvil POD = {pod_a:.3f}, FAR = {far_a:.3f}", flush=True)

    dataset["glm_flashes"] = DataArray(
        glm_grid, dims=("t", "y", "x"),
        attrs={"long_name": "number of GLM flashes detected"},
    )
    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / pathlib.Path(args.file).name.replace("detected_", "validated_")
    save_dataset(dataset, out)
    return out


if __name__ == "__main__":
    main()
