"""CLI: grid GLM lightning flashes onto a detection file's ABI grid
(counterpart of ``scripts/grid_glm.py``).

Usage: python -m tobac_flow_tpu.cli.grid_glm DETECTED.nc -glm GLM_DIR -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.data.glm import create_gridded_flash_ds
from tobac_flow_tpu.data.ncdataset import open_dataset


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("file", help="Detection (or geometry) netCDF file")
    parser.add_argument("-glm", default=".", help="GLM data directory")
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("--download", action="store_true")
    args = parser.parse_args(argv)

    goes_ds = open_dataset(args.file)
    times = goes_ds.coords["t"]
    start = times[0].astype("datetime64[s]").item()
    end = times[-1].astype("datetime64[s]").item()
    flash_ds = create_gridded_flash_ds(
        goes_ds, start, end, glm_save_dir=args.glm,
        io_kwargs={"download_missing": args.download},
    )
    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    out = save_dir / pathlib.Path(args.file).name.replace("detected_", "gridded_glm_")
    save_dataset(flash_ds, out)
    return out


if __name__ == "__main__":
    main()
