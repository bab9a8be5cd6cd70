"""CLI: detect DCCs in Meteosat SEVIRI data (counterpart of
``scripts/dcc_detect_seviri_nat.py`` / ``dcc_detect_seviri.py``).

satpy is not available in this image, so input is a directory of
pre-converted per-timestep netCDF channel files (IR_108 / WV_062 / WV_073 /
IR_087 / IR_120, or ORAC-style ch5/ch6/ch9/ch10); the science pipeline and
thresholds are identical to the GOES path.

Usage: python -m tobac_flow_tpu.cli.dcc_detect_seviri -files SEVIRI_DIR/*.nc -sd OUT
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

from tobac_flow_tpu.cli.common import DetectionOptions, run_detection, save_dataset
from tobac_flow_tpu.data.dataloader import seviri_dataloader
from tobac_flow_tpu.data.ncdataset import Dataset


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("files", nargs="+", help="SEVIRI channel netCDF files")
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-x0", default=None, type=int)
    parser.add_argument("-x1", default=None, type=int)
    parser.add_argument("-y0", default=None, type=int)
    parser.add_argument("-y1", default=None, type=int)
    parser.add_argument("--save_spatial_props", action="store_true")
    args = parser.parse_args(argv)

    bt, wvd, swd = seviri_dataloader(
        None, None, args.files, x0=args.x0, x1=args.x1, y0=args.y0, y1=args.y1
    )
    ds = Dataset(coords=dict(bt.coords))
    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    opts = DetectionOptions(
        save_spatial_props=args.save_spatial_props,
        checkpoint_path=save_dir / "dcc_detect_seviri.checkpoint.nc",
    )
    ds = run_detection(bt, wvd, swd, ds, opts=opts)
    ds.attrs.update(
        title="Detected DCCs in Meteosat SEVIRI observations (tobac-flow-tpu)",
        history=f"Processed on {datetime.now().isoformat()}",
        references="https://doi.org/10.5194/amt-16-1043-2023",
    )

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    times = bt.coords["t"]
    start = str(times[0].astype("datetime64[s]")).replace("-", "").replace(":", "")
    save_path = save_dir / f"detected_dccs_SEVIRI_S{start}.nc"
    save_dataset(ds, save_path)
    return save_path


if __name__ == "__main__":
    main()
