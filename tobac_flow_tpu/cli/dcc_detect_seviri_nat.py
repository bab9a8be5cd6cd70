"""CLI: DCC detection over native-format SEVIRI archives (counterpart of
``scripts/dcc_detect_seviri_nat.py``; the .nat decoding is from-scratch —
``data/seviri_nat.py`` — instead of satpy).

Usage: python -m tobac_flow_tpu.cli.dcc_detect_seviri_nat -sd OUT *.nat
"""

from __future__ import annotations

import argparse
import pathlib
from datetime import datetime

from tobac_flow_tpu.cli.common import DetectionOptions, run_detection, save_dataset
from tobac_flow_tpu.data.ncdataset import Dataset
from tobac_flow_tpu.data.seviri_nat import seviri_nat_dataloader


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-x0", default=None, type=int)
    parser.add_argument("-x1", default=None, type=int)
    parser.add_argument("-y0", default=None, type=int)
    parser.add_argument("-y1", default=None, type=int)
    parser.add_argument("--save_spatial_props", action="store_true")
    parser.add_argument("files", nargs="+", type=str)
    args = parser.parse_args(argv)

    bt, wvd, twd = seviri_nat_dataloader(
        None, None, args.files, x0=args.x0, x1=args.x1, y0=args.y0, y1=args.y1
    )
    ds = Dataset(coords=dict(bt.coords))
    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    opts = DetectionOptions(
        save_spatial_props=args.save_spatial_props,
        checkpoint_path=save_dir / "dcc_detect_seviri_nat.checkpoint.nc",
    )
    ds = run_detection(bt, wvd, twd, ds, opts=opts)
    ds.attrs.update(
        title="Detected DCCs in Meteosat SEVIRI native observations (tobac-flow-tpu)",
        history=f"Processed on {datetime.now().isoformat()}",
        references="https://doi.org/10.5194/amt-16-1043-2023",
    )

    times = bt.coords["t"]
    start = str(times[0].astype("datetime64[s]")).replace("-", "").replace(":", "")
    save_path = save_dir / f"detected_dccs_SEVIRI_S{start}.nc"
    save_dataset(ds, save_path)
    return save_path


if __name__ == "__main__":
    main()
