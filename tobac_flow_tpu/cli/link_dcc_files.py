"""CLI: stream-link consecutive detection files and write relabelled outputs
(counterpart of ``scripts/link_dcc_files.py`` / ``combine_dccs_goes.py``).

Usage: python -m tobac_flow_tpu.cli.link_dcc_files -sd OUT detected_*.nc
"""

from __future__ import annotations

import argparse
import pathlib

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.track.file_linker import FileLinker


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-atol", default=5, type=int)
    parser.add_argument("-rtol", default=0.5, type=float)
    parser.add_argument("files", nargs="+", type=str)
    args = parser.parse_args(argv)

    files = sorted(pathlib.Path(f) for f in args.files)
    linker = FileLinker(files, args.sd, atol=args.atol, rtol=args.rtol)
    links, outputs = linker.process_files()
    links_path = pathlib.Path(args.sd) / "dcc_links.nc"
    save_dataset(links, links_path)
    print("links saved to", links_path, flush=True)
    return outputs


if __name__ == "__main__":
    main()
