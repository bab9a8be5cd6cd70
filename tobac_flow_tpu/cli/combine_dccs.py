"""CLI: combine multiple detected-DCC files with the streaming two-file
linker (counterpart of ``scripts/combine_dccs_goes.py``).

Usage: python -m tobac_flow_tpu.cli.combine_dccs -sd OUT detected_*.nc
"""

from __future__ import annotations

import argparse

from tobac_flow_tpu.track.file_linker import FileLinker


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", help="Directory to save output files", default=None)
    parser.add_argument("--file_suffix", help="Suffix to save files under", default="")
    parser.add_argument("files", help="List of files to combine", nargs="+", type=str)
    args = parser.parse_args(argv)

    linker = FileLinker(
        sorted(args.files),
        output_path=args.sd,
        output_file_suffix=args.file_suffix,
    )
    return linker.process_files()


if __name__ == "__main__":
    main()
