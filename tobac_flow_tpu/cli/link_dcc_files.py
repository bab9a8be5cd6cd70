"""CLI: stream-link consecutive detection files and write relabelled outputs
(counterpart of ``scripts/link_dcc_files.py`` / ``combine_dccs_goes.py``).

Usage: python -m tobac_flow_tpu.cli.link_dcc_files -sd OUT detected_*.nc

With ``--linker label`` the pointer-convergence ``LabelLinker`` is used
instead of the streaming two-file ``FileLinker`` (reference
``relabel_linked_files.py`` vs ``combine_dccs_goes.py``).
"""

from __future__ import annotations

import argparse
import pathlib

from tobac_flow_tpu.track.file_linker import FileLinker, LabelLinker


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-atol", default=5, type=int)
    parser.add_argument("-rtol", default=0.5, type=float)
    parser.add_argument(
        "--linker", default="file", choices=("file", "label"),
        help="file = streaming two-file linker, label = pointer-convergence map",
    )
    parser.add_argument("files", nargs="+", type=str)
    args = parser.parse_args(argv)

    files = sorted(pathlib.Path(f) for f in args.files)
    if args.linker == "label":
        linker = LabelLinker(files, output_path=args.sd, atol=args.atol, rtol=args.rtol)
        linker.link_all()
        outputs = linker.output_files()
    else:
        linker = FileLinker(files, args.sd, atol=args.atol, rtol=args.rtol)
        outputs = linker.process_files()
    print(f"{len(outputs)} linked files saved to {args.sd}", flush=True)
    return outputs


if __name__ == "__main__":
    main()
