"""CLI: link labels across consecutive detection files in parallel
(counterpart of ``scripts/linking_parallel.py``): overlaps between each file
pair are computed in a process pool, resolved into a global links dataset
and saved.

Usage: python -m tobac_flow_tpu.cli.linking_parallel -sd OUT detected_*.nc
"""

from __future__ import annotations

import argparse
import multiprocessing
import pathlib

from tobac_flow_tpu.cli.common import save_dataset
from tobac_flow_tpu.track.linking import (
    find_overlap_between_files,
    process_linking_output,
)


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-sd", default=".", help="Directory to save output")
    parser.add_argument("-p", default=None, type=int, help="Number of processes")
    parser.add_argument("files", nargs="+", type=str)
    args = parser.parse_args(argv)

    files = sorted(pathlib.Path(f) for f in args.files)
    pairs = list(zip(files[:-1], files[1:]))
    if not pairs:
        raise SystemExit("need at least two files to link")

    if args.p and args.p > 1:
        with multiprocessing.Pool(args.p) as pool:
            results = pool.starmap(find_overlap_between_files, pairs)
    else:
        results = [find_overlap_between_files(a, b) for a, b in pairs]

    links = process_linking_output(results)

    save_dir = pathlib.Path(args.sd)
    save_dir.mkdir(parents=True, exist_ok=True)
    start = files[0].stem.split("_S")[-1][:15]
    end = files[-1].stem.split("_E")[-1][:15] if "_E" in files[-1].stem else "end"
    save_path = save_dir / f"dcc_links_S{start}_E{end}.nc"
    save_dataset(links, save_path)
    return save_path


if __name__ == "__main__":
    main()
