"""Standalone day-scene builder: produce exactly the spill files
``tools/bench_e2e.py`` would build, so a CONUS round can start the
(CPU-bound, 15-25 min) scene build at minute 0 while the TPU side warms or
other work proceeds, and the later ``bench_e2e.py`` invocation opens the
cached scene instantly.

Usage:  python tools/build_scene.py -t 288 -y 1500 -x 2500
"""

from __future__ import annotations

import argparse
import sys
from datetime import datetime
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tools"))

from bench_e2e import make_day_scene  # noqa: E402


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-t", default=288, type=int)
    parser.add_argument("-y", default=1500, type=int)
    parser.add_argument("-x", default=2500, type=int)
    parser.add_argument("--cells", default=None, type=int)
    parser.add_argument("--seed", default=0, type=int)
    args = parser.parse_args(argv)
    t, h, w = args.t, args.y, args.x

    stem = Path("/tmp/tft_scenes")
    stem.mkdir(parents=True, exist_ok=True)
    paths = [
        stem / f"e2e_{n}_{t}x{h}x{w}_c{args.cells}_s{args.seed}.npy"
        for n in ("bt", "wvd", "swd")
    ]
    # sentinel written LAST: a build killed mid-way leaves the memmaps on
    # disk but no sentinel, so the cache check rejects the half-written scene
    done = stem / f"e2e_{t}x{h}x{w}_c{args.cells}_s{args.seed}.done"
    if done.exists() and all(p.exists() for p in paths):
        print(datetime.now(), "scene already cached:", paths[0], flush=True)
        return
    print(datetime.now(), f"building {t}x{h}x{w} spilled day scene", flush=True)
    fields = [
        np.lib.format.open_memmap(p, mode="w+", dtype=np.float32, shape=(t, h, w))
        for p in paths
    ]
    make_day_scene(t, h, w, n_cells=args.cells, seed=args.seed, out=fields)
    for f in fields:
        f.flush()
    done.touch()
    print(datetime.now(), "done:", *[p.name for p in paths], flush=True)


if __name__ == "__main__":
    main()
