"""End-to-end drive of the CLI chain: detect → statistics on synthetic data.

Locks the full user-facing path (flow → cores → anvils → schema → netCDF →
per-object statistics) the way the reference's scripts compose
(``dcc_detect_goes.py`` → ``dcc_statistics_goes.py``).
"""

import glob
import os

import numpy as np

from tobac_flow_tpu.cli import dcc_detect_synthetic, dcc_statistics
from tobac_flow_tpu.data.ncdataset import open_dataset


def test_detect_then_statistics(tmp_path):
    out = str(tmp_path)
    dcc_detect_synthetic.main(["-sd", out, "-t", "10", "-y", "96", "-x", "128"])
    detected = sorted(glob.glob(os.path.join(out, "detected_*.nc")))
    assert len(detected) == 1

    ds = open_dataset(detected[0])
    cores = np.asarray(ds["core_label"].values)
    anvils = np.asarray(ds["thick_anvil_label"].values)
    assert cores.max() >= 1, "synthetic scene must yield at least one core"
    assert anvils.max() >= 1
    # every core pixel lies inside a thick anvil (cores are painted in)
    assert np.all(anvils[cores > 0] > 0)

    stats_dir = str(tmp_path / "stats")
    os.makedirs(stats_dir)
    dcc_statistics.main(["-sd", stats_dir] + detected)
    stats_files = sorted(glob.glob(os.path.join(stats_dir, "*.nc")))
    assert len(stats_files) == 1
    sds = open_dataset(stats_files[0])
    n_cores = sds.coords["core"].size
    assert n_cores >= 1
    # lifetime must be positive and bounded by the window
    lifetimes = np.asarray(sds["core_lifetime"].values, dtype="timedelta64[s]")
    assert np.all(lifetimes.astype(int) > 0)
