"""Synthetic GOES-like DCC scenes for end-to-end tests and benchmarks.

Builds an advecting, growing cold cloud in brightness-temperature (bt),
water-vapour difference (wvd) and split-window difference (swd) channels with
a datetime coordinate — the minimum realistic input for the detection
pipeline (fields defined by the reference dataloader:
bt = C13, wvd = C08 - C10, swd = C13 - C15, ``dataloader.py:240-321``)."""

from __future__ import annotations

import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray


def growing_storm_scene(
    t=12,
    h=96,
    w=128,
    dt_minutes=5.0,
    advect=(2.0, 1.0),
    start=(30.0, 40.0),
    seed=0,
):
    """Returns (bt, wvd, swd) DataArrays of shape (t, h, w).

    The storm core cools from 290 K to ~210 K while its anvil radius grows;
    wvd rises from -15 toward +2 inside the cloud; swd stays small inside
    the cold cloud and ~5 K in clear sky.
    """
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float64)
    ax, ay = advect
    x0, y0 = start

    bt = np.empty((t, h, w), np.float32)
    wvd = np.empty((t, h, w), np.float32)
    swd = np.empty((t, h, w), np.float32)
    for i in range(t):
        cx = x0 + ax * i
        cy = y0 + ay * i
        growth = i / (t - 1)
        radius = 6.0 + 14.0 * growth
        core = np.exp(-((xx - cx) ** 2 + (yy - cy) ** 2) / (2 * radius**2))
        depth = 80.0 * growth + 10.0
        bt[i] = 290.0 - depth * core + rng.normal(0, 0.3, (h, w))
        wvd[i] = -15.0 + 17.0 * core * (0.3 + 0.7 * growth) + rng.normal(0, 0.2, (h, w))
        swd[i] = 5.0 - 4.5 * core + rng.normal(0, 0.1, (h, w))

    times = np.datetime64("2020-06-01T00:00:00", "ns") + (
        np.arange(t) * np.timedelta64(int(dt_minutes * 60), "s")
    )
    coords = {"t": times, "y": np.arange(h) * 2000.0, "x": np.arange(w) * 2000.0}
    dims = ("t", "y", "x")

    def da(v, name, units):
        return DataArray(
            v, coords=coords, dims=dims, name=name,
            attrs={"long_name": name, "units": units, "standard_name": name},
        )

    return (
        da(bt, "bt", "K"),
        da(wvd, "wvd", "K"),
        da(swd, "swd", "K"),
    )
