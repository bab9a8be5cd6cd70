"""Device-mesh construction for the sharded pipeline.

The reference scales by launching one process per time chunk / spatial tile
and re-linking labels across files (SURVEY §2.6).  Here the same decomposition
is expressed as a ``jax.sharding.Mesh`` over TPU devices: the time axis
("t") is the sequence-parallel axis, the trailing spatial axis ("x") is the
tile axis; stencil ops exchange halos over ICI instead of overlapping files.
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh

__all__ = ["make_mesh"]


def make_mesh(n_t: int | None = None, n_x: int = 1, devices=None) -> Mesh:
    """Build a (t, x) mesh over the available devices.

    With only ``n_t`` given, all devices go to the time axis.
    """
    if devices is None:
        devices = jax.devices()
    if n_t is None:
        n_t = len(devices) // n_x
    if n_t * n_x != len(devices):
        devices = devices[: n_t * n_x]
    arr = np.asarray(devices).reshape(n_t, n_x)
    return Mesh(arr, axis_names=("t", "x"))
