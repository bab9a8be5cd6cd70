"""Decompose fused_anvil_pre_watershed's steady-state cost on the TPU.

The isolated 9-offset cubic banded warp runs ~30 ms/frame (tools/
warp_probe.py) yet the full pre stage measured 85-135 s for 96 frames —
this probe times the pre program and its pieces at the production chunk
shape to find the gap.

Usage: python tools/pre_probe.py [-t 26] [-y 512] [-x 768]
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp


def timed(fn, *args, n=2, tag=""):
    start = time.perf_counter()
    out = fn(*args)
    out = jax.tree.leaves(out)[0]
    float(jnp.asarray(out).ravel()[0])
    first = time.perf_counter() - start
    best = np.inf
    for _ in range(n):
        start = time.perf_counter()
        out = fn(*args)
        out = jax.tree.leaves(out)[0]
        float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - start)
    print(f"{tag}: first={first:.2f}s warm={best:.3f}s", flush=True)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("-t", type=int, default=26)
    ap.add_argument("-y", type=int, default=512)
    ap.add_argument("-x", type=int, default=768)
    args = ap.parse_args()
    t, h, w = args.t, args.y, args.x

    from tobac_flow_tpu.detect.fused import (
        _anvil_pre_jit,
        _B3_OFFS,
        _FULL_TAPS,
        _warp_mode_key,
    )
    from tobac_flow_tpu.ops.convolve import _convolve_impl
    from tobac_flow_tpu.ops.morphology import _binary_morph
    from tobac_flow_tpu.ops.sobel import _sobel_func_uphill
    from tobac_flow_tpu.utils.program_cache import persistent_jit

    rng = np.random.default_rng(0)
    field = jnp.asarray(rng.normal(-8, 4, (t, h, w)).astype(np.float32))
    markers = jnp.asarray(
        (rng.random((t, h, w)) > 0.995).astype(np.int32)
    )
    flow = np.clip(
        rng.normal(0, 2.0, (t, h, w, 2)), -20, 20
    ).astype(np.float32)
    fwd = jnp.asarray(flow)
    bwd = jnp.asarray(-flow)

    timed(
        lambda: _anvil_pre_jit(
            field, markers, fwd, bwd, -12.5, -5.0, 2, _warp_mode_key()
        ),
        tag="anvil_pre (full program)",
    )

    @jax.jit
    def sobel_only(field, fwd, bwd):
        return _convolve_impl(
            field, fwd, bwd, _FULL_TAPS, "cubic", jnp.nan,
            _sobel_func_uphill, jnp.nan,
        )

    timed(lambda: sobel_only(field, fwd, bwd), tag="27-tap cubic sobel convolve")

    @jax.jit
    def mask_morph(field):
        m = field <= 0
        return _binary_morph(m, _B3_OFFS, 2, 1, "erode")

    timed(lambda: mask_morph(field), tag="mask erode (2 it, 27 offs)")

    @jax.jit
    def plain_taps(field, fwd, bwd):
        return _convolve_impl(
            field, fwd, bwd, _FULL_TAPS, "cubic", jnp.nan, None, jnp.nan
        )

    timed(lambda: plain_taps(field, fwd, bwd), tag="27-tap cubic convolve (no func)")


if __name__ == "__main__":
    main()
