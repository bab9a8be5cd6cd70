"""Isolated TPU timing of the exact banded warp — the pipeline's hottest
primitive (fused_anvil_pre's 27-tap cubic Sobel, the growth-rate diffs, the
label pair-histogram's nearest warps all bottom out here).

Times warp_banded_exact_multi for representative flows/bounds at e2e and
CONUS frame shapes, against the separable two-pass approximation, so the
optimisation conversation starts from measured numbers.

Usage: python tools/warp_probe.py
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

import numpy as np

REPO = Path(__file__).parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from tobac_flow_tpu.ops.banded import warp_banded, warp_banded_exact_multi
from tobac_flow_tpu.ops.convolve import _flow_frame_plan

OFFSETS9 = tuple((ox, oy) for oy in (-1, 0, 1) for ox in (-1, 0, 1))


def make_flow(h, w, amp, noise, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    base = np.stack(
        [
            amp * np.sin(yy / 97.0) * np.cos(xx / 131.0),
            amp * np.cos(yy / 83.0),
        ],
        axis=-1,
    ).astype(np.float32)
    base += rng.normal(0, noise, base.shape).astype(np.float32)
    return np.clip(base, -20, 20)


def timed(fn, *args, n=3):
    out = fn(*args)
    jax.block_until_ready(out)
    float(jnp.asarray(out).ravel()[0])  # force readback under axon
    best = np.inf
    for _ in range(n):
        start = time.perf_counter()
        out = fn(*args)
        float(jnp.asarray(out).ravel()[0])
        best = min(best, time.perf_counter() - start)
    return best


def main():
    for h, w in ((512, 768), (1500, 2500)):
        img = jnp.asarray(np.random.default_rng(0).normal(280, 10, (h, w)).astype(np.float32))
        for tag, amp, noise in (("smooth3", 3.0, 0.2), ("rough8", 8.0, 1.5)):
            flow_np = make_flow(h, w, amp, noise)
            flow = jnp.asarray(flow_np)

            @jax.jit
            def full_band(img, flow):
                return warp_banded_exact_multi(
                    img, flow, OFFSETS9, 20, 20, method="cubic",
                    fill_value=jnp.nan,
                )

            @jax.jit
            def planned(img, flow):
                bounds, _pos = _flow_frame_plan(flow, 1024)
                return warp_banded_exact_multi(
                    img, flow, OFFSETS9, 20, 20, method="cubic",
                    fill_value=jnp.nan, dyn_bounds=bounds,
                )

            @jax.jit
            def separable(img, flow):
                outs = [
                    warp_banded(img, flow + jnp.asarray([float(ox), float(oy)]),
                                radius=20, method="cubic", fill_value=jnp.nan)
                    for ox, oy in OFFSETS9
                ]
                return jnp.stack(outs)

            @jax.jit
            def single_offset(img, flow):
                return warp_banded_exact_multi(
                    img, flow, ((0, 0),), 20, 20, method="cubic",
                    fill_value=jnp.nan,
                )

            r = {
                "full_band": timed(full_band, img, flow),
                "planned": timed(planned, img, flow),
                "separable9": timed(separable, img, flow),
                "single_offset_full": timed(single_offset, img, flow),
            }
            print(
                f"{h}x{w} {tag}: "
                + "  ".join(f"{k}={v * 1e3:.1f}ms" for k, v in r.items()),
                flush=True,
            )


if __name__ == "__main__":
    main()
