"""Flow-warped sampling primitives (TPU-native replacement for cv2.remap).

Reference behaviour: ``tobac_flow/convolve.py:8-86`` (warp_flow) and
``tobac_flow/utils/flow_utils.py:80-99``.  A frame is sampled at
``(x + flow_x + off_x, y + flow_y + off_y)`` with sub-pixel interpolation
(nearest / linear / cubic / lanczos, mirroring the cv2 interpolation family)
and out-of-frame locations replaced by ``fill_value`` (NaN by default).

Design notes (TPU):
 * All taps of the interpolation stencil are separate gathers from a flat
   (H*W,) view; XLA fuses the weighting arithmetic.  When a whole structuring
   plane of offsets is warped at once (semi-Lagrangian convolution) the
   integer-offset taps share one gathered patch grid, so a 9-offset plane with
   linear interpolation costs 16 gathers instead of 36.
 * Zero-weight taps are masked (``where(w == 0, 0, w*v)``) so NaN fill values
   at the frame border do not poison exact-integer sample locations.  This
   makes zero-flow warps an exact identity, matching the fixed-point
   short-circuit behaviour of cv2.remap in the interior.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "warp_flow",
    "warp_plane",
    "shift_plane",
    "INTERP_METHODS",
]

INTERP_METHODS = ("nearest", "linear", "cubic", "lanczos")

# Kernel support (tap offsets relative to floor(coord)) per method.
_SUPPORT = {
    "linear": (0, 1),
    "cubic": (-1, 2),
    "lanczos": (-3, 4),
}


def _linear_weights(f):
    """2-tap linear weights for fractional position f in [0, 1)."""
    return [1.0 - f, f]


def _cubic_weights(f):
    """4-tap cubic-convolution weights (cv2 INTER_CUBIC, A = -0.75)."""
    A = -0.75
    # tap distances: |x| for taps at -1, 0, 1, 2 are 1+f, f, 1-f, 2-f
    x0 = f + 1.0
    x1 = f
    x2 = 1.0 - f
    x3 = 2.0 - f
    w0 = A * (((x0 - 5.0) * x0 + 8.0) * x0 - 4.0)
    w1 = ((A + 2.0) * x1 - (A + 3.0)) * x1 * x1 + 1.0
    w2 = ((A + 2.0) * x2 - (A + 3.0)) * x2 * x2 + 1.0
    w3 = A * (((x3 - 5.0) * x3 + 8.0) * x3 - 4.0)
    return [w0, w1, w2, w3]


_LANCZOS_CS = (
    (1.0, 0.0),
    (-math.sqrt(0.5), -math.sqrt(0.5)),
    (0.0, 1.0),
    (math.sqrt(0.5), -math.sqrt(0.5)),
    (-1.0, 0.0),
    (math.sqrt(0.5), math.sqrt(0.5)),
    (0.0, -1.0),
    (-math.sqrt(0.5), math.sqrt(0.5)),
)


def _lanczos_weights(f):
    """8-tap Lanczos4 weights using cv2's exact trig-table formulation
    (taps at offsets -3..4 from floor), normalised to sum 1 and special-cased
    to a one-hot at integer sample locations."""
    y0 = -(f + 3.0) * (jnp.pi * 0.25)
    s0 = jnp.sin(y0)
    c0 = jnp.cos(y0)
    ws = []
    for i in range(8):
        y = -(f + 3.0 - i) * (jnp.pi * 0.25)
        y2 = jnp.where(jnp.abs(y) < 1e-6, 1.0, y * y)
        ws.append((_LANCZOS_CS[i][0] * s0 + _LANCZOS_CS[i][1] * c0) / y2)
    total = sum(ws)
    exact = f < 1e-6  # integer coordinate -> one-hot on tap i=3 (offset 0)
    return [
        jnp.where(exact, 1.0 if i == 3 else 0.0, ws[i] / total) for i in range(8)
    ]


_WEIGHT_FNS = {
    "linear": _linear_weights,
    "cubic": _cubic_weights,
    "lanczos": _lanczos_weights,
}


def _gather_frame(img_flat, iy, ix, h, w, fill_value):
    """Gather img_flat[(iy, ix)] with constant fill outside the frame."""
    inb = (iy >= 0) & (iy < h) & (ix >= 0) & (ix < w)
    idx = jnp.where(inb, iy * w + ix, 0)
    vals = jnp.take(img_flat, idx.reshape(-1), axis=0).reshape(idx.shape)
    return jnp.where(inb, vals, fill_value)


def warp_plane(img, flow, offsets, method="linear", fill_value=np.nan):
    """Warp a frame to a set of integer-offset locations displaced by flow.

    Parameters
    ----------
    img : (H, W) array — the source frame (previous or next timestep).
    flow : (H, W, 2) array — per-pixel displacement, channel 0 = x, 1 = y.
    offsets : static sequence of (ox, oy) integer pairs (structuring-element
        taps, reference ``convolve.py:212,234``).
    method : one of INTERP_METHODS.
    fill_value : value for out-of-frame samples.

    Returns
    -------
    (n_offsets, H, W) array sampled at ``(x + flow_x + ox, y + flow_y + oy)``.
    """
    if method not in INTERP_METHODS:
        raise ValueError(f"method must be one of {list(INTERP_METHODS)}")
    h, w = img.shape
    img_flat = img.reshape(-1)
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    bx = gx + flow[..., 0].astype(jnp.float32)
    by = gy + flow[..., 1].astype(jnp.float32)

    offsets = [(int(ox), int(oy)) for ox, oy in offsets]

    if method == "nearest":
        # round-half-to-even, matching np.round; offsets are integers so the
        # rounded base coordinate is shared by every tap.
        rx = jnp.round(bx).astype(jnp.int32)
        ry = jnp.round(by).astype(jnp.int32)
        outs = [
            _gather_frame(img_flat, ry + oy, rx + ox, h, w, fill_value)
            for ox, oy in offsets
        ]
        return jnp.stack(outs, axis=0)

    lo, hi = _SUPPORT[method]
    fx = jnp.floor(bx)
    fy = jnp.floor(by)
    ix = fx.astype(jnp.int32)
    iy = fy.astype(jnp.int32)
    fracx = bx - fx
    fracy = by - fy
    wx = _WEIGHT_FNS[method](fracx)
    wy = _WEIGHT_FNS[method](fracy)

    oxs = sorted({ox for ox, _ in offsets})
    oys = sorted({oy for _, oy in offsets})
    # Union grid of (tap + offset) displacements, gathered once and shared by
    # all offsets in this plane.
    grid = {}
    for gy_off in range(min(oys) + lo, max(oys) + hi + 1):
        for gx_off in range(min(oxs) + lo, max(oxs) + hi + 1):
            grid[(gy_off, gx_off)] = _gather_frame(
                img_flat, iy + gy_off, ix + gx_off, h, w, fill_value
            )

    fimg = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    outs = []
    for ox, oy in offsets:
        acc = jnp.zeros((h, w), dtype=fimg)
        for ky in range(lo, hi + 1):
            wyk = wy[ky - lo]
            for kx in range(lo, hi + 1):
                wgt = wyk * wx[kx - lo]
                val = grid[(oy + ky, ox + kx)]
                # Mask zero-weight taps so border NaNs don't poison exact hits.
                acc = acc + jnp.where(wgt == 0.0, 0.0, wgt * val)
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def shift_plane(img, offsets, fill_value=np.nan):
    """Integer-shift taps of the same-timestep plane (reference
    ``convolve.py:89-144``): sample ``img[y + oy, x + ox]`` with constant fill.

    Static offsets compile to pad+slice — no gather needed.
    """
    h, w = img.shape
    outs = []
    for ox, oy in offsets:
        ox, oy = int(ox), int(oy)
        # pad on both sides by |o|, then slice so out[y, x] = img[y+oy, x+ox]
        padded = jnp.pad(
            img, ((abs(oy), abs(oy)), (abs(ox), abs(ox))), constant_values=fill_value
        )
        outs.append(
            jax.lax.dynamic_slice(padded, (abs(oy) + oy, abs(ox) + ox), (h, w))
        )
    return jnp.stack(outs, axis=0)


@functools.partial(jax.jit, static_argnames=("method",))
def _warp_flow_single(img, flow, method, fill_value):
    return warp_plane(img, flow, [(0, 0)], method=method, fill_value=fill_value)[0]


def warp_flow(img, flow, method="linear", fill_value=np.nan):
    """Warp a single frame by a flow field (public API mirroring reference
    ``tobac_flow.flow.warp_flow`` / ``utils/flow_utils.py:80-99``).

    img : (H, W); flow : (H, W, 2) with channel 0 = x displacement, 1 = y.
    """
    if method not in INTERP_METHODS:
        raise ValueError(f"method must be one of {list(INTERP_METHODS)}")
    img = jnp.asarray(img)
    in_dtype = img.dtype
    if method != "nearest" and not jnp.issubdtype(in_dtype, jnp.floating):
        img = img.astype(jnp.float32)
    out = _warp_flow_single(img, jnp.asarray(flow), method, fill_value)
    return out
