"""SimpleFlow-style non-iterative local-matching optical flow, TPU-native.

Reference registry entry: ``utils/flow_utils.py:58-61`` (OpenCV's
``createOptFlow_SimpleFlow``, Tao et al. 2012 — local window matching with
sublinear filtering).  The TPU formulation is a pyramidal cost volume:

 * every integer displacement in a ±R window is one *static shift* of the
   target frame (no gathers — the same trick as ``ops/banded.py``), scored
   by a box-filtered SSD;
 * the per-pixel winner takes a one-dimensional parabolic sub-pixel fit in
   each axis from the stored cost volume;
 * coarse-to-fine: each level warps the target by the upsampled flow
   (banded warp) and matches the ±R residual, so the total range is
   R · 2^levels;
 * a final Gaussian smoothing stands in for SimpleFlow's bilateral
   aggregation.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tobac_flow_tpu.models.farneback import _gauss_blur, _box_blur
from tobac_flow_tpu.ops.banded import warp_banded

__all__ = ["simpleflow_pair", "SimpleFlowParams"]


class SimpleFlowParams:
    def __init__(
        self,
        radius: int = 3,
        window: int = 7,
        num_levels: int = 4,
        sigma_flow: float = 1.5,
    ):
        self.radius = radius
        self.window = window
        self.num_levels = num_levels
        self.sigma_flow = sigma_flow

    def _key(self):
        return (self.radius, self.window, self.num_levels, self.sigma_flow)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, SimpleFlowParams) and self._key() == other._key()


def _shift2(img, dy, dx):
    """img[y + dy, x + dx] with edge replication."""
    h, w = img.shape
    padded = jnp.pad(img, ((abs(dy), abs(dy)), (abs(dx), abs(dx))), mode="edge")
    return jax.lax.dynamic_slice(padded, (abs(dy) + dy, abs(dx) + dx), (h, w))


def _match_level(i1, i2, radius, window):
    """Best integer displacement ±radius with parabolic sub-pixel refinement.

    Returns (H, W, 2) flow (x, y channels).
    """
    n = 2 * radius + 1
    offsets = [
        (dy, dx)
        for dy in range(-radius, radius + 1)
        for dx in range(-radius, radius + 1)
    ]
    costs = []
    for dy, dx in offsets:
        diff = i1 - _shift2(i2, dy, dx)
        costs.append(_box_blur(diff * diff, window))
    vol = jnp.stack(costs)  # (n*n, H, W)
    best = jnp.argmin(vol, axis=0)
    # clamp the winner away from the volume edge so the ±1 taps exist
    by = jnp.clip(best // n, 1, n - 2)
    bx = jnp.clip(best % n, 1, n - 2)

    def sel(iy, ix):
        """cost at displacement index (iy, ix) per pixel — a masked sum over
        the static cost maps (no per-element gather)."""
        acc = jnp.zeros_like(i1)
        for k, (dy, dx) in enumerate(offsets):
            acc = acc + jnp.where(
                (iy == dy + radius) & (ix == dx + radius), costs[k], 0.0
            )
        return acc

    c1 = sel(by, bx)
    c0y = sel(by - 1, bx)
    c2y = sel(by + 1, bx)
    c0x = sel(by, bx - 1)
    c2x = sel(by, bx + 1)

    def para(c0, c2):
        denom = c0 - 2 * c1 + c2
        off = jnp.where(jnp.abs(denom) > 1e-9, 0.5 * (c0 - c2) / denom, 0.0)
        return jnp.clip(off, -0.5, 0.5)

    dy = (by - radius) + para(c0y, c2y)
    dx = (bx - radius) + para(c0x, c2x)
    return jnp.stack([dx, dy], axis=-1)


def simpleflow_pair(prev, nxt, params: SimpleFlowParams | None = None):
    """Dense flow from prev to nxt ((H, W) float32, 0..255 scale)."""
    if params is None:
        params = SimpleFlowParams()
    h, w = prev.shape
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)

    levels = 0
    for k in range(params.num_levels):
        if min(h, w) // (2**k) >= 4 * params.window:
            levels = k
    sizes = [
        (max(h // (2**k), 8), max(w // (2**k), 8)) for k in range(levels, -1, -1)
    ]

    flow = None
    prev_hw = None
    for hk, wk in sizes:
        i1 = jax.image.resize(prev, (hk, wk), method="linear")
        i2 = jax.image.resize(nxt, (hk, wk), method="linear")
        if flow is None:
            flow = jnp.zeros((hk, wk, 2), jnp.float32)
        else:
            flow = jax.image.resize(flow, (hk, wk, 2), method="linear") * jnp.asarray(
                [wk / prev_hw[1], hk / prev_hw[0]]
            )
        i2w = warp_banded(i2, flow, radius=20, method="linear", pad_mode="edge")
        flow = flow + _match_level(i1, i2w, params.radius, params.window)
        prev_hw = (hk, wk)

    u = _gauss_blur(flow[..., 0], params.sigma_flow)
    v = _gauss_blur(flow[..., 1], params.sigma_flow)
    return jnp.stack([u, v], axis=-1)
