"""SparseToDense optical flow (grid Lucas–Kanade + densification), TPU-native.

Reference registry entry: ``utils/flow_utils.py:62-65`` (OpenCV's
``createOptFlow_SparseToDense``: sparse pyramidal LK tracks on a regular
grid, densified by an edge-aware interpolator).  TPU formulation:

 * tracks live on a regular grid of overlapping windows; the per-iteration
   residual against the target frame uses ONE banded warp of the whole
   image by the piecewise-constant grid flow (the same no-gather trick as
   the DIS model), with per-window sums reduced by average pooling;
 * each window solves the 2×2 LK normal equations (forward additive);
 * densification is confidence-weighted: the grid flow is upsampled and
   diffused as (w·u, w·v, w) Gaussian triples with w = the structure
   tensor's smaller eigenvalue (texture confidence), then normalised —
   low-texture windows inherit flow from confident neighbours.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tobac_flow_tpu.models.farneback import _gauss_blur
from tobac_flow_tpu.ops.banded import warp_banded

__all__ = ["sparse_to_dense_pair", "SparseToDenseParams"]


class SparseToDenseParams:
    def __init__(
        self,
        stride: int = 8,
        num_levels: int = 4,
        iters_per_level: int = 8,
        sigma_densify: float = 2.0,
    ):
        self.stride = stride
        self.num_levels = num_levels
        self.iters_per_level = iters_per_level
        self.sigma_densify = sigma_densify

    def _key(self):
        return (
            self.stride, self.num_levels, self.iters_per_level, self.sigma_densify
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return (
            isinstance(other, SparseToDenseParams) and self._key() == other._key()
        )


def _grad(img):
    gx = 0.5 * (
        jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        - jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    )
    gy = 0.5 * (
        jnp.concatenate([img[1:], img[-1:]], axis=0)
        - jnp.concatenate([img[:1], img[:-1]], axis=0)
    )
    return gx, gy


def _pool(field, s):
    h, w = field.shape
    return field.reshape(h // s, s, w // s, s).mean(axis=(1, 3))


def _grid_lk(i1, i2, grid_flow, stride, iters, radius):
    """Forward-additive LK on a stride-spaced grid; returns (grid_flow,
    confidence) where confidence is the structure tensor's min eigenvalue."""
    gx, gy = _grad(i1)
    jxx = _pool(gx * gx, stride) + 1e-4
    jxy = _pool(gx * gy, stride)
    jyy = _pool(gy * gy, stride) + 1e-4
    det = jxx * jyy - jxy * jxy
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)
    # min eigenvalue of the 2x2 structure tensor = texture confidence
    tr = 0.5 * (jxx + jyy)
    disc = jnp.sqrt(jnp.maximum(tr * tr - det, 0.0))
    conf = jnp.maximum(tr - disc, 0.0)

    def body(_, u):
        dense = jnp.repeat(jnp.repeat(u, stride, axis=0), stride, axis=1)
        i2w = warp_banded(i2, dense, radius=radius, method="linear", pad_mode="edge")
        r = i2w - i1
        bx = _pool(gx * r, stride)
        by = _pool(gy * r, stride)
        du = (jyy * bx - jxy * by) * inv_det
        dv = (jxx * by - jxy * bx) * inv_det
        step = jnp.clip(jnp.stack([du, dv], axis=-1), -float(stride), float(stride))
        return u - step

    return jax.lax.fori_loop(0, iters, body, grid_flow), conf


def sparse_to_dense_pair(prev, nxt, params: SparseToDenseParams | None = None):
    """Dense flow from prev to nxt ((H, W) float32, 0..255 scale)."""
    if params is None:
        params = SparseToDenseParams()
    s = params.stride
    h, w = prev.shape
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)

    levels = 0
    for k in range(params.num_levels):
        if min(h, w) // (2**k) >= 4 * s:
            levels = k
    sizes = [
        (max(h // (2**k) // s * s, s), max(w // (2**k) // s * s, s))
        for k in range(levels, -1, -1)
    ]

    grid_flow = None
    conf = None
    prev_hw = None
    for hk, wk in sizes:
        i1 = jax.image.resize(prev, (hk, wk), method="linear")
        i2 = jax.image.resize(nxt, (hk, wk), method="linear")
        gh, gw = hk // s, wk // s
        if grid_flow is None:
            grid_flow = jnp.zeros((gh, gw, 2), jnp.float32)
        else:
            grid_flow = jax.image.resize(
                grid_flow, (gh, gw, 2), method="linear"
            ) * jnp.asarray([wk / prev_hw[1], hk / prev_hw[0]])
        radius = int(min(20, max(hk, wk) // 4 + 2))
        grid_flow, conf = _grid_lk(
            i1, i2, grid_flow, s, params.iters_per_level, radius
        )
        prev_hw = (hk, wk)

    # confidence-weighted densification to full resolution
    scale = jnp.asarray([w / prev_hw[1], h / prev_hw[0]])
    u = jax.image.resize(grid_flow[..., 0], (h, w), method="linear") * scale[0]
    v = jax.image.resize(grid_flow[..., 1], (h, w), method="linear") * scale[1]
    wgt = jax.image.resize(conf, (h, w), method="linear") + 1e-6
    num_u = _gauss_blur(wgt * u, params.sigma_densify)
    num_v = _gauss_blur(wgt * v, params.sigma_densify)
    den = _gauss_blur(wgt, params.sigma_densify)
    return jnp.stack([num_u / den, num_v / den], axis=-1)
