"""DIS-style dense inverse-search optical flow, TPU-native.

The reference's test-default model is OpenCV's DIS (inverse-search patch
matching + densification + variational refinement, Kroeger et al. 2016;
selected at ``utils/flow_utils.py:62-64``).  This implementation maps the
algorithm onto TPU primitives:

 * the image is tiled into non-overlapping patches; each patch carries one
   displacement (inverse-compositional Lucas-Kanade with the template
   gradient/Hessian precomputed from the first frame),
 * the per-iteration resampling of the target frame uses ONE banded warp of
   the whole image by the piecewise-constant patch displacement field —
   patch residual sums then reduce by reshape, so there is no per-patch
   gather at all,
 * patch flows densify by bilinear upsampling and a fast variational
   refinement pass smooths the result (``models/variational.py``),
 * a pyramid supplies large displacements.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.models.variational import variational_refine
from tobac_flow_tpu.ops.banded import warp_banded

__all__ = ["dis_pair", "DISParams"]


class DISParams:
    def __init__(
        self,
        patch_size: int = 8,
        num_levels: int = 4,
        iters_per_level: int = 6,
        refine_steps: int = 1,
    ):
        self.patch_size = patch_size
        self.num_levels = num_levels
        self.iters_per_level = iters_per_level
        self.refine_steps = refine_steps

    def _key(self):
        return (self.patch_size, self.num_levels, self.iters_per_level, self.refine_steps)

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, DISParams) and self._key() == other._key()


def _patch_sum(field, ps):
    h, w = field.shape
    return field.reshape(h // ps, ps, w // ps, ps).sum(axis=(1, 3))


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


def _level_flow(i1, i2, patch_flow, ps, iters, radius):
    """Refine per-patch displacements at one level (inverse compositional)."""
    h, w = i1.shape
    gx, gy = _grad(i1)
    hxx = _patch_sum(gx * gx, ps) + 1e-3
    hxy = _patch_sum(gx * gy, ps)
    hyy = _patch_sum(gy * gy, ps) + 1e-3
    det = hxx * hyy - hxy * hxy
    inv_det = jnp.where(jnp.abs(det) > 1e-9, 1.0 / det, 0.0)

    def body(_, u):
        # dense displacement = nearest (piecewise-constant) patch flow
        disp = jnp.repeat(jnp.repeat(u, ps, axis=0), ps, axis=1)
        i2w = warp_banded(i2, disp, radius=radius, method="linear", pad_mode="edge")
        r = i2w - i1
        jr_x = _patch_sum(gx * r, ps)
        jr_y = _patch_sum(gy * r, ps)
        dux = (hyy * jr_x - hxy * jr_y) * inv_det
        duy = (hxx * jr_y - hxy * jr_x) * inv_det
        # inverse-compositional update, clamped per iteration for stability
        return u - jnp.clip(
            jnp.stack([dux, duy], axis=-1), -float(ps), float(ps)
        )

    return jax.lax.fori_loop(0, iters, body, patch_flow)


def dis_pair(prev, nxt, params: DISParams | None = None):
    """Dense flow from prev to nxt ((H, W) float32, 0..255 scale)."""
    if params is None:
        params = DISParams()
    ps = params.patch_size
    h, w = prev.shape
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)

    # pyramid levels (coarsest must still hold a few patches)
    levels = 0
    for k in range(params.num_levels):
        if min(h, w) // (2**k) >= 4 * ps:
            levels = k
    sizes = []
    for k in range(levels, -1, -1):
        sizes.append((max(h // (2**k) // ps * ps, ps), max(w // (2**k) // ps * ps, ps)))

    patch_flow = None
    for hk, wk in sizes:
        i1 = jax.image.resize(prev, (hk, wk), method="linear")
        i2 = jax.image.resize(nxt, (hk, wk), method="linear")
        gh, gw = hk // ps, wk // ps
        if patch_flow is None:
            patch_flow = jnp.zeros((gh, gw, 2), jnp.float32)
        else:
            scale_y = hk / prev_hk
            scale_x = wk / prev_wk
            patch_flow = jax.image.resize(
                patch_flow, (gh, gw, 2), method="linear"
            ) * jnp.asarray([scale_x, scale_y])
        radius = int(min(20, max(hk, wk) // 4 + 2))
        patch_flow = _level_flow(
            i1, i2, patch_flow, ps, params.iters_per_level, radius
        )
        prev_hk, prev_wk = hk, wk

    # densify to full resolution
    flow = jax.image.resize(patch_flow, (h, w, 2), method="linear")
    full_scale = jnp.asarray([w / prev_wk, h / prev_hk])
    flow = flow * full_scale
    if params.refine_steps > 0:
        flow = variational_refine(prev, nxt, flow, steps=params.refine_steps)
    return flow
