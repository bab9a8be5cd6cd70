"""DeepFlow-style matching + variational optical flow, TPU-native.

Reference registry entry: ``utils/flow_utils.py:50-53`` (OpenCV's
``createOptFlow_DeepFlow``, Weinzaepfel et al. 2013: a dense "deep
matching" term blended into a coarse-to-fine variational energy).  TPU
formulation keeps that two-part architecture:

 * the matching term is the static-shift cost-volume matcher
   (``models/simpleflow._match_level``) run at a coarse pyramid level —
   it supplies the large displacements that pure linearised variational
   descent cannot reach;
 * the energy descent is the banded-warp Horn–Schunck refinement
   (``models/variational.variational_refine``) applied coarse-to-fine with
   several fixed-point relinearisations per level.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tobac_flow_tpu.models.simpleflow import _match_level
from tobac_flow_tpu.models.variational import variational_refine
from tobac_flow_tpu.ops.banded import warp_banded

__all__ = ["deepflow_pair", "DeepFlowParams"]


class DeepFlowParams:
    def __init__(
        self,
        num_levels: int = 5,
        match_radius: int = 3,
        match_window: int = 7,
        alpha: float = 10.0,
        fixed_point_iters: int = 5,
        jacobi_iters: int = 10,
    ):
        self.num_levels = num_levels
        self.match_radius = match_radius
        self.match_window = match_window
        self.alpha = alpha
        self.fixed_point_iters = fixed_point_iters
        self.jacobi_iters = jacobi_iters

    def _key(self):
        return (
            self.num_levels, self.match_radius, self.match_window,
            self.alpha, self.fixed_point_iters, self.jacobi_iters,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, DeepFlowParams) and self._key() == other._key()


def deepflow_pair(prev, nxt, params: DeepFlowParams | None = None):
    """Dense flow from prev to nxt ((H, W) float32, 0..255 scale)."""
    if params is None:
        params = DeepFlowParams()
    h, w = prev.shape
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)

    min_size = 4 * params.match_window
    levels = 0
    for k in range(params.num_levels):
        if min(h, w) // (2**k) >= min_size:
            levels = k
    sizes = [
        (max(h // (2**k), 8), max(w // (2**k), 8)) for k in range(levels, -1, -1)
    ]

    flow = None
    prev_hw = None
    for li, (hk, wk) in enumerate(sizes):
        i1 = jax.image.resize(prev, (hk, wk), method="linear")
        i2 = jax.image.resize(nxt, (hk, wk), method="linear")
        if flow is None:
            # matching at the coarsest level seeds the large displacements
            flow = _match_level(i1, i2, params.match_radius, params.match_window)
        else:
            flow = jax.image.resize(flow, (hk, wk, 2), method="linear") * jnp.asarray(
                [wk / prev_hw[1], hk / prev_hw[0]]
            )
            # blend a residual match against the warped target back in
            i2w = warp_banded(i2, flow, radius=20, method="linear", pad_mode="edge")
            flow = flow + _match_level(
                i1, i2w, max(params.match_radius // 2, 1), params.match_window
            )
        flow = variational_refine(
            i1,
            i2,
            flow,
            steps=1,
            alpha=params.alpha,
            fixed_point_iters=params.fixed_point_iters,
            jacobi_iters=params.jacobi_iters,
        )
        prev_hw = (hk, wk)
    return flow
