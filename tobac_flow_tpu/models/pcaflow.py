"""PCA-Flow-style low-rank global optical flow, TPU-native.

Reference registry entry: ``utils/flow_utils.py:54-57`` (OpenCV's
``createOptFlow_PCAFlow``, Wulff & Black 2015: the dense field is a linear
combination of a small flow basis, with coefficients fitted to sparse
feature matches).  TPU formulation:

 * sparse matches come from the grid Lucas–Kanade tracker
   (``models/sparse_to_dense.py``) with its texture-confidence weights;
 * the basis is the first K×K separable 2D cosine modes (the standard
   stand-in for the learned PCA basis — Wulff & Black note DCT performs
   within a few percent of learned bases);
 * the coefficient fit is a ridge-regularised weighted least squares per
   component — one (K², K²) normal-equation solve built from batched
   matmuls, exactly the MXU-shaped work TPUs are best at;
 * reconstruction is a single (H·W, K²) × (K², 2) matmul.
"""

from __future__ import annotations

import functools
import math

import jax.numpy as jnp
import numpy as np

__all__ = ["pcaflow_pair", "PCAFlowParams"]


class PCAFlowParams:
    def __init__(
        self,
        basis_size: int = 6,
        stride: int = 8,
        num_levels: int = 4,
        iters_per_level: int = 8,
        ridge: float = 1e-2,
    ):
        self.basis_size = basis_size
        self.stride = stride
        self.num_levels = num_levels
        self.iters_per_level = iters_per_level
        self.ridge = ridge

    def _key(self):
        return (
            self.basis_size, self.stride, self.num_levels,
            self.iters_per_level, self.ridge,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, PCAFlowParams) and self._key() == other._key()


@functools.lru_cache(maxsize=None)
def _dct_basis(n_points, k):
    """(n_points, k) 1D cosine modes sampled at n_points grid positions."""
    x = (np.arange(n_points) + 0.5) / n_points
    modes = [np.ones(n_points)]
    for m in range(1, k):
        modes.append(math.sqrt(2.0) * np.cos(math.pi * m * x))
    return np.stack(modes, axis=-1).astype(np.float32)


def _basis_2d(h, w, k):
    """(h, w, k*k) separable cosine basis."""
    by = jnp.asarray(_dct_basis(h, k))  # (h, k)
    bx = jnp.asarray(_dct_basis(w, k))  # (w, k)
    return (by[:, None, :, None] * bx[None, :, None, :]).reshape(h, w, k * k)


def pcaflow_pair(prev, nxt, params: PCAFlowParams | None = None):
    """Dense flow from prev to nxt ((H, W) float32, 0..255 scale)."""
    from tobac_flow_tpu.models.sparse_to_dense import (
        SparseToDenseParams,
        _grid_lk,
    )
    import jax

    if params is None:
        params = PCAFlowParams()
    h, w = prev.shape
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)
    s = params.stride

    # sparse matches: pyramidal grid LK with confidence weights
    sp = SparseToDenseParams(
        stride=s, num_levels=params.num_levels,
        iters_per_level=params.iters_per_level,
    )
    levels = 0
    for k in range(sp.num_levels):
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
        grid_flow, conf = _grid_lk(i1, i2, grid_flow, s, sp.iters_per_level, radius)
        prev_hw = (hk, wk)

    # fit the cosine basis to the matches (weighted ridge least squares)
    gh, gw = grid_flow.shape[:2]
    scale = jnp.asarray([w / prev_hw[1], h / prev_hw[0]])
    uv = grid_flow.reshape(-1, 2) * scale  # full-resolution pixel units
    wgt = (conf / (conf.max() + 1e-9)).reshape(-1, 1) + 1e-4
    k = params.basis_size
    basis_g = _basis_2d(gh, gw, k).reshape(-1, k * k)  # (n_matches, K²)
    bw = basis_g * wgt
    gram = bw.T @ basis_g + params.ridge * wgt.sum() * jnp.eye(k * k)
    rhs = bw.T @ uv  # (K², 2)
    coef = jnp.linalg.solve(gram, rhs)

    # dense reconstruction: one (H·W, K²) x (K², 2) matmul
    basis_full = _basis_2d(h, w, k).reshape(-1, k * k)
    return (basis_full @ coef).reshape(h, w, 2)
