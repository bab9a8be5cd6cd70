"""Semi-Lagrangian 3D Sobel edge magnitude.

Parity target: reference ``tobac_flow/sobel.py``.  The 27 flow-warped taps of
the full (3,3,3) neighbourhood are weighted by the three axis-permuted 3D
Sobel kernels; NaN taps contribute zero (``np.nansum``); the ``uphill`` /
``downhill`` variants rectify taps against the centre pixel (tap index 13)
before weighting.  The reduction runs fused with the gathers as a ``func``
of :func:`tobac_flow_tpu.ops.convolve.convolve`.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.ops.convolve import convolve

__all__ = ["sobel", "sobel_matrix"]


def _sobel_matrix(ndims):
    m = np.array([-1, 0, 1])
    for _ in range(ndims - 1):
        m = np.multiply.outer(np.array([1, 2, 1]), m)
    return m


sobel_matrix = _sobel_matrix(3)
_W_T = jnp.asarray(sobel_matrix.ravel(), dtype=jnp.float32)
_W_Y = jnp.asarray(sobel_matrix.transpose([1, 2, 0]).ravel(), dtype=jnp.float32)
_W_X = jnp.asarray(sobel_matrix.transpose([2, 0, 1]).ravel(), dtype=jnp.float32)

_FULL_STRUCTURE = np.ones((3, 3, 3), dtype=bool)


def _magnitude(x):
    # broadcast shape for the (27,) weights over (27, ...) — convolve applies
    # the reduction per frame (27, H, W) or whole-volume (27, T, H, W)
    w = (1,) * (x.ndim - 1)
    xs = jnp.where(jnp.isnan(x), 0.0, x)
    gt = jnp.sum(xs * _W_T.reshape((-1,) + w), axis=0)
    gy = jnp.sum(xs * _W_Y.reshape((-1,) + w), axis=0)
    gx = jnp.sum(xs * _W_X.reshape((-1,) + w), axis=0)
    return jnp.sqrt(gt * gt + gy * gy + gx * gx)


def _sobel_func(x):
    return _magnitude(x - x[13])


def _sobel_func_uphill(x):
    return _magnitude(jnp.fmax(x - x[13], 0.0))


def _sobel_func_downhill(x):
    return _magnitude(jnp.fmin(x - x[13], 0.0))


_FUNCS = {None: _sobel_func, "uphill": _sobel_func_uphill, "downhill": _sobel_func_downhill}


def sobel(
    data,
    forward_flow,
    backward_flow,
    method="linear",
    dtype=np.float32,
    fill_value=np.nan,
    direction=None,
):
    """Sobel edge magnitude in the moving (semi-Lagrangian) frame.

    direction: None (signed), "uphill" (only neighbours above the centre
    contribute) or "downhill" (only below). Mirrors ``sobel.py:89-143``.
    """
    if direction not in _FUNCS:
        raise ValueError("direction must be None, 'uphill' or 'downhill'")
    if dtype is None:
        dtype = np.float32
    return convolve(
        data,
        forward_flow,
        backward_flow,
        structure=_FULL_STRUCTURE,
        method=method,
        dtype=dtype,
        fill_value=fill_value,
        func=_FUNCS[direction],
    )
