"""Variational refinement of a dense flow field.

TPU-native counterpart of the reference's optional cv2.VariationalRefinement
pass (``tobac_flow/flow.py:359,513-519``): a warped Horn–Schunck-style energy
(brightness constancy linearised at the current flow + quadratic smoothness)
minimised by fixed-point relinearisation with inner Jacobi sweeps.  The
per-relinearisation image warp uses the banded-shift gather (``ops/banded``)
— flow is bounded by the pipeline's ±20 px clip, and XLA's general gather is
~200-500x elementwise on this TPU stack — so the whole pass is elementwise +
static shifts and fuses into the flow program.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tobac_flow_tpu.ops.banded import warp_banded

__all__ = ["variational_refine"]


def _neighbor_avg(f):
    """4-neighbour average with edge replication, per channel (H, W, C)."""
    up = jnp.concatenate([f[:1], f[:-1]], axis=0)
    dn = jnp.concatenate([f[1:], f[-1:]], axis=0)
    lf = jnp.concatenate([f[:, :1], f[:, :-1]], axis=1)
    rt = jnp.concatenate([f[:, 1:], f[:, -1:]], axis=1)
    return 0.25 * (up + dn + lf + rt)


def _grad(img):
    """Central-difference gradients with edge replication."""
    gx = 0.5 * (
        jnp.concatenate([img[:, 1:], img[:, -1:]], axis=1)
        - jnp.concatenate([img[:, :1], img[:, :-1]], axis=1)
    )
    gy = 0.5 * (
        jnp.concatenate([img[1:], img[-1:]], axis=0)
        - jnp.concatenate([img[:1], img[:-1]], axis=0)
    )
    return gx, gy


def variational_refine(
    i1,
    i2,
    flow,
    steps: int = 1,
    alpha: float = 20.0,
    fixed_point_iters: int = 5,
    jacobi_iters: int = 10,
):
    """Refine `flow` (H, W, 2) mapping i1 → i2. Images are (H, W) float
    (0..255 scale). Returns the refined flow."""

    def fixed_point(_, flow):
        u0 = flow[..., 0]
        v0 = flow[..., 1]
        # banded warp with edge replication == clamped-coordinate bilinear
        # sampling (displacements are clipped to the band, matching the
        # pipeline's eventual ±20 px flow clip, reference flow.py:60-61)
        i2w = warp_banded(i2, flow, radius=20, method="linear", pad_mode="edge")
        r = i2w - i1
        ix, iy = _grad(i2w)
        denom = alpha + ix * ix + iy * iy

        def jacobi(_, uv):
            bar = _neighbor_avg(uv)
            ub, vb = bar[..., 0], bar[..., 1]
            t = (ix * (ub - u0) + iy * (vb - v0) + r) / denom
            return jnp.stack([ub - ix * t, vb - iy * t], axis=-1)

        return jax.lax.fori_loop(0, jacobi_iters, jacobi, flow)

    for _ in range(int(steps)):
        flow = jax.lax.fori_loop(0, fixed_point_iters, fixed_point, flow)
    return flow
