"""TV-L1 dense optical flow (Zach/Pock/Bischof duality scheme), TPU-native.

The reference registry exposes OpenCV's DualTVL1 model
(``utils/flow_utils.py:70-71``).  This implementation runs the classic
primal-dual iterations — per pyramid level and warp: linearise the residual
at the current flow, apply the L1 proximal thresholding step, then smooth
with the dual total-variation update.  Everything is elementwise maths plus
neighbour shifts and one banded warp per outer iteration, so it maps onto
the VPU with no gathers.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tobac_flow_tpu.ops.banded import warp_banded_multi

__all__ = ["tvl1_pair", "TVL1Params"]


class TVL1Params:
    def __init__(
        self,
        tau: float = 0.25,
        lambda_: float = 0.5,
        theta: float = 0.3,
        num_levels: int = 5,
        warps: int = 8,
        inner_iters: int = 50,
    ):
        self.tau = tau
        self.lambda_ = lambda_
        self.theta = theta
        self.num_levels = num_levels
        self.warps = warps
        self.inner_iters = inner_iters

    def _key(self):
        return (
            self.tau, self.lambda_, self.theta, self.num_levels, self.warps,
            self.inner_iters,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, TVL1Params) and self._key() == other._key()


def _grad(img):
    gx = jnp.concatenate([img[:, 1:] - img[:, :-1], jnp.zeros_like(img[:, :1])], 1)
    gy = jnp.concatenate([img[1:] - img[:-1], jnp.zeros_like(img[:1])], 0)
    return gx, gy


def _div(px, py):
    dx = jnp.concatenate([px[:, :1], px[:, 1:-1] - px[:, :-2], -px[:, -2:-1]], 1)
    dy = jnp.concatenate([py[:1], py[1:-1] - py[:-2], -py[-2:-1]], 0)
    return dx + dy


def _tvl1_level(i1, i2, flow, params, radius):
    lam_theta = params.lambda_ * params.theta
    tau_theta = params.tau / params.theta

    def warp_step(w, flow):
        u0 = flow
        warped = warp_banded_multi(
            i2[None], u0, radius=radius, method="linear", pad_mode="edge"
        )[0]
        ix, iy = _grad(warped)
        grad2 = ix * ix + iy * iy + 1e-7
        rho0 = warped - i1 - (ix * u0[..., 0] + iy * u0[..., 1])

        def inner(_, carry):
            u, p = carry  # u (H,W,2); p (H,W,2,2) dual per flow component
            rho = rho0 + ix * u[..., 0] + iy * u[..., 1]
            # L1 proximal thresholding
            case_lo = rho < -lam_theta * grad2
            case_hi = rho > lam_theta * grad2
            vx = u[..., 0] + jnp.where(
                case_lo, lam_theta * ix,
                jnp.where(case_hi, -lam_theta * ix, -rho * ix / grad2),
            )
            vy = u[..., 1] + jnp.where(
                case_lo, lam_theta * iy,
                jnp.where(case_hi, -lam_theta * iy, -rho * iy / grad2),
            )
            # TV smoothing via the dual variable
            new_u = jnp.stack(
                [
                    vx + params.theta * _div(p[..., 0, 0], p[..., 0, 1]),
                    vy + params.theta * _div(p[..., 1, 0], p[..., 1, 1]),
                ],
                axis=-1,
            )
            gxu, gyu = _grad(new_u[..., 0])
            gxv, gyv = _grad(new_u[..., 1])
            pu = jnp.stack([p[..., 0, 0] + tau_theta * gxu, p[..., 0, 1] + tau_theta * gyu], -1)
            pv = jnp.stack([p[..., 1, 0] + tau_theta * gxv, p[..., 1, 1] + tau_theta * gyv], -1)
            pu = pu / jnp.maximum(1.0, jnp.linalg.norm(pu, axis=-1, keepdims=True))
            pv = pv / jnp.maximum(1.0, jnp.linalg.norm(pv, axis=-1, keepdims=True))
            return new_u, jnp.stack([pu, pv], axis=-2)

        p0 = jnp.zeros(i1.shape + (2, 2), i1.dtype)
        u, _ = jax.lax.fori_loop(0, params.inner_iters, inner, (flow, p0))
        return u

    for w in range(params.warps):
        flow = warp_step(w, flow)
    return flow


def tvl1_pair(prev, nxt, params: TVL1Params | None = None):
    """Dense flow from prev to nxt ((H, W) float32, 0..255 scale)."""
    if params is None:
        params = TVL1Params()
    h, w = prev.shape
    # TV-L1 works on [0, 1]-normalised intensities
    prev = prev.astype(jnp.float32) / 255.0
    nxt = nxt.astype(jnp.float32) / 255.0

    levels = 0
    for k in range(params.num_levels):
        if min(h, w) // (2**k) >= 16:
            levels = k
    flow = None
    prev_shape = None
    for k in range(levels, -1, -1):
        hk, wk = max(h // (2**k), 8), max(w // (2**k), 8)
        i1 = jax.image.resize(prev, (hk, wk), method="linear")
        i2 = jax.image.resize(nxt, (hk, wk), method="linear")
        if flow is None:
            flow = jnp.zeros((hk, wk, 2), jnp.float32)
        else:
            flow = jax.image.resize(flow, (hk, wk, 2), method="linear") * jnp.asarray(
                [wk / prev_shape[1], hk / prev_shape[0]]
            )
        radius = int(min(16, max(hk, wk) // 4 + 2))
        flow = _tvl1_level(i1, i2, flow, params, radius)
        prev_shape = (hk, wk)
    return flow
