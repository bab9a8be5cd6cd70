"""TPU-native pyramidal Farneback dense optical flow.

A from-scratch JAX implementation of the Farneback (2003) polynomial-expansion
method, the model the reference pipeline selects by default
(``tobac_flow/utils/flow_utils.py:52-53``, ``scripts/dcc_detect_goes.py:165``
— there via OpenCV's C++ ``createOptFlow_Farneback``).

Algorithm
---------
1. **Polynomial expansion**: each pixel neighbourhood is fit with
   ``f(u) ≈ c + bᵀu + uᵀAu`` under a Gaussian applicability, computed as six
   separable correlations followed by a constant ``G⁻¹`` solve.
2. **Displacement estimation**: with prior displacement d̃,
   ``A = (A₁(p) + A₂(p+d̃))/2``, ``Δb = −(b₂(p+d̃) − b₁(p))/2 + A d̃`` and the
   window-aggregated least-squares solution
   ``d = (Σw AᵀA)⁻¹ (Σw AᵀΔb)`` (box window of size ``winsize``).
3. **Pyramid**: levels are built by Gaussian smoothing + bilinear resize of
   the full-resolution frames; flow is upsampled ×(1/pyr_scale) between
   levels.

Defaults mirror cv2's FarnebackOpticalFlow: numLevels=5, pyrScale=0.5,
winSize=13, numIters=10, polyN=5, polySigma=1.1, box aggregation.

Everything is static-shape, branch-free and fuses under one ``jit``; frame
pairs are vmapped so both directions of every pair in a time window compile
into a single XLA program.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["farneback_pair", "FarnebackParams"]


class FarnebackParams:
    """Static hyper-parameters for the Farneback model."""

    def __init__(
        self,
        num_levels: int = 5,
        pyr_scale: float = 0.5,
        winsize: int = 13,
        num_iters: int = 10,
        poly_n: int = 5,
        poly_sigma: float = 1.1,
        resamples: int = 5,
    ):
        self.num_levels = num_levels
        self.pyr_scale = pyr_scale
        self.winsize = winsize
        self.num_iters = num_iters
        self.poly_n = poly_n
        self.poly_sigma = poly_sigma
        # number of times per level the target expansion is re-warped; the
        # remaining iterations re-solve against the frozen warp (gathers are
        # ~200x elementwise on TPU, box blurs are cumsum-cheap)
        self.resamples = resamples

    def _key(self):
        return (
            self.num_levels,
            self.pyr_scale,
            self.winsize,
            self.num_iters,
            self.poly_n,
            self.poly_sigma,
            self.resamples,
        )

    def __hash__(self):
        return hash(self._key())

    def __eq__(self, other):
        return isinstance(other, FarnebackParams) and self._key() == other._key()


# poly_exp formulation switch (part of the trace, so flipping it re-jits):
# batched = 2 multi-channel convs, unbatched = 9 single-channel passes.
# Measured on TPU v5e (tools/ab_poly.py, 24x1024x1536 flow): unbatched 819 ms
# vs batched 914 ms — XLA fuses the single-channel passes better than the
# tiny-channel-count NCHW convolutions, so unbatched is the default.
POLY_BATCHED = False


def _sepconv(img, kernel, axis):
    """Correlate a (..., H, W) array along `axis` (-1 or -2) with a 1D kernel,
    edge-replicated borders.  Lowered to one conv_general_dilated (keeps the
    graph small and maps onto the TPU conv path instead of K shifted adds)."""
    k = np.asarray(kernel, dtype=np.float32)
    r = len(k) // 2
    axis = axis % img.ndim
    pad = [(0, 0)] * img.ndim
    pad[axis] = (r, r)
    padded = jnp.pad(img, pad, mode="edge")
    # reshape to NCHW with a single channel; batch folds the other dims
    moved = jnp.moveaxis(padded, axis, -1)
    lead = moved.shape[:-1]
    flat = moved.reshape((-1, 1, 1, moved.shape[-1]))
    kern = jnp.asarray(k).reshape((1, 1, 1, len(k)))  # lax conv == correlation
    out = jax.lax.conv_general_dilated(
        flat, kern, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    out = out.reshape(lead + (out.shape[-1],))
    return jnp.moveaxis(out, -1, axis)


@functools.lru_cache(maxsize=None)
def _poly_kernels(poly_n: int, poly_sigma: float):
    """1D applicability kernels and the constant inverse-G solve matrix."""
    n = poly_n
    u = np.arange(-n, n + 1, dtype=np.float64)
    a = np.exp(-(u**2) / (2.0 * poly_sigma**2))
    a /= a.sum()
    # 2D basis moments: G[i, j] = Σ a(x)a(y) B_i B_j, B = (1, x, y, x², y², xy)
    ax, ay = np.meshgrid(u, u)  # x varies along cols, y along rows
    w2 = np.outer(a, a)
    B = np.stack(
        [np.ones_like(ax), ax, ay, ax**2, ay**2, ax * ay], axis=0
    ).reshape(6, -1)
    G = (B * w2.reshape(1, -1)) @ B.T
    invG = np.linalg.inv(G)
    return (
        tuple(a.tolist()),
        tuple((u * a).tolist()),
        tuple((u**2 * a).tolist()),
        invG,
    )


def poly_exp(img, poly_n=5, poly_sigma=1.1):
    """Quadratic polynomial expansion of a (H, W) frame.

    Returns (b, A): b is (H, W, 2) the linear coefficients (x, y);
    A is (H, W, 3) the quadratic coefficients (axx, ayy, axy).
    """
    g, xg, xxg = map(lambda t: np.asarray(t), _poly_kernels(poly_n, poly_sigma)[:3])
    invG = _poly_kernels(poly_n, poly_sigma)[3]

    if not POLY_BATCHED:
        gy = _sepconv(img, g, -2)
        yg_ = _sepconv(img, xg, -2)
        yyg_ = _sepconv(img, xxg, -2)
        s = jnp.stack(
            [
                _sepconv(gy, g, -1),
                _sepconv(gy, xg, -1),
                _sepconv(yg_, g, -1),
                _sepconv(gy, xxg, -1),
                _sepconv(yyg_, g, -1),
                _sepconv(yg_, xg, -1),
            ],
            axis=-1,
        )
        r = s @ jnp.asarray(invG.T, dtype=s.dtype)
        return r[..., 1:3], r[..., 3:6]

    # two multi-channel convolutions instead of nine single-channel passes:
    # y-pass produces the 3 row-filtered channels in one sweep over the image,
    # the x-pass combines them into the 6 moment maps (zero taps select the
    # wanted (channel, kernel) pairs) — same sums, ~4x less HBM traffic
    k = len(g)
    r = k // 2
    p = jnp.pad(img, ((r, r), (r, r)), mode="edge")[None, None]  # (1,1,H+,W+)
    k1 = jnp.asarray(
        np.stack([g, xg, xxg])[:, None, :, None], dtype=p.dtype
    )  # (O=3, I=1, K, 1)
    rows = jax.lax.conv_general_dilated(
        p, k1, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )  # (1, 3, H, W+2r): channels = (gy, yg_, yyg_)
    # output order (s00, s10, s01, s20, s02, s11); input channel, kernel:
    pairs = ((0, g), (0, xg), (1, g), (0, xxg), (2, g), (1, xg))
    k2 = np.zeros((6, 3, 1, k), dtype=np.float32)
    for o, (i, kern) in enumerate(pairs):
        k2[o, i, 0] = kern
    s = jax.lax.conv_general_dilated(
        rows, jnp.asarray(k2, dtype=p.dtype), window_strides=(1, 1),
        padding="VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )[0]  # (6, H, W)
    s = jnp.moveaxis(s, 0, -1)
    r = s @ jnp.asarray(invG.T, dtype=s.dtype)
    b = r[..., 1:3]
    A = r[..., 3:6]
    return b, A


def _box_blur(img, winsize):
    """Separable box filter with edge replication (cv2 box aggregation),
    via cumulative sums — O(1) work per pixel independent of winsize."""
    r = winsize // 2

    def box1d(a, axis):
        pad = [(0, 0)] * a.ndim
        pad[axis] = (r, r)
        p = jnp.pad(a, pad, mode="edge")
        c = jnp.cumsum(p, axis=axis)
        zeros_shape = list(c.shape)
        zeros_shape[axis] = 1
        c = jnp.concatenate([jnp.zeros(zeros_shape, c.dtype), c], axis=axis)
        n = a.shape[axis]
        hi = jax.lax.slice_in_dim(c, winsize, winsize + n, axis=axis)
        lo = jax.lax.slice_in_dim(c, 0, n, axis=axis)
        return (hi - lo) / winsize

    return box1d(box1d(img, -2), -1)


def _update_flow(b1, A1, R2, flow, winsize, num_iters, resamples=None):
    """Iterative displacement refinement at one pyramid level.

    The target expansion R2 is re-warped ``resamples`` times; between
    re-warps the remaining iterations re-solve the window-aggregated normal
    equations against the frozen warp (pure box blurs + elementwise — no
    gathers).  ``resamples == num_iters`` reproduces the warp-every-iteration
    scheme exactly."""
    if resamples is None:
        resamples = num_iters
    resamples = max(1, min(resamples, num_iters))
    h, w = b1.shape[:2]
    gx = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    gy = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)

    def solve(b2w, A2w, flow):
        axx = 0.5 * (A1[..., 0] + A2w[..., 0])
        ayy = 0.5 * (A1[..., 1] + A2w[..., 1])
        axy = 0.25 * (A1[..., 2] + A2w[..., 2])  # off-diagonal of A
        dbx = -0.5 * (b2w[..., 0] - b1[..., 0])
        dby = -0.5 * (b2w[..., 1] - b1[..., 1])
        dbx = dbx + axx * flow[..., 0] + axy * flow[..., 1]
        dby = dby + axy * flow[..., 0] + ayy * flow[..., 1]
        # normal equations G d = h, aggregated over the window
        g11 = _box_blur(axx * axx + axy * axy, winsize)
        g12 = _box_blur(axx * axy + axy * ayy, winsize)
        g22 = _box_blur(axy * axy + ayy * ayy, winsize)
        h1 = _box_blur(axx * dbx + axy * dby, winsize)
        h2 = _box_blur(axy * dbx + ayy * dby, winsize)
        # Tikhonov-regularised solve, as OpenCV's FarnebackUpdateFlow_blur
        # (optflowgf.cpp: idet = 1/(g11*g22 - g12*g12 + 1e-3)): in flat /
        # pure-noise regions the normal matrix collapses towards zero and an
        # unregularised inverse amplifies quantisation noise into tens of
        # pixels of spurious displacement — measured p50 |d| 3.1 px vs cv2's
        # 0.00 on a noisy-background scene before this term.
        inv_det = 1.0 / (g11 * g22 - g12 * g12 + 1e-3)
        dx = (g22 * h1 - g12 * h2) * inv_det
        dy = (g11 * h2 - g12 * h1) * inv_det
        return jnp.stack([dx, dy], axis=-1)

    # NOTE: with a frozen warp the linear solve is exact, so repeated inner
    # solves just re-add the same correction (divergent); every solve must be
    # preceded by a re-warp.  ``resamples`` therefore caps the number of
    # warp+solve rounds actually run.
    #
    # The target expansion is pre-shifted ONCE by the incoming integer flow
    # (full ±radius band); each round then resamples only the small residual
    # displacement (the per-level refinement is bounded by ~winsize/2), so
    # the dominant banded-warp cost shrinks ~3x.  The residual band clips
    # extreme corrections — the next pyramid level absorbs them.
    from tobac_flow_tpu.ops.banded import warp_banded_multi

    radius = int(min(20, max(h, w) // 2 + 1))
    res_radius = min(6, radius)
    stack = jnp.moveaxis(R2, -1, 0)  # (5, H, W)
    base_int = jnp.round(flow)
    stack0 = warp_banded_multi(
        stack, base_int, radius=radius, method="nearest", pad_mode="edge"
    )

    def body(_, flow):
        samp = warp_banded_multi(
            stack0, flow - base_int, radius=res_radius, method="linear",
            pad_mode="edge",
        )
        return solve(
            jnp.moveaxis(samp[0:2], 0, -1), jnp.moveaxis(samp[2:5], 0, -1), flow
        )

    return jax.lax.fori_loop(0, min(resamples, num_iters), body, flow)


def _gauss_blur(img, sigma):
    if sigma <= 0:
        return img
    r = max(1, int(math.ceil(sigma * 3.0)))
    u = np.arange(-r, r + 1)
    k = np.exp(-(u**2) / (2 * sigma**2))
    k /= k.sum()
    return _sepconv(_sepconv(img, k, -2), k, -1)


def farneback_pair(prev, nxt, params: FarnebackParams = None):
    """Dense flow from `prev` to `nxt` ((H, W) float32 in [0, 255]).

    Returns (H, W, 2) flow, channel 0 = x displacement, 1 = y.
    """
    if params is None:
        params = FarnebackParams()
    h, w = prev.shape
    # limit pyramid so the coarsest level still fits the expansion window
    min_size = 2 * params.poly_n + 3
    levels = 0
    for k in range(params.num_levels):
        s = params.pyr_scale**k
        if min(h, w) * s < min_size:
            break
        levels = k
    prev = prev.astype(jnp.float32)
    nxt = nxt.astype(jnp.float32)

    flow = None
    for k in range(levels, -1, -1):
        scale = params.pyr_scale**k
        hk = max(int(round(h * scale)), 1)
        wk = max(int(round(w * scale)), 1)
        sigma = (1.0 / scale - 1.0) * 0.5
        i1 = jax.image.resize(_gauss_blur(prev, sigma), (hk, wk), method="linear")
        i2 = jax.image.resize(_gauss_blur(nxt, sigma), (hk, wk), method="linear")
        b1, A1 = poly_exp(i1, params.poly_n, params.poly_sigma)
        b2, A2 = poly_exp(i2, params.poly_n, params.poly_sigma)
        R2 = jnp.concatenate([b2, A2], axis=-1)
        if flow is None:
            # derive the zero init from the input so its sharding/varying type
            # matches inside shard_map (fori_loop carries must type-match)
            flow = jnp.zeros((hk, wk, 2), dtype=jnp.float32) + 0.0 * i1[..., None]
        else:
            flow = (
                jax.image.resize(flow, (hk, wk, 2), method="linear")
                / params.pyr_scale
            )
        flow = _update_flow(
            b1, A1, R2, flow, params.winsize, params.num_iters, params.resamples
        )
    return flow
