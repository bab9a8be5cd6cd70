"""Fused single-chip detection pipeline: the whole dense compute path in one
jitted program with the time window resident in HBM.

This is the performance path the benchmarks measure (SURVEY §7 M4: flow →
growth → edge field → watershed without leaving the device); the modular ops
in ``ops/`` and the science layer in ``detect/`` remain the flexible API.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

import numpy as np

from tobac_flow_tpu.models.farneback import FarnebackParams, farneback_pair
from tobac_flow_tpu.ops.banded import (
    warp_banded,
    warp_banded_exact,
    warp_banded_exact_multi,
)
from tobac_flow_tpu.ops.warp import shift_plane, warp_plane
from tobac_flow_tpu.ops.watershed import watershed
from tobac_flow_tpu.utils.program_cache import persistent_jit

__all__ = ["device_flow", "device_detect_fields", "fused_flow_watershed"]


def _normalise_pair(prev, nxt):
    stack = jnp.stack([prev, nxt])
    vmin = jnp.nanmin(stack)
    vmax = jnp.nanmax(stack)
    norm = jnp.clip(
        (stack - vmin) * jnp.where(vmax > vmin, 1.0 / (vmax - vmin), 0.0), 0.0, 1.0
    )
    scaled = norm * 255.0
    finite = jnp.isfinite(scaled)
    filled = jnp.where(finite, scaled, 127.0)
    a = jnp.where(finite[0], filled[0], jnp.where(finite[1], filled[1], 127.0))
    b = jnp.where(finite[1], filled[1], jnp.where(finite[0], filled[0], 127.0))
    return jnp.round(a), jnp.round(b)


@persistent_jit(
    static_argnames=(
        "params",
        "max_value",
        "vr_steps",
        "smoothing_passes",
        "interp_method",
    ),
)
def device_flow(
    data,
    params: FarnebackParams | None = None,
    max_value: float = 20.0,
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    interp_method: str = "linear",
):
    """Forward/backward flow for a device-resident (T, H, W) stack.

    Frame pairs are mapped with ``lax.map`` so the pairwise program compiles
    once regardless of T.  Jitted at the top level too: called eagerly, the
    op-by-op dispatch of the Farneback pyramid is orders of magnitude slower.

    ``vr_steps``/``smoothing_passes``/``interp_method`` mirror the
    ``create_flow`` CLI defaults (reference ``flow.py:499-568``): both extra
    passes are banded-shift formulations (``models/variational``,
    ``core.flow.smooth_flow_step``) so the production configuration stays
    gather-free on device.
    """
    if params is None:
        params = FarnebackParams()

    def pair_fn(idx):
        prev = jax.lax.dynamic_index_in_dim(data, idx, keepdims=False)
        nxt = jax.lax.dynamic_index_in_dim(data, idx + 1, keepdims=False)
        p8, n8 = _normalise_pair(prev, nxt)
        fwd = farneback_pair(p8, n8, params)
        bwd = farneback_pair(n8, p8, params)
        if vr_steps > 0:
            from tobac_flow_tpu.models.variational import variational_refine

            fwd = variational_refine(p8, n8, fwd, steps=vr_steps)
            bwd = variational_refine(n8, p8, bwd, steps=vr_steps)
        if smoothing_passes > 0:
            from tobac_flow_tpu.core.flow import smooth_flow_step

            for _ in range(smoothing_passes):
                fwd, bwd = smooth_flow_step(fwd, bwd, method=interp_method)
        return fwd, bwd

    t = data.shape[0]
    idxs = jnp.arange(t - 1)
    fwd_pairs, bwd_pairs = jax.lax.map(pair_fn, idxs)
    last_fwd = -bwd_pairs[-1:]
    first_bwd = -fwd_pairs[:1]
    fwd = jnp.concatenate([fwd_pairs, last_fwd], axis=0)
    bwd = jnp.concatenate([first_bwd, bwd_pairs], axis=0)
    return jnp.clip(fwd, -max_value, max_value), jnp.clip(bwd, -max_value, max_value)


def _flow_diff(data, fwd, bwd, method="linear", radius=20):
    """Semi-Lagrangian central difference, mapped over frames (whole-volume
    gathers on GOES-scale stacks hit a slow XLA path; per-frame gathers via
    lax.map run several times faster and bound the working set)."""
    t, h, w = data.shape
    nan_frame = jnp.full((1, h, w), jnp.nan, dtype=data.dtype)
    padded = jnp.concatenate([nan_frame, data, nan_frame], axis=0)

    def one_frame(i):
        prev = jax.lax.dynamic_index_in_dim(padded, i, keepdims=False)
        cur = jax.lax.dynamic_index_in_dim(padded, i + 1, keepdims=False)
        nxt = jax.lax.dynamic_index_in_dim(padded, i + 2, keepdims=False)
        bw = jax.lax.dynamic_index_in_dim(bwd, i, keepdims=False)
        fw = jax.lax.dynamic_index_in_dim(fwd, i, keepdims=False)
        prev_tap = warp_banded_exact(
            prev, bw, method=method, radius_y=radius, radius_x=radius
        )
        next_tap = warp_banded_exact(
            nxt, fw, method=method, radius_y=radius, radius_x=radius
        )
        f_ok = jnp.isfinite(next_tap)
        b_ok = jnp.isfinite(prev_tap)
        total = jnp.where(f_ok, next_tap - cur, 0.0) + jnp.where(
            b_ok, cur - prev_tap, 0.0
        )
        return total / jnp.maximum(
            f_ok.astype(jnp.float32) + b_ok.astype(jnp.float32), 1.0
        )

    return jax.lax.map(one_frame, jnp.arange(t))


_SOBEL_BASE = np.multiply.outer(
    np.array([1, 2, 1]), np.multiply.outer(np.array([1, 2, 1]), np.array([-1, 0, 1]))
)
_SOBEL_WX = _SOBEL_BASE
_SOBEL_WY = _SOBEL_BASE.transpose(0, 2, 1)
_SOBEL_WT = _SOBEL_BASE.transpose(2, 0, 1)


def _flow_sobel_uphill(data, fwd, bwd, method="linear", approx=False,
                      radius=20):
    """27-tap uphill Sobel, mapped over frames with ``lax.map`` so the
    per-step working set is a handful of single frames (the whole-volume
    formulation keeps ~100 (T,H,W) temporaries live and blows HBM on
    GOES-scale windows).

    The default path warps each temporal plane at all 9 structuring offsets
    in ONE shared-band exact pass (``warp_banded_exact_multi``) — reference
    semantics img[p+flow(p)+o], with the band slice traffic amortised across
    the offsets, so exactness costs about the same as the old approximation.
    ``approx=True`` keeps the round-2 shortcut (warp once, shift the warped
    frame) for A/B studies."""
    offsets = [(ox, oy) for oy in (-1, 0, 1) for ox in (-1, 0, 1)]
    t, h, w = data.shape
    nan_frame = jnp.full((1, h, w), jnp.nan, dtype=data.dtype)
    padded = jnp.concatenate([nan_frame, data, nan_frame], axis=0)

    def one_frame(i):
        prev = jax.lax.dynamic_index_in_dim(padded, i, keepdims=False)
        cur = jax.lax.dynamic_index_in_dim(padded, i + 1, keepdims=False)
        nxt = jax.lax.dynamic_index_in_dim(padded, i + 2, keepdims=False)
        bw = jax.lax.dynamic_index_in_dim(bwd, i, keepdims=False)
        fw = jax.lax.dynamic_index_in_dim(fwd, i, keepdims=False)

        if approx:
            prev_w = warp_banded(prev, bw, radius=radius, method="linear")
            next_w = warp_banded(nxt, fw, radius=radius, method="linear")
            prev_taps = shift_plane(prev_w, offsets, fill_value=jnp.nan)
            next_taps = shift_plane(next_w, offsets, fill_value=jnp.nan)
        else:
            prev_taps = warp_banded_exact_multi(
                prev, bw, offsets, radius, radius, method, jnp.nan
            )
            next_taps = warp_banded_exact_multi(
                nxt, fw, offsets, radius, radius, method, jnp.nan
            )
        same_taps = shift_plane(cur, offsets, fill_value=jnp.nan)

        gx = jnp.zeros((h, w), data.dtype)
        gy = jnp.zeros((h, w), data.dtype)
        gt = jnp.zeros((h, w), data.dtype)
        for pi, taps in enumerate((prev_taps, same_taps, next_taps)):
            for oi, (ox, oy) in enumerate(offsets):
                rect = jnp.fmax(taps[oi] - cur, 0.0)
                rect = jnp.where(jnp.isnan(rect), 0.0, rect)
                gx = gx + float(_SOBEL_WX[pi, oy + 1, ox + 1]) * rect
                gy = gy + float(_SOBEL_WY[pi, oy + 1, ox + 1]) * rect
                gt = gt + float(_SOBEL_WT[pi, oy + 1, ox + 1]) * rect
        return jnp.sqrt(gx * gx + gy * gy + gt * gt)

    return jax.lax.map(one_frame, jnp.arange(t))


@persistent_jit(static_argnames=("params",))
def _flow_stage(bt, params=None):
    return device_flow(bt, params)


@persistent_jit(static_argnames=("radius",))
def _detect_fields_stage(bt, fwd, bwd, dt_minutes, radius):
    growth = -_flow_diff(bt, fwd, bwd, radius=radius) / dt_minutes
    field = jnp.clip((260.0 - bt) / 10.0, 0.0, 1.0)
    edges = _flow_sobel_uphill(field, fwd, bwd, radius=radius)
    edges = jnp.where(edges > 0, edges + 1.0, edges) - field
    return growth, field, edges


def adaptive_band_radius(fwd, bwd, cap=20):
    """Static band radius covering the actual flow extrema (one scalar
    readback).  The exact banded warp's cost is linear in each radius, and
    real flow rarely approaches the ±20 px clip."""
    m = float(
        jnp.maximum(jnp.max(jnp.abs(fwd)), jnp.max(jnp.abs(bwd)))
    )
    if not np.isfinite(m):
        return int(cap)
    return int(min(cap, max(2, int(np.ceil(m)))))


def _fields_stage(bt, dt_minutes, params=None, radius=None):
    """Flow + growth + anvil edge field: one flow program, then the detect
    program with a flow-adapted static warp band (exact warps end to end)."""
    fwd, bwd = _flow_stage(bt, params)
    if radius is None:
        if isinstance(bt, jax.core.Tracer):
            radius = 20  # traced callers cannot read back the flow extrema
        else:
            radius = adaptive_band_radius(fwd, bwd)
    growth, field, edges = _detect_fields_stage(bt, fwd, bwd, dt_minutes, radius)
    return fwd, bwd, growth, field, edges


def fused_flow_watershed(bt, dt_minutes, params=None, ws_iters=128, markers=None):
    """bt (T, H, W) on device -> (flow, growth, edges, watershed labels).

    The benchmark workload: the dense fields compile into one program; the
    watershed runs as host-chunked sweep batches (see ops/watershed) so long
    floods neither trip remote watchdogs nor overrun HBM.

    ``markers`` (int32, 0 = unlabelled) seeds the watershed with competing
    basins — the benchmark passes one label per storm cell so label
    agreement vs the CPU oracle exercises the multi-marker minimax
    assignment, not just flood extent.  ``None`` falls back to a single
    threshold-mask label.
    """
    fwd, bwd, growth, field, edges = _fields_stage(bt, dt_minutes, params)
    if markers is None:
        markers = (field >= 1.0).astype(jnp.int32)
    else:
        markers = jnp.asarray(markers, dtype=jnp.int32)
    mask = field > 0.05
    labels = watershed(
        fwd, bwd, edges, markers, mask=mask, max_iters=ws_iters, return_device=True
    )
    return fwd, growth, edges, labels


def device_detect_fields(bt, wvd, swd, dt_minutes, params=None):
    """Fused device computation of the detection fields used by
    ``detect_cores`` (growth rates + filters are host-composed on top)."""
    fwd, bwd = device_flow(bt, params)
    bt_growth = -_flow_diff(bt, fwd, bwd, method="cubic") / dt_minutes
    wvd_growth = _flow_diff(wvd, fwd, bwd, method="cubic") / dt_minutes
    return fwd, bwd, bt_growth, wvd_growth
