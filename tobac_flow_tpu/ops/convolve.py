"""Semi-Lagrangian flow-warped convolution over a (T, H, W) sequence.

TPU-native rebuild of the reference hot loop ``tobac_flow/convolve.py:147-348``:
for every timestep, gather up to 27 neighbours defined by a (3,3,3)
structuring element, where the t-1 plane samples the previous frame warped by
the *backward* flow, the t+1 plane samples the next frame warped by the
*forward* flow, and the t plane uses integer shifts of the current frame.
Out-of-frame samples become ``fill_value``; boundary frames (t=0 prev,
t=T-1 next) are entirely fill.

Unlike the reference, the whole time axis is processed in one traced XLA
program (``vmap`` over T), so there is no per-frame Python loop and the
reduction ``func`` fuses with the gathers.  Tap ordering matches the reference
exactly — backward-plane taps first (row-major over ``structure[0]``), then
same-plane, then forward-plane (``convolve.py:205-243``) — so centre-indexed
reductions like the Sobel kernels (``sobel.py:32-86`` indexing x[13]) carry
over unchanged.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.ops.banded import point_warp_fix
from tobac_flow_tpu.ops.warp import shift_plane, warp_plane
from tobac_flow_tpu.utils.device_cache import device_put_cached
from tobac_flow_tpu.utils.program_cache import persistent_jit

__all__ = [
    "convolve",
    "structure_taps",
    "DEFAULT_STRUCTURE",
    "FAST_WARP",
    "set_fast_warp",
    "set_banded_exact",
    "set_plan_frame_k",
]

# When True (default), nearest/linear/cubic flow-warps use the banded-shift
# gather (ops/banded.py) — the TPU-fast path.  Set False to force the
# per-pixel XLA gather everywhere (CPU parity studies; pathological on TPU).
FAST_WARP = True

# When True (default), the banded path uses the EXACT 2D bounded-displacement
# factorisation (ops/banded.warp_banded_exact): both displacement components
# evaluated at the destination pixel, matching cv2.remap semantics.  False
# selects the cheaper separable two-pass approximation (dy evaluated at the
# x-shifted column — fine for smooth flow, wrong in rough flow).
BANDED_EXACT = True

# tap-pixels (n_taps x T x H x W) above which `convolve` processes the time
# axis in halo-overlapped chunks — the whole-volume vmap keeps one (T, H, W)
# temporary live per tap and blows HBM on GOES-day windows
BUDGET_TAP_PX = 600_000_000


def set_fast_warp(enabled: bool) -> bool:
    """Select the warp implementation for all flow-warped ops.

    ``True`` (default): banded-shift separable warps — the TPU-fast path,
    cv2-exact wherever the flow field is locally smooth.  ``False``: exact
    per-pixel 2D gathers (cv2.remap-faithful to its 1/32 fixed-point
    quantisation) — the right choice for CPU parity studies; pathologically
    slow on this TPU stack.

    Exists as a function because ``tobac_flow_tpu.ops.convolve`` names the
    *function* re-exported by the package (it shadows this module), so
    ``...ops.convolve.FAST_WARP = False`` silently sets an attribute on the
    function object instead of the module global.  Returns the previous
    value.
    """
    global FAST_WARP
    prev = FAST_WARP
    FAST_WARP = bool(enabled)
    return prev


def set_banded_exact(enabled: bool) -> bool:
    """Select exact-2D (True, default) vs separable (False) banded warps.

    A function for the same module-shadowing reason as ``set_fast_warp``.
    Returns the previous value.
    """
    global BANDED_EXACT
    prev = BANDED_EXACT
    BANDED_EXACT = bool(enabled)
    return prev


# Adaptive band radii: the banded warp's cost is linear in each radius, and
# real flow fields rarely approach the reference's ±20 px clip
# (``flow.py:60-61``) — measure max |displacement| once per flow array (memoised
# by identity, like the device transfer cache) and shrink the band to fit.
_RADII_MEMO: dict = {}
_RADII_MAX_ENTRIES = 8


def _flow_band_radii(*flows):
    """(radius_y, radius_x) covering max |displacement| + 1 structure-tap px,
    clipped to the reference's ±20 px flow bound (+1)."""
    import weakref

    mx = my = 0.0
    for arr in flows:
        key = id(arr)
        ent = _RADII_MEMO.get(key)
        if ent is not None and ent[0]() is arr:
            m = ent[1]
        else:
            dev = device_put_cached(arr)
            m = np.asarray(
                jnp.max(
                    jnp.where(jnp.isfinite(dev), jnp.abs(dev), 0.0),
                    axis=tuple(range(dev.ndim - 1)),
                )
            )
            try:
                ref = weakref.ref(arr, lambda _r, k=key: _RADII_MEMO.pop(k, None))
                _RADII_MEMO[key] = (ref, m)
                while len(_RADII_MEMO) > _RADII_MAX_ENTRIES:
                    _RADII_MEMO.pop(next(iter(_RADII_MEMO)))
            except TypeError:
                pass
        mx = max(mx, float(m[0]))
        my = max(my, float(m[1]))
    to_radius = lambda v: int(min(21, max(2, int(np.ceil(v + 1e-3)) + 1)))
    return to_radius(my), to_radius(mx)


# Per-frame traced band plan: the banded warp's fori sweep costs
# O(band_y x band_x) tiny sequential iterations per frame, and a handful of
# ±20 px Farneback-noise vectors per frame saturate any min/max-based sweep
# bound (the measured e2e profile burned ~420 s in radius-21 sweeps warping
# fields whose typical displacement was <3 px).  Inside each frame's map
# body, ONE top_k over the displacement magnitude yields both (a) dynamic
# sweep bounds covering all but the top-K displacements and (b) the raveled
# positions of that top-K tail, which ``point_warp_fix`` then repairs
# exactly with K-point gathers (K-point XLA gathers are cheap — only
# full-volume gathers hit the pathological path).  Results are
# bit-identical to a full-band sweep; quiet frames sweep a few strips,
# turbulent (pre-storm pure-noise) frames degrade gracefully to wide
# sweeps of only themselves.  0 disables the tail plan (sweep bounds then
# come from each frame's signed min/max displacement — still dynamic,
# still exact, but one outlier pixel widens its whole frame's sweep).
PLAN_FRAME_K = 1024


def set_plan_frame_k(k: int) -> int:
    """Set the per-frame outlier-repair budget (0 disables the tail plan).

    A function for the same module-shadowing reason as ``set_fast_warp``.
    Returns the previous value.
    """
    global PLAN_FRAME_K
    prev = PLAN_FRAME_K
    PLAN_FRAME_K = int(k)
    return prev


def _flow_frame_plan(flow, k):
    """Traced ((dy_lo, dy_hi, dx_lo, dx_hi), pos) for ONE frame's flow:
    sweep bounds covering every displacement except the top-``k`` magnitudes,
    whose raveled positions are returned (-1 where the tail is already
    inside the bounds).  Must run unbatched (inside ``lax.map``).

    The bounds are the intersection of the signed min/max displacement range
    with ±ceil(k-th largest magnitude): every pixel displaced outside them
    has magnitude strictly above the k-th largest and therefore appears in
    ``pos`` — the swept band plus the point repair covers every pixel
    exactly."""
    dy = flow[..., 1]
    dx = flow[..., 0]
    dy = jnp.where(jnp.isfinite(dy), dy, 0.0)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    m = jnp.maximum(jnp.abs(dy), jnp.abs(dx)).ravel()
    vals, idx = jax.lax.top_k(m, k)
    r_thresh = vals[-1]
    r_dyn = jnp.ceil(r_thresh).astype(jnp.int32)
    bounds = (
        jnp.maximum(jnp.floor(jnp.min(dy)).astype(jnp.int32), -r_dyn),
        jnp.minimum(jnp.ceil(jnp.max(dy)).astype(jnp.int32), r_dyn),
        jnp.maximum(jnp.floor(jnp.min(dx)).astype(jnp.int32), -r_dyn),
        jnp.minimum(jnp.ceil(jnp.max(dx)).astype(jnp.int32), r_dyn),
    )
    pos = jnp.where(vals > r_thresh, idx.astype(jnp.int32), -1)
    return bounds, pos


def _flow_dyn_bounds(flow):
    """Traced (dy_lo, dy_hi, dx_lo, dx_hi) int32 bounds of a flow array.

    Computed over the WHOLE array (chunk-global) so they are unbatched when
    closed over by a per-frame ``vmap`` — the ``warp_banded_exact_multi``
    contract.  Unclipped bounds are safe: the warp clamps its sweep range to
    the static band, so an out-of-band displacement only widens the request,
    never narrows it below what the clipped displacements touch."""
    dy = flow[..., 1]
    dx = flow[..., 0]
    dy = jnp.where(jnp.isfinite(dy), dy, 0.0)
    dx = jnp.where(jnp.isfinite(dx), dx, 0.0)
    return (
        jnp.floor(jnp.min(dy)).astype(jnp.int32),
        jnp.ceil(jnp.max(dy)).astype(jnp.int32),
        jnp.floor(jnp.min(dx)).astype(jnp.int32),
        jnp.ceil(jnp.max(dx)).astype(jnp.int32),
    )


def _warp_plane_banded(
    img, flow, offsets, method, fill_value, ry=21, rx=21, dyn_bounds=None
):
    from tobac_flow_tpu.ops.banded import warp_banded, warp_banded_exact_multi

    if BANDED_EXACT:
        # one shared-band pass for the whole structuring plane: the integer
        # offsets only shift which strip a pixel reads, so all slice traffic
        # is amortised across the plane's taps.  The caller's (ry, rx)
        # already cover max |flow| + 1 tap offset, so shrink the flow band
        # by the max offset the call folds back in.
        max_ox = max((abs(int(ox)) for ox, _ in offsets), default=0)
        max_oy = max((abs(int(oy)) for _, oy in offsets), default=0)
        return warp_banded_exact_multi(
            img, flow, offsets,
            radius_y=max(1, ry - max_oy), radius_x=max(1, rx - max_ox),
            method=method, fill_value=fill_value, dyn_bounds=dyn_bounds,
        )
    outs = []
    for ox, oy in offsets:
        off = jnp.asarray([float(ox), float(oy)], dtype=jnp.float32)
        outs.append(
            warp_banded(
                img, flow + off, radius=max(ry, rx), method=method,
                fill_value=fill_value,
            )
        )
    return jnp.stack(outs, axis=0)


def _binary_structure_1():
    s = np.zeros((3, 3, 3), dtype=bool)
    s[1, 1, :] = True
    s[1, :, 1] = True
    s[:, 1, 1] = True
    return s


DEFAULT_STRUCTURE = _binary_structure_1()


def structure_taps(structure):
    """Decompose a (3,3,3) structuring element into per-plane (ox, oy) taps.

    Tap order within each plane is row-major over ``np.where`` (reference
    ``convolve.py:212``), with offsets measured from the plane centre.
    Returns (backward_taps, same_taps, forward_taps) as tuples of (ox, oy).
    """
    structure = np.asarray(structure)
    if structure.shape != (3, 3, 3):
        raise ValueError("Structure input must be a 3x3x3 array")
    planes = []
    for k in range(3):
        rows, cols = np.nonzero(structure[k])
        planes.append(tuple((int(c) - 1, int(r) - 1) for r, c in zip(rows, cols)))
    return tuple(planes)


def _convolve_impl(
    data, forward_flow, backward_flow, taps, method, fill_value, func, out_fill,
    band_radii=(21, 21),
):
    back_taps, same_taps, fwd_taps = taps
    t, h, w = data.shape
    fill_frame = jnp.full((1, h, w), fill_value, dtype=data.dtype)
    prev = jnp.concatenate([fill_frame, data[:-1]], axis=0)
    nxt = jnp.concatenate([data[1:], fill_frame], axis=0)

    banded = FAST_WARP and method in ("nearest", "linear", "cubic")
    if banded:
        plane_warp = functools.partial(
            _warp_plane_banded, ry=band_radii[0], rx=band_radii[1]
        )
    else:
        plane_warp = lambda im, fl, tp, method, fill_value, dyn_bounds=None: (
            warp_plane(im, fl, tp, method=method, fill_value=fill_value)
        )

    # the separable two-pass path (BANDED_EXACT=False) has no dynamic-bound
    # sweep and the point fix would mix exact-2D semantics into it — the
    # per-frame plan only serves the exact banded kernel
    plan_k = max(1, min(int(PLAN_FRAME_K), h * w)) if PLAN_FRAME_K else 0
    plan = banded and BANDED_EXACT and plan_k > 0

    # lax.map over frames instead of vmap: (a) each frame computes its OWN
    # traced sweep bounds — inside a map body they are unbatched scalars, so
    # the banded warp's dynamic_slice starts stay scalar and the sweep
    # shrinks to what THAT frame's displacements touch (a global bound is
    # useless: one ±20 px Farneback-noise pixel anywhere in the volume
    # saturates it); (b) peak HBM holds one frame's tap stack instead of
    # n_taps full (T, H, W) temporaries.  The top-K displacement tail beyond
    # each frame's planned bounds (_flow_frame_plan) is exact-repaired with
    # K-point gathers (point_warp_fix).
    def warp_part(img_i, flow_i, part_taps):
        if plan:
            bounds, pos = _flow_frame_plan(flow_i, plan_k)
        elif banded:
            bounds, pos = _flow_dyn_bounds(flow_i), None
        else:
            bounds, pos = None, None
        plane = plane_warp(
            img_i, flow_i, part_taps, method=method, fill_value=fill_value,
            dyn_bounds=bounds,
        )
        if pos is not None:
            plane = point_warp_fix(
                plane, img_i, flow_i, part_taps, pos, method, fill_value
            )
        return plane

    def frame_op(args):
        prev_i, data_i, nxt_i, fwd_i, bwd_i = args
        parts_i = []
        if back_taps:
            parts_i.append(warp_part(prev_i, bwd_i, back_taps))
        if same_taps:
            parts_i.append(shift_plane(data_i, same_taps, fill_value=fill_value))
        if fwd_taps:
            parts_i.append(warp_part(nxt_i, fwd_i, fwd_taps))
        stacked_i = jnp.concatenate(parts_i, axis=0)  # (n_struct, H, W)
        if func is None:
            return stacked_i
        res_i = func(stacked_i)
        if jnp.issubdtype(data.dtype, jnp.floating):
            res_i = jnp.where(jnp.isnan(data_i), out_fill, res_i)
        return res_i

    out = jax.lax.map(frame_op, (prev, data, nxt, forward_flow, backward_flow))
    if func is None:
        return jnp.moveaxis(out, 0, 1)  # (n_struct, T, H, W)
    return out


@persistent_jit(
    static_argnames=("taps", "method", "func", "out_dtype", "fast_warp", "band_radii"),
)
def _convolve_jit(
    data, forward_flow, backward_flow, taps, method, fill_value, func, out_dtype,
    fast_warp, band_radii,
):
    out = _convolve_impl(
        data, forward_flow, backward_flow, taps, method, fill_value, func, fill_value,
        band_radii,
    )
    return out.astype(out_dtype)


def convolve(
    data,
    forward_flow,
    backward_flow,
    structure=None,
    method="linear",
    dtype=np.float32,
    fill_value=np.nan,
    func=None,
):
    """Flow-warped convolution (reference API ``convolve.py:248-348``).

    Parameters
    ----------
    data : (T, H, W) array.
    forward_flow, backward_flow : (T, H, W, 2) arrays (channel 0 = x, 1 = y).
    structure : (3,3,3) boolean/int array; plane 0 acts backwards in time,
        plane 2 forwards. Defaults to connectivity-1.
    method : interpolation method for the flow-warped planes.
    dtype : output dtype.
    fill_value : value for out-of-frame / boundary samples.
    func : optional reduction applied over tap axis 0 of the stacked
        (n_struct, T, H, W) array. Must be a jax-traceable callable; pass a
        module-level function (not a fresh lambda) to benefit from jit caching.

    Returns
    -------
    (n_struct, T, H, W) if func is None, else func's result (typically
    (T, H, W)) with NaN input locations forced to fill_value.

    Residency: below BUDGET_TAP_PX the result is a device array; above it
    the call runs in host time-chunks and returns a host ndarray — the
    deliberate HBM bound (stitching on device would hold the full-size
    result next to the chunk working set).  Callers that need device
    residency at that scale should consume per-chunk results themselves.
    """
    if structure is None:
        structure = DEFAULT_STRUCTURE
    taps = structure_taps(structure)

    # Large windows are processed in time chunks with one-frame halos: the
    # stencil is temporally local (t±1) so stitching is exact, and the
    # whole-volume vmap otherwise keeps n_taps live (T, H, W) temporaries —
    # a 27-tap GOES-day call wants >17 GB of HBM.
    t_total, h, w = data.shape[:3]
    n_taps = sum(len(p) for p in taps)
    chunk_t = max(4, int(BUDGET_TAP_PX / max(n_taps, 1) / max(h * w, 1)))
    # only chunk when it helps: sub-windows are chunk_t + 2 frames (halo
    # included), so anything at or below that must run whole or the
    # recursion never terminates
    if t_total > chunk_t + 2:
        outs = []
        for s in range(0, int(t_total), chunk_t):
            e = min(int(t_total), s + chunk_t)
            s0, e0 = max(0, s - 1), min(int(t_total), e + 1)
            sub = convolve(
                data[s0:e0],
                forward_flow[s0:e0],
                backward_flow[s0:e0],
                structure=structure,
                method=method,
                dtype=dtype,
                fill_value=fill_value,
                func=func,
            )
            outs.append(np.asarray(sub)[..., s - s0 : e - s0, :, :])
        return np.concatenate(outs, axis=-3)

    # data repeats across the detection chain's many convolve calls (bt and
    # wvd each feed several growth/filter passes) — cache the upload like
    # the flow fields
    data = device_put_cached(data)
    out_dtype = jnp.dtype(dtype)
    if method == "nearest":
        # nearest-neighbour gathers preserve the working dtype (labels stay int)
        work = data.astype(out_dtype)
    else:
        work = data.astype(jnp.float32)

    band_radii = (21, 21)
    if FAST_WARP and method in ("nearest", "linear", "cubic") and not BANDED_EXACT:
        # the separable path has no dynamic sweep bounds: shrink its static
        # band to the measured max displacement instead
        band_radii = _flow_band_radii(forward_flow, backward_flow)

    return _convolve_jit(
        work,
        device_put_cached(forward_flow),
        device_put_cached(backward_flow),
        taps,
        method,
        fill_value,
        func,
        out_dtype,
        # part of the jit key so toggling retriggers compilation
        (FAST_WARP, BANDED_EXACT, PLAN_FRAME_K),
        band_radii,
    )
