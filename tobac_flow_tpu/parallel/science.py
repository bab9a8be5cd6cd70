"""Real detection science inside the sharded SPMD step.

These functions run INSIDE ``shard_map`` over a (t, x) mesh and reproduce the
single-chip fused detection programs (``detect/fused.py``) exactly, given the
same flow fields: combined curvature/peak filters, flow-tracked growth-rate
markers (reference ``detection.py:301-482``) and the anvil watershed prep
(``detection.py:538-642``).  Three ops need genuine cross-shard treatment;
everything else is local stencils made edge-exact by per-stage x-halo
exchanges plus global-border emulation:

* **gaussian reflect borders** — the tile's halo is overwritten with the
  mirror of its own interior at the GLOBAL domain edges, reproducing
  scipy's symmetric padding (kernel radius ≤ halo);
* **frame-border rules** (curvature's zeroed edge columns, the peak
  filter's 10-px exclusion ring) — applied against the global x coordinate,
  not the tile edge;
* **binary_fill_holes** — an iterative cross-shard flood (halo refresh +
  ``psum`` convergence), exact because the reachability fixpoint is unique.

All flow-displaced taps use the exact 2D banded multi-offset warp
(``ops/banded.py``), so the sharded step and the single-chip path share
warp semantics bit-for-bit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.detect.fused import (
    _B3_OFFS,
    _DISK_OFFS,
    _S2D_OFFS,
    _linearise_j,
    _spatial_gauss_kernels,
)
from tobac_flow_tpu.ops.banded import warp_banded_exact_multi
from tobac_flow_tpu.ops.morphology import (
    _binary_morph,
    _grey_morph,
    _sepconv_reflect,
)
from tobac_flow_tpu.parallel.halo import halo_exchange_t, halo_exchange_x

__all__ = [
    "sharded_core_markers",
    "sharded_anvil_marker_mask",
    "sharded_anvil_prep",
    "sharded_anvil_post",
    "sharded_fill_holes",
]

_ROW_MAX_OFFS = tuple((0, d, 0) for d in range(-10, 11))
_COL_MAX_OFFS = tuple((0, 0, d) for d in range(-10, 11))


def _gx(ext_w, hx, wl, x_axis="x"):
    """Global x coordinate of every column of an hx-extended tile."""
    x0 = jax.lax.axis_index(x_axis) * wl - hx
    return x0 + jax.lax.iota(jnp.int32, ext_w)


def _mirror_global_edges(ext, hx, x_axis="x"):
    """Overwrite the out-of-domain halo columns at the global domain edges
    with the symmetric reflection of the tile interior (scipy 'reflect')."""
    idx = jax.lax.axis_index(x_axis)
    n = jax.lax.axis_size(x_axis)
    left = jnp.flip(ext[..., hx : 2 * hx], axis=-1)
    right = jnp.flip(ext[..., -2 * hx : -hx], axis=-1)
    head = jnp.where(idx == 0, left, ext[..., :hx])
    tail = jnp.where(idx == n - 1, right, ext[..., -hx:])
    return jnp.concatenate([head, ext[..., hx:-hx], tail], axis=-1)


def _crop(a, hx):
    return a[..., hx:-hx] if hx else a


def _shift2d(a, dy, dx, fill_y, fill_x):
    """a[t, y+dy, x+dx] with separate constant fills for y and x edges."""
    t, h, w = a.shape
    if dy:
        pad = jnp.full((t, abs(dy), w), fill_y, a.dtype)
        a = (
            jnp.concatenate([a[:, dy:], pad], axis=1)
            if dy > 0
            else jnp.concatenate([pad, a[:, :dy]], axis=1)
        )
    if dx:
        pad = jnp.full((t, h, abs(dx)), fill_x, a.dtype)
        a = (
            jnp.concatenate([a[:, :, dx:], pad], axis=2)
            if dx > 0
            else jnp.concatenate([pad, a[:, :, :dx]], axis=2)
        )
    return a


def sharded_fill_holes(mask, w_g, x_axis="x", t_axis="t", inner_iters=8):
    """scipy binary_fill_holes (2D per frame) on an x-sharded mask tile.

    Floods the complement from the out-of-domain shell; ``inner_iters``
    local dilation steps per cross-shard halo refresh, with a global
    ``psum`` convergence check.  Exact: the reachability fixpoint is unique
    regardless of sweep scheduling.
    """
    mask = mask != 0
    inv = ~mask
    t, h, wl = mask.shape
    k = int(inner_iters)
    idx = jax.lax.axis_index(x_axis)
    n = jax.lax.axis_size(x_axis)
    max_outer = (h + w_g) // max(k, 1) + 8

    def outer(carry):
        reach, changed, it = carry
        r = halo_exchange_x(reach, x_axis, k, False)
        inv_e = halo_exchange_x(inv, x_axis, k, False)
        # out-of-domain columns: complement True, reach True (the shell)
        edge_l = jnp.ones((t, h, k), bool)
        r = jnp.concatenate(
            [jnp.where(idx == 0, edge_l, r[..., :k]), r[..., k:]], axis=-1
        )
        r = jnp.concatenate(
            [r[..., :-k], jnp.where(idx == n - 1, edge_l, r[..., -k:])], axis=-1
        )
        inv_e = jnp.concatenate(
            [jnp.where(idx == 0, edge_l, inv_e[..., :k]), inv_e[..., k:]],
            axis=-1,
        )
        inv_e = jnp.concatenate(
            [inv_e[..., :-k], jnp.where(idx == n - 1, edge_l, inv_e[..., -k:])],
            axis=-1,
        )

        def inner(_, rr):
            grown = rr
            for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                # y edges are the true domain border: outside is reachable
                grown = grown | _shift2d(rr, dy, dx, True, False)
            return grown & inv_e

        r = jax.lax.fori_loop(0, k, inner, r)
        new = _crop(r, k)
        delta = jnp.any(new != reach).astype(jnp.float32)
        changed = jax.lax.psum(delta, (t_axis, x_axis)) > 0
        return new, changed, it + 1

    def cond(carry):
        _, changed, it = carry
        return changed & (it < max_outer)

    reach0 = jnp.zeros_like(mask)
    # derive the carry scalars from a collective so their varying type
    # matches the body outputs (psum results) inside shard_map
    changed0 = jax.lax.psum(jnp.float32(1.0), (t_axis, x_axis)) > 0
    reach, _, _ = jax.lax.while_loop(
        cond, outer, (reach0, changed0, jnp.int32(0))
    )
    return mask | (inv & ~reach)


def _opening_sharded(mask, x_axis="x"):
    """binary_opening with the in-plane cross structure, cross-shard exact
    (halo 2 covers the erode+dilate depth; beyond-domain is False)."""
    ext = halo_exchange_x(mask, x_axis, 2, False)
    out = _binary_morph(ext, _S2D_OFFS, 1, 0, "erode")
    out = _binary_morph(out, _S2D_OFFS, 1, 0, "dilate")
    return _crop(out, 2)


def _curvature_filter_sharded(field, hx, w_g, direction, x_axis="x"):
    wl = field.shape[-1]
    ext = halo_exchange_x(field, x_axis, hx, jnp.nan)
    mir = _mirror_global_edges(ext, hx, x_axis)
    sm = _sepconv_reflect(mir, _spatial_gauss_kernels(2.0))
    x2 = jnp.zeros_like(sm)
    x2 = x2.at[:, :, 1:-1].set(sm[:, :, 2:] - 2 * sm[:, :, 1:-1] + sm[:, :, :-2])
    y2 = jnp.zeros_like(sm)
    y2 = y2.at[:, 1:-1].set(sm[:, 2:] - 2 * sm[:, 1:-1] + sm[:, :-2])
    gx = _gx(ext.shape[-1], hx, wl, x_axis)
    border = (gx == 0) | (gx == w_g - 1)  # zeroed frame-border columns
    x2 = jnp.where(border, 0.0, x2)
    if direction == "negative":
        cond = (x2 < 0.0) & (y2 < 0.0)
    else:
        cond = (x2 > 0.0) & (y2 > 0.0)
    filled = sharded_fill_holes(_crop(cond, hx), w_g, x_axis)
    return _opening_sharded(filled, x_axis)


def _peak_filter_sharded(field, hx, w_g, direction, x_axis="x"):
    wl = field.shape[-1]
    ext = halo_exchange_x(field, x_axis, hx, jnp.nan)
    mir = _mirror_global_edges(ext, hx, x_axis)
    sm = _sepconv_reflect(mir, _spatial_gauss_kernels(0.5))
    if direction == "positive":
        sm = -sm
    gx = _gx(ext.shape[-1], hx, wl, x_axis)
    in_dom = (gx >= 0) & (gx < w_g)
    smm = jnp.where(in_dom, sm, -jnp.inf)
    mx = _grey_morph(smm, _ROW_MAX_OFFS, "max")
    mx = _grey_morph(mx, _COL_MAX_OFFS, "max")
    peaks = (sm >= mx) & (sm > 0.0) & in_dom
    d = 10
    border = jnp.zeros_like(peaks)
    border = border.at[:, d:-d].set(peaks[:, d:-d])
    peaks = border & (gx >= d) & (gx <= w_g - 1 - d)
    dil = _binary_morph(peaks, _DISK_OFFS, 1, 0, "dilate")
    return _crop(dil, hx)


def _warp_taps(plane, flow_ext, offsets, hx, radius, method, fill, x_axis="x"):
    """Exact multi-offset warp of an x-extended neighbour plane, cropped to
    the tile interior.  ``plane`` and ``flow_ext`` are hx-extended in x."""
    out = warp_banded_exact_multi(
        plane, flow_ext, offsets, radius_y=radius, radius_x=radius,
        method=method, fill_value=fill,
    )
    return _crop(out, hx)


def _tracked_any_sharded(either, fwd, bwd, hx, radius, x_axis="x", t_axis="t"):
    """±1-frame flow-tracked any() of an int mask (fused _channel_filter_j's
    convolve: nearest taps, fill 0)."""
    ei = either.astype(jnp.int32)
    ext = halo_exchange_x(ei, x_axis, hx, 0)
    eh = halo_exchange_t(ext, t_axis, 1, 0)
    fwd_e = halo_exchange_x(fwd, x_axis, hx, 0.0, axis=-2)
    bwd_e = halo_exchange_x(bwd, x_axis, hx, 0.0, axis=-2)
    prev_tap = _warp_taps(eh[:-2], bwd_e, [(0, 0)], hx, radius, "nearest", 0)[0]
    next_tap = _warp_taps(eh[2:], fwd_e, [(0, 0)], hx, radius, "nearest", 0)[0]
    return (prev_tap != 0) | (either != 0) | (next_tap != 0)


def _growth_rate_sharded(field, fwd, bwd, dt, hx, radius, x_axis="x",
                         t_axis="t"):
    """fused _growth_rate_j on tiles: cubic diff along the flow / dt, then
    the in-plane cross nanmean."""
    nan = jnp.float32(jnp.nan)
    ext = halo_exchange_x(field, x_axis, hx, nan)
    fh = halo_exchange_t(ext, t_axis, 1, nan)
    fwd_e = halo_exchange_x(fwd, x_axis, hx, 0.0, axis=-2)
    bwd_e = halo_exchange_x(bwd, x_axis, hx, 0.0, axis=-2)
    prev_tap = warp_banded_exact_multi(
        fh[:-2], bwd_e, [(0, 0)], radius, radius, "cubic", nan
    )[0]
    next_tap = warp_banded_exact_multi(
        fh[2:], fwd_e, [(0, 0)], radius, radius, "cubic", nan
    )[0]
    cur = ext
    fo = next_tap - cur
    bo = cur - prev_tap
    total = jnp.where(jnp.isnan(fo), 0.0, fo) + jnp.where(jnp.isnan(bo), 0.0, bo)
    count = jnp.isfinite(next_tap).astype(jnp.float32) + jnp.isfinite(
        prev_tap
    ).astype(jnp.float32)
    diff = total / jnp.maximum(count, 1.0)
    diff = jnp.where(jnp.isnan(ext), nan, diff)  # convolve's NaN forcing
    growth = diff / dt
    # tap order = structure_taps' row-major cross order (fp-identical mean)
    taps = [
        _shift2d(growth, oy, ox, nan, nan)
        for ox, oy in ((0, -1), (-1, 0), (0, 0), (1, 0), (0, 1))
    ]
    sp = jnp.nanmean(jnp.stack(taps), axis=0)
    sp = jnp.where(jnp.isnan(growth), nan, sp)
    return _crop(sp, hx)


def sharded_core_markers(
    bt, wvd, swd, fwd, bwd, dt, hx, w_g,
    use_wvd=True, wvd_threshold=0.25, bt_threshold=0.5, warp_radius=21,
    x_axis="x", t_axis="t",
):
    """detect_cores' dense front-end on (t, x) tiles — the full combined
    curvature/peak/growth marker logic of ``detection.py:301-482`` /
    ``detect.fused._core_markers_jit``, cross-shard exact.  Returns the
    boolean combined-marker tile."""
    def channel(field, direction):
        curv = _curvature_filter_sharded(field, hx, w_g, direction, x_axis)
        peak = _peak_filter_sharded(field, hx, w_g, direction, x_axis)
        return _tracked_any_sharded(
            curv | peak, fwd, bwd, hx, warp_radius, x_axis, t_axis
        )

    combined = channel(bt, "positive")
    if use_wvd:
        # sequence the two channels' collective flood loops: XLA CPU runs
        # independent collective while-loops concurrently per device and its
        # rendezvous keying collides across loops (hard crash)
        combined, wvd_seq = jax.lax.optimization_barrier((combined, wvd))
        combined = combined | channel(wvd_seq, "negative")
    combined = sharded_fill_holes(combined, w_g, x_axis)
    combined = _opening_sharded(combined, x_axis)
    swd_filter = 1.0 - _linearise_j(swd, 2.5, 7.5)
    combined_filter = combined.astype(jnp.float32) * swd_filter

    bt_growth = _growth_rate_sharded(
        -bt, fwd, bwd, dt, hx, warp_radius, x_axis, t_axis
    )
    merged = (bt_growth * combined_filter) > bt_threshold
    if use_wvd:
        wvd_growth = _growth_rate_sharded(
            wvd, fwd, bwd, dt, hx, warp_radius, x_axis, t_axis
        )
        merged = merged | ((wvd_growth * combined_filter) > wvd_threshold)
    return _opening_sharded(merged, x_axis)


def sharded_anvil_marker_mask(field, threshold, x_axis="x"):
    """get_anvil_markers' mask (threshold + opening), cross-shard exact."""
    return _opening_sharded(field >= threshold, x_axis)


def sharded_anvil_prep(
    field, marker_labels, fwd, bwd, lower, upper, erode_distance, hx,
    warp_radius=21, x_axis="x", t_axis="t",
):
    """detect_anvils' watershed prep on tiles (fused ``_anvil_pre_jit``):
    linearised field, eroded/-1 markers and the cubic uphill-Sobel edge
    field.  ``marker_labels`` are int seeds (e.g. ``global_marker_labels``
    of the marker mask).  Returns (edges, eroded_markers) tiles."""
    nan = jnp.float32(jnp.nan)
    f = _linearise_j(field, float(lower), float(upper))
    ero = _binary_morph(
        halo_exchange_x(marker_labels != 0, x_axis, 1, False),
        _S2D_OFFS, 1, 0, "erode",
    )
    eroded = marker_labels * _crop(ero, 1).astype(jnp.int32)
    wh_nan = jnp.isnan(f)
    e = int(erode_distance)
    m = (f <= 0) | wh_nan
    m_ext = halo_exchange_t(
        halo_exchange_x(m, x_axis, e, True), t_axis, e, True
    )
    m_ext = _binary_morph(m_ext, _B3_OFFS, e, 1, "erode")
    mask = _crop(m_ext[e:-e], e) | wh_nan
    eroded = jnp.where(mask, -1, eroded)

    # 27-tap uphill Sobel (cubic) sharing one warp band per temporal plane
    from tobac_flow_tpu.ops.sobel import _W_T, _W_X, _W_Y

    offsets = [(ox, oy) for oy in (-1, 0, 1) for ox in (-1, 0, 1)]
    ext = halo_exchange_x(f, x_axis, hx, nan)
    fh = halo_exchange_t(ext, t_axis, 1, nan)
    fwd_e = halo_exchange_x(fwd, x_axis, hx, 0.0, axis=-2)
    bwd_e = halo_exchange_x(bwd, x_axis, hx, 0.0, axis=-2)
    prev_taps = _warp_taps(fh[:-2], bwd_e, offsets, hx, warp_radius, "cubic", nan)
    next_taps = _warp_taps(fh[2:], fwd_e, offsets, hx, warp_radius, "cubic", nan)
    # same-plane taps read the x halo: shift the extended field, then crop
    same_taps = jnp.stack(
        [
            _crop(_shift2d(ext, oy, ox, nan, nan), hx)
            for ox, oy in offsets
        ]
    )
    stacked = jnp.concatenate([prev_taps, same_taps, next_taps], axis=0)
    d = stacked - f[None]
    d = jnp.fmax(d, 0.0)
    d = jnp.where(jnp.isnan(d), 0.0, d)
    shape = (-1, 1, 1, 1)
    gt = jnp.sum(d * _W_T.reshape(shape), axis=0)
    gy = jnp.sum(d * _W_Y.reshape(shape), axis=0)
    gx_ = jnp.sum(d * _W_X.reshape(shape), axis=0)
    edges = jnp.sqrt(gt * gt + gy * gy + gx_ * gx_)
    edges = jnp.where(wh_nan, nan, edges)  # convolve's NaN forcing
    edges = edges + (edges > 0)
    edges = edges - f
    edges = jnp.where(wh_nan, jnp.inf, edges)
    return edges, eroded


def sharded_anvil_post(labels, markers, x_axis="x"):
    """detect_anvils' post-watershed pass on tiles (fused ``_anvil_post_jit``,
    reference ``detection.py:553-562``): clamp the -1 barrier to background,
    zero pixels the in-plane opening removes, and restore marker identity."""
    labels = jnp.maximum(labels, 0)
    keep = _opening_sharded(labels != 0, x_axis)
    labels = labels * keep.astype(labels.dtype)
    return jnp.where(markers > 0, markers, labels)
