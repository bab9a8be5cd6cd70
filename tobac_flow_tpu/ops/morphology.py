"""Binary and greyscale morphology as fused stencil min/max ops.

TPU-native equivalents of the scipy.ndimage morphology the reference's
detection layer leans on (``detection.py``: binary opening/erosion/
fill_holes, grey opening, gaussian smoothing, peak masks).  Everything is
static shifts + elementwise logic, so XLA fuses whole filter chains.
Semantics follow scipy (oracle-tested): structure anchored at its centre,
``border_value`` controls out-of-frame behaviour, ``iterations`` repeats the
base operation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "binary_erosion",
    "binary_dilation",
    "binary_opening",
    "binary_closing",
    "binary_fill_holes",
    "grey_erosion",
    "grey_dilation",
    "grey_opening",
    "gaussian_filter",
    "nan_gaussian_filter",
    "maximum_filter",
    "minimum_filter",
    "peak_local_max_mask",
    "distance_transform_edt",
]


def _structure_offsets(structure, ndim):
    structure = np.asarray(structure)
    if structure.ndim != ndim:
        raise ValueError(f"structure must have {ndim} dimensions")
    centre = tuple(s // 2 for s in structure.shape)
    offs = [
        tuple(int(i) - c for i, c in zip(idx, centre))
        for idx in zip(*np.nonzero(structure))
    ]
    return tuple(offs)


def _shift_nd(arr, offsets, fill):
    """arr[..., x + o ...] for an offset tuple, constant fill."""
    pads = [(abs(o), abs(o)) for o in offsets]
    starts = [abs(o) + o for o in offsets]
    padded = jnp.pad(arr, pads, constant_values=fill)
    return jax.lax.dynamic_slice(padded, starts, arr.shape)


@functools.partial(jax.jit, static_argnames=("offsets", "iterations", "border_value", "mode"))
def _binary_morph(mask, offsets, iterations, border_value, mode):
    def one(m):
        if mode == "erode":
            out = jnp.ones_like(m)
            for off in offsets:
                out = out & _shift_nd(m, off, bool(border_value))
        else:
            out = jnp.zeros_like(m)
            for off in offsets:
                # dilation reaches p from p - o for each structure offset o
                out = out | _shift_nd(m, tuple(-o for o in off), bool(border_value))
        return out

    for _ in range(iterations):
        mask = one(mask)
    return mask


def _prep(mask, structure, default_conn):
    mask = jnp.asarray(np.asarray(getattr(mask, "values", mask)) != 0)
    if structure is None:
        grid = np.abs(np.indices((3,) * mask.ndim) - 1).sum(axis=0)
        structure = grid <= default_conn
    offs = _structure_offsets(structure, mask.ndim)
    return mask, offs


def binary_erosion(mask, structure=None, iterations=1, border_value=0):
    mask, offs = _prep(mask, structure, 1)
    return _binary_morph(mask, offs, int(iterations), int(bool(border_value)), "erode")


def binary_dilation(mask, structure=None, iterations=1, border_value=0):
    mask, offs = _prep(mask, structure, 1)
    return _binary_morph(mask, offs, int(iterations), int(bool(border_value)), "dilate")


def binary_opening(mask, structure=None, iterations=1):
    mask, offs = _prep(mask, structure, 1)
    out = _binary_morph(mask, offs, int(iterations), 0, "erode")
    return _binary_morph(out, offs, int(iterations), 0, "dilate")


def binary_closing(mask, structure=None, iterations=1):
    mask, offs = _prep(mask, structure, 1)
    out = _binary_morph(mask, offs, int(iterations), 0, "dilate")
    return _binary_morph(out, offs, int(iterations), 0, "erode")


def _flood(inv, seed, offsets, max_iters):
    """Grow ``seed`` through ``inv`` along structure moves to a fixed point."""

    def cond(c):
        reach, changed, it = c
        return changed & (it < max_iters)

    def body(c):
        reach, _, it = c
        grown = reach
        for off in offsets:
            grown = grown | _shift_nd(reach, tuple(-o for o in off), False)
        grown = grown & inv
        return grown, jnp.any(grown != reach), it + 1

    reach, _, _ = jax.lax.while_loop(
        cond, body, (seed, jnp.bool_(True), jnp.int32(0))
    )
    return reach


def _has_unit_plane_moves(offsets, nd):
    """True when the structure can take single steps along BOTH in-plane
    axes — the condition under which two face-adjacent fully-open coarse
    blocks (and any two pixels inside one) are fine-connected."""
    need = set()
    for axis in (nd - 2, nd - 1):
        for s in (1, -1):
            off = [0] * nd
            off[axis] = s
            need.add(tuple(off))
    have = {tuple(o) for o in offsets}
    return need <= have


@functools.partial(jax.jit, static_argnames=("offsets", "max_iters"))
def _fill_holes_device(mask, offsets, max_iters):
    # flood the complement from a padded outside shell (scipy's construction):
    # the shell touches the interior only through actual structure moves, so
    # axes the structure cannot traverse stay disconnected
    padded = jnp.pad(mask, 1, constant_values=False)
    inv = ~padded
    shell = jnp.ones_like(padded)
    shell = shell.at[(slice(1, -1),) * mask.ndim].set(False)
    seed = shell & inv

    # Multigrid seeding: the plain border flood advances one pixel per
    # sweep (~max(h, w)/2 sequential whole-volume steps).  A coarse flood
    # over f x f min-pooled openness UNDER-approximates reachability — a
    # coarse path of fully-open blocks is always realisable on the fine
    # grid when the structure has unit in-plane moves — so its upsampled
    # reach is a set of provably-reachable extra seeds, and the fine flood
    # only has to cover the thin boundary remainder.  The fixed point (and
    # therefore the result) is unchanged: flooding from border ∪ (reachable
    # subset) converges to the same reachable set.
    nd = mask.ndim
    f = 4
    h, w = mask.shape[-2], mask.shape[-1]
    if h >= 4 * f and w >= 4 * f and _has_unit_plane_moves(offsets, nd):
        hc, wc = h // f, w // f
        crop = mask[..., : hc * f, : wc * f]
        open_blocks = ~crop
        shp = crop.shape[:-2] + (hc, f, wc, f)
        co = open_blocks.reshape(shp).all(axis=-1).all(axis=-2)
        co_p = jnp.pad(co, 1, constant_values=False)
        c_inv = co_p
        c_shell = jnp.ones_like(co_p)
        c_shell = c_shell.at[(slice(1, -1),) * nd].set(False)
        c_iters = int(sum(co.shape)) + 8
        c_reach = _flood(c_inv, c_shell & c_inv, offsets, c_iters)
        c_reach = c_reach[(slice(1, -1),) * nd]
        up = jnp.repeat(jnp.repeat(c_reach, f, axis=-2), f, axis=-1)
        pads = [(0, 0)] * nd
        pads[-2] = (0, h - hc * f)
        pads[-1] = (0, w - wc * f)
        up = jnp.pad(up, pads, constant_values=False)
        seed = seed | (jnp.pad(up, 1, constant_values=False) & inv)

    reach = _flood(inv, seed, offsets, max_iters)
    filled = padded | (inv & ~reach)
    return filled[(slice(1, -1),) * mask.ndim]


def binary_fill_holes(mask, structure=None):
    """Fill holes not connected to the array border (scipy semantics)."""
    mask, offs = _prep(mask, structure, 1)
    max_iters = int(sum(mask.shape)) + 8
    return _fill_holes_device(mask, offs, max_iters)


@functools.partial(jax.jit, static_argnames=("offsets", "mode"))
def _grey_morph(data, offsets, mode):
    fill = jnp.inf if mode == "min" else -jnp.inf
    out = data
    for off in offsets:
        o = off if mode == "min" else tuple(-x for x in off)
        shifted = _shift_nd(data, o, fill)
        out = jnp.minimum(out, shifted) if mode == "min" else jnp.maximum(out, shifted)
    return out


def _footprint_offsets(data_ndim, size=None, footprint=None, default_conn=None):
    if footprint is not None:
        return _structure_offsets(np.asarray(footprint) != 0, data_ndim)
    if size is not None:
        if np.isscalar(size):
            size = (int(size),) * data_ndim
        return _structure_offsets(np.ones(size, dtype=bool), data_ndim)
    grid = np.abs(np.indices((3,) * data_ndim) - 1).sum(axis=0)
    return _structure_offsets(grid <= (default_conn or 1), data_ndim)


def grey_erosion(data, size=None, footprint=None):
    data = jnp.asarray(data, dtype=jnp.float32)
    offs = _footprint_offsets(data.ndim, size, footprint)
    return _grey_morph(data, offs, "min")


def grey_dilation(data, size=None, footprint=None):
    data = jnp.asarray(data, dtype=jnp.float32)
    offs = _footprint_offsets(data.ndim, size, footprint)
    return _grey_morph(data, offs, "max")


def grey_opening(data, size=None, footprint=None):
    data = jnp.asarray(data, dtype=jnp.float32)
    offs = _footprint_offsets(data.ndim, size, footprint)
    return _grey_morph(_grey_morph(data, offs, "min"), offs, "max")


def maximum_filter(data, size):
    return grey_dilation(data, size=size)


def minimum_filter(data, size):
    return grey_erosion(data, size=size)


def _gauss_kernel(sigma, truncate=4.0):
    r = int(truncate * float(sigma) + 0.5)
    if r < 1:
        return None
    u = np.arange(-r, r + 1)
    k = np.exp(-(u**2) / (2.0 * sigma**2))
    return k / k.sum()


@functools.partial(jax.jit, static_argnames=("kernels",))
def _sepconv_reflect(data, kernels):
    for ax, kern in kernels:
        if kern is None:
            continue
        k = np.asarray(kern)
        r = len(k) // 2
        pad = [(0, 0)] * data.ndim
        pad[ax] = (r, r)
        # scipy.ndimage 'reflect' duplicates the edge sample = numpy 'symmetric'
        padded = jnp.pad(data, pad, mode="symmetric")
        out = None
        for i in range(len(k)):
            sl = [slice(None)] * data.ndim
            sl[ax] = slice(i, i + data.shape[ax])
            term = float(k[i]) * padded[tuple(sl)]
            out = term if out is None else out + term
        data = out
    return data


def gaussian_filter(data, sigma, truncate=4.0):
    """Separable Gaussian with scipy's reflect borders and kernel radius."""
    data = jnp.asarray(data, dtype=jnp.float32)
    if np.isscalar(sigma):
        sigma = (sigma,) * data.ndim
    kernels = tuple(
        (ax, None if s <= 0 else tuple(_gauss_kernel(s, truncate)))
        for ax, s in enumerate(sigma)
    )
    kernels = tuple(
        (ax, k if k is None else tuple(float(x) for x in k)) for ax, k in kernels
    )
    return _sepconv_reflect(data, kernels)


def nan_gaussian_filter(a, sigma, propagate_nan=True, truncate=4.0):
    """Normalised-convolution Gaussian that ignores NaNs
    (reference ``detection.py:128-146``)."""
    a = jnp.asarray(a, dtype=jnp.float32)
    nan = jnp.isnan(a)
    a0 = jnp.where(nan, 0.0, a)
    c = jnp.where(nan, 0.0, 1.0)
    ag = gaussian_filter(a0, sigma, truncate)
    cg = gaussian_filter(c, sigma, truncate)
    res = ag / jnp.where(cg == 0, jnp.nan, cg)
    if propagate_nan:
        res = jnp.where(nan, jnp.nan, res)
    return res


def peak_local_max_mask(frame, min_distance=10, threshold_abs=0.0):
    """Dense local-maxima mask for a 2D frame: pixels equal to the local
    maximum over a (2d+1)² window, above threshold, excluding the border ring
    (skimage peak_local_max's filter stage; plateaus keep all their pixels,
    which is equivalent downstream where peaks are dilated into regions)."""
    frame = jnp.asarray(frame, dtype=jnp.float32)
    size = 2 * int(min_distance) + 1
    mx = grey_dilation(frame, size=(size, size))
    peaks = (frame >= mx) & (frame > threshold_abs)
    d = int(min_distance)
    if d > 0:
        border = jnp.zeros_like(peaks)
        border = border.at[d:-d, d:-d].set(peaks[d:-d, d:-d])
        peaks = border
    return peaks


def distance_transform_edt(mask, sampling=None):
    """Exact Euclidean distance to the nearest zero pixel.

    Two-stage separable transform: closest-zero scan along the last axis,
    then a lower-envelope pass along each remaining axis computed by a
    vectorised O(n²) minimisation (fine for the frame sizes this is used on:
    peak radii and per-object subsegmentation).  ``sampling`` matches scipy's
    per-axis spacing, e.g. (1e9, 1, 1) for per-frame 2D distances.
    """
    mask = np.asarray(getattr(mask, "values", mask)) != 0
    if sampling is None:
        sampling = (1.0,) * mask.ndim
    sampling = tuple(float(s) for s in sampling)

    big = np.float64(1e30)
    # stage 1: 1D distance along the last axis (two scans)
    n = mask.shape[-1]
    s = sampling[-1]
    d = np.where(mask, big, 0.0)
    fwd = np.empty_like(d)
    run = np.full(mask.shape[:-1], big)
    for i in range(n):
        run = np.where(mask[..., i], np.minimum(run + s, big), 0.0)
        fwd[..., i] = run
    run = np.full(mask.shape[:-1], big)
    for i in range(n - 1, -1, -1):
        run = np.where(mask[..., i], np.minimum(run + s, big), 0.0)
        fwd[..., i] = np.minimum(fwd[..., i], run)
    d2 = np.minimum(fwd**2, big)

    # stage 2: per remaining axis, D²(i) = min_j (d²(j) + (s*(i-j))²)
    for ax in range(mask.ndim - 2, -1, -1):
        s = sampling[ax]
        if s >= 1e8:  # effectively disconnected axis (reference usage)
            continue
        moved = np.moveaxis(d2, ax, -1)
        m = moved.shape[-1]
        i = np.arange(m)
        dist2 = (s * (i[:, None] - i[None, :])) ** 2  # (m, m)
        moved = np.min(moved[..., None, :] + dist2, axis=-1)
        d2 = np.moveaxis(moved, -1, ax)
    return np.sqrt(np.minimum(d2, big))
