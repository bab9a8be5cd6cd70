"""Banded-shift gather: TPU-fast warping for bounded displacements.

XLA's general gather lowers to a pathologically slow path on TPU (measured
~200-500x elementwise cost), and Mosaic/Pallas has no per-element gather.
But every flow-displaced access in this pipeline is bounded: flow vectors are
clipped to ±20 px (reference ``flow.py:60-61``).  A bounded gather can be
written as a sum over the 2R+1 possible integer shifts of

    out[p] = Σ_s  (disp(p) == s) · img[p + s]

— static dynamic-slices plus masked adds, which the VPU eats at near-memory
bandwidth.  2D warps run as two 1D passes (y then x); the x-pass evaluates
the y-displacement at the shifted column, an error bounded by
|∂dy/∂x| · |dx| ≪ 1 px for the smoothed flow fields this framework warps
with.  The exact-gather path (``ops/warp.py``) remains for parity testing.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp

__all__ = [
    "banded_gather_axis",
    "banded_warp_axis",
    "point_warp_fix",
    "warp_banded",
    "warp_banded_exact",
    "warp_banded_exact_multi",
    "warp_banded_multi",
]


def _axis_pad(img, axis, pad, fill, pad_mode="constant"):
    pads = [(0, 0)] * img.ndim
    pads[axis] = (pad, pad)
    if pad_mode == "edge":
        return jnp.pad(img, pads, mode="edge")
    return jnp.pad(img, pads, constant_values=fill)


def banded_gather_axis(img, idisp, axis, radius, fill_value=0.0, pad_mode="constant"):
    """Integer-displacement gather along one axis.

    out[p] = img[p + idisp(p) ê_axis], with idisp clipped to ±radius and
    out-of-range source positions reading ``fill_value`` (or the clamped edge
    sample with pad_mode="edge").
    """
    axis = axis % img.ndim
    radius = int(radius)
    idisp = jnp.clip(idisp, -radius, radius)
    padded = _axis_pad(img, axis, radius, fill_value, pad_mode)
    size = list(img.shape)

    def body(k, acc):
        # k in [0, 2R]: displacement s = k - R; slice start along axis = k
        starts = [0] * img.ndim
        starts[axis] = k
        shifted = jax.lax.dynamic_slice(padded, starts, size)
        return jnp.where(idisp == (k - radius), shifted, acc)

    init = jnp.full(img.shape, fill_value, dtype=img.dtype)
    # join with a (dead) slice of the input so the carry's sharding/varying
    # type matches inside shard_map (fori carries must type-match)
    probe = jax.lax.dynamic_slice(padded, [0] * img.ndim, list(img.shape))
    init = jnp.where(jnp.zeros((), bool), probe, init)
    return jax.lax.fori_loop(0, 2 * radius + 1, body, init)


def banded_warp_axis(img, disp, axis, radius, fill_value=jnp.nan, pad_mode="constant"):
    """Linear-interpolation warp along one axis for fractional displacement.

    out[p] = (1-f)·img[p + ⌊d⌋] + f·img[p + ⌊d⌋ + 1]; source positions
    outside ±radius (or off the padded edge) read ``fill_value`` (or clamp
    with pad_mode="edge"); zero-weight taps are masked so exact-integer
    displacements stay exact.
    """
    axis = axis % img.ndim
    radius = int(radius)
    disp = jnp.clip(disp, -float(radius), float(radius))
    lo = jnp.floor(disp)
    frac = (disp - lo).astype(img.dtype)
    ilo = lo.astype(jnp.int32)
    padded = _axis_pad(img, axis, radius + 1, fill_value, pad_mode)
    size = list(img.shape)

    def body(k, acc):
        s = k - radius  # displacement of the floor tap
        starts = [0] * img.ndim
        starts[axis] = k + 1  # account for the radius+1 padding
        tap0 = jax.lax.dynamic_slice(padded, starts, size)
        starts[axis] = k + 2
        tap1 = jax.lax.dynamic_slice(padded, starts, size)
        w0 = 1.0 - frac
        val = jnp.where(w0 == 0, 0.0, w0 * tap0) + jnp.where(
            frac == 0, 0.0, frac * tap1
        )
        return jnp.where(ilo == s, val, acc)

    init = jnp.full(img.shape, fill_value, dtype=img.dtype)
    probe = jax.lax.dynamic_slice(padded, [0] * img.ndim, list(img.shape))
    init = jnp.where(jnp.zeros((), bool), probe, init)
    return jax.lax.fori_loop(0, 2 * radius + 1, body, init)


def banded_warp_axis_cubic(
    img, disp, axis, radius, fill_value=jnp.nan, pad_mode="constant"
):
    """Cubic-convolution (cv2 INTER_CUBIC, A=-0.75) warp along one axis."""
    from tobac_flow_tpu.ops.warp import _cubic_weights

    axis = axis % img.ndim
    radius = int(radius)
    disp = jnp.clip(disp, -float(radius), float(radius))
    lo = jnp.floor(disp)
    frac = (disp - lo).astype(img.dtype)
    ilo = lo.astype(jnp.int32)
    weights = _cubic_weights(frac)  # taps at offsets -1, 0, 1, 2 from floor
    padded = _axis_pad(img, axis, radius + 2, fill_value, pad_mode)
    size = list(img.shape)

    def body(k, acc):
        s = k - radius  # floor displacement
        val = jnp.zeros_like(acc)
        for ti, wgt in enumerate(weights):
            starts = [0] * img.ndim
            starts[axis] = k + 1 + ti  # tap offset ti - 1 plus radius+2 pad
            tap = jax.lax.dynamic_slice(padded, starts, size)
            val = val + jnp.where(wgt == 0, 0.0, wgt * tap)
        return jnp.where(ilo == s, val, acc)

    init = jnp.full(img.shape, fill_value, dtype=img.dtype)
    probe = jax.lax.dynamic_slice(padded, [0] * img.ndim, list(img.shape))
    init = jnp.where(jnp.zeros((), bool), probe, init)
    return jax.lax.fori_loop(0, 2 * radius + 1, body, init)


def _row_shift(padded, shape, axis, start):
    starts = [0] * padded.ndim
    starts[axis] = start
    return jax.lax.dynamic_slice(padded, starts, list(shape))


def warp_banded_exact(
    img,
    flow,
    radius=20,
    method="linear",
    fill_value=jnp.nan,
    pad_mode="constant",
    radius_y=None,
    radius_x=None,
):
    """Exact 2D bounded-displacement warp as banded shifts — no gather.

    ``out[y, x] = interp(img)(y + dy(y, x), x + dx(y, x))`` with BOTH
    displacement components evaluated at the destination pixel, matching
    ``ops.warp.warp_plane`` (cv2.remap semantics) exactly for displacements
    within the band.  The two-pass separable form (``warp_banded``) instead
    evaluates dy at the x-shifted column — fine for smooth flow, wrong in
    rough flow (reference semantics: ``tobac_flow/convolve.py:8-86``).

    Factorisation: the y interpolation touches only the rows
    ``⌊dy⌋ + taps``, so

        out = Σ_s  w_y(s; dy) ⊙ Xwarp(rowshift(img, s), dx)

    where the inner x-warp's per-pixel weights come from dx at the
    *destination* row and are therefore shared by every y shift ``s`` — each
    output pixel receives exactly its 2 (linear) / 4 (cubic) y taps.  Cost is
    ``(2·ry + taps) · (2·rx + taps)`` masked static shifts; pass adaptive
    ``radius_y`` / ``radius_x`` (≥ max |displacement| + 1) to keep the band —
    and the cost — tight.
    """
    ry = int(radius if radius_y is None else radius_y)
    rx = int(radius if radius_x is None else radius_x)
    dy = flow[..., 1]
    dx = flow[..., 0]

    if method == "nearest":
        iry = jnp.clip(jnp.round(dy), -ry, ry).astype(jnp.int32)
        irx = jnp.round(dx).astype(jnp.int32)
        padded = _axis_pad(img, -2, ry, fill_value, pad_mode)

        def body(m, acc):
            strip = _row_shift(padded, img.shape, -2, m)  # rows shifted by m-ry
            x_line = banded_gather_axis(strip, irx, -1, rx, fill_value, pad_mode)
            return jnp.where(iry == (m - ry), x_line, acc)

        init = jnp.full(img.shape, fill_value, dtype=img.dtype)
        probe = _row_shift(padded, img.shape, -2, 0)
        init = jnp.where(jnp.zeros((), bool), probe, init)
        return jax.lax.fori_loop(0, 2 * ry + 1, body, init)

    if method == "linear":
        tap0 = 0  # y taps at offsets 0, 1 from floor
        n_taps = 2
        weight_fn = lambda f: [1.0 - f, f]
        x_warp = lambda strip: banded_warp_axis(strip, dx, -1, rx, fill_value, pad_mode)
    elif method == "cubic":
        from tobac_flow_tpu.ops.warp import _cubic_weights

        tap0 = -1  # y taps at offsets -1..2 from floor
        n_taps = 4
        weight_fn = _cubic_weights
        x_warp = lambda strip: banded_warp_axis_cubic(
            strip, dx, -1, rx, fill_value, pad_mode
        )
    else:
        raise ValueError("method must be 'nearest', 'linear' or 'cubic'")

    dy = jnp.clip(dy, -float(ry), float(ry))
    lo = jnp.floor(dy)
    frac = (dy - lo).astype(jnp.float32)
    ilo = lo.astype(jnp.int32)
    wys = weight_fn(frac)
    pad_y = ry + max(tap0 + n_taps - 1, 1)  # deepest forward tap
    padded = _axis_pad(img, -2, pad_y, fill_value, pad_mode)
    # shifts s range over [-ry + tap0, ry + tap0 + n_taps - 1]
    s_lo = -ry + tap0
    n_shift = 2 * ry + n_taps

    def body(m, acc):
        s = m + s_lo  # row shift of this strip
        strip = _row_shift(padded, img.shape, -2, m + (s_lo + pad_y))
        x_line = x_warp(strip)
        c = jnp.zeros(ilo.shape, jnp.float32)
        for j in range(n_taps):
            # tap j reads source row ilo + tap0 + j == s
            c = c + jnp.where(ilo == (s - tap0 - j), wys[j], 0.0)
        return acc + jnp.where(c == 0.0, 0.0, c * x_line)

    fdtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    init = jnp.zeros(img.shape, dtype=fdtype)
    probe = _row_shift(padded, img.shape, -2, 0).astype(fdtype)
    init = init + jnp.where(jnp.zeros((), bool), probe, init)
    return jax.lax.fori_loop(0, n_shift, body, init)


def warp_banded_exact_multi(
    img,
    flow,
    offsets,
    radius_y,
    radius_x,
    method="linear",
    fill_value=jnp.nan,
    pad_mode="constant",
    dyn_bounds=None,
):
    """Exact 2D banded warp of one frame at several integer tap offsets,
    sharing ALL band slice traffic across the offsets.

    Semantically identical to stacking ``warp_banded_exact(img, flow + off)``
    per offset (given ``radius_y >= max|dy|`` and likewise for x, so the band
    clips nothing): an integer structuring offset only shifts which band
    strip a pixel reads — floor(d + o) = floor(d) + o with the SAME
    fractional weights — so the O(band_y x band_x) strip loads are done once
    and each offset pays only masked FMAs.  This is the banded analogue of
    the gather path's shared union grid (``ops/warp.py:163-170``; reference
    behaviour ``tobac_flow/convolve.py:34-60``).

    ``dyn_bounds`` — optional traced int32 scalars ``(dy_lo, dy_hi, dx_lo,
    dx_hi)`` = (floor(min dy), ceil(max dy), floor(min dx), ceil(max dx))
    over the WHOLE dispatch (e.g. a time chunk).  The strip/tap sweeps then
    run only over the range those displacements can touch — a dynamic
    trip-count ``fori_loop`` with no recompilation — instead of the full
    static band.  They MUST be unbatched (computed outside any ``vmap``):
    batched loop counters would turn the strip ``dynamic_slice`` starts into
    gathers, the exact pathology this module exists to avoid.  Results are
    bit-identical to the full sweep: skipped strips contribute nothing.

    Returns (n_offsets, ...) stacked along a new leading axis.
    """
    ry = int(radius_y)
    rx = int(radius_x)
    offsets = [(int(ox), int(oy)) for ox, oy in offsets]
    distinct_ox = sorted({ox for ox, _ in offsets})
    max_ox = max((abs(o) for o in distinct_ox), default=0)
    max_oy = max((abs(oy) for _, oy in offsets), default=0)
    dy = flow[..., 1]
    dx = flow[..., 0]

    if method == "nearest":
        tap0_y = tap0_x = 0
        nty = ntx = 1
        wfn = None
    elif method == "linear":
        tap0_y = tap0_x = 0
        nty = ntx = 2
        wfn = lambda f: [1.0 - f, f]
    elif method == "cubic":
        from tobac_flow_tpu.ops.warp import _cubic_weights

        tap0_y = tap0_x = -1
        nty = ntx = 4
        wfn = _cubic_weights
    else:
        raise ValueError("method must be 'nearest', 'linear' or 'cubic'")

    # safety clip: callers size the band off max |flow|, so this never fires
    # in production; it keeps out-of-band displacements pinned to the band
    # edge (like warp_banded_exact) instead of silently dropping to zero
    dy = jnp.clip(dy, -float(ry), float(ry))
    dx = jnp.clip(dx, -float(rx), float(rx))

    ry_eff = ry + max_oy
    rx_eff = rx + max_ox
    pad_y = ry_eff + nty
    pad_x = rx_eff + ntx
    n_m = 2 * ry_eff + nty
    n_k = 2 * rx_eff + ntx
    my_lo = -ry_eff + tap0_y
    kx_lo = -rx_eff + tap0_x

    # dynamic sweep bounds: strips can only be touched by s = idisp + offset
    # (+ tap0 + j for interpolating taps), so the loop range shrinks to what
    # the dispatch's actual displacements reach
    if dyn_bounds is None:
        m_start, m_stop = 0, n_m
        k_start, k_stop = 0, n_k
    else:
        dy_lo, dy_hi, dx_lo, dx_hi = dyn_bounds
        oy_min = min(oy for _, oy in offsets)
        oy_max = max(oy for _, oy in offsets)
        ox_min = min(ox for ox, _ in offsets)
        ox_max = max(ox for ox, _ in offsets)
        m_start = jnp.clip(dy_lo + oy_min + tap0_y - my_lo, 0, n_m)
        m_stop = jnp.clip(dy_hi + oy_max + tap0_y + (nty - 1) - my_lo + 1, 0, n_m)
        k_start = jnp.clip(dx_lo + ox_min + tap0_x - kx_lo, 0, n_k)
        k_stop = jnp.clip(dx_hi + ox_max + tap0_x + (ntx - 1) - kx_lo + 1, 0, n_k)
    padded = _axis_pad(_axis_pad(img, -2, pad_y, fill_value, pad_mode),
                       -1, pad_x, fill_value, pad_mode)
    strip_shape = list(img.shape)
    strip_shape[-1] = img.shape[-1] + 2 * pad_x

    def _strip(m):
        starts = [0] * padded.ndim
        starts[-2] = m + (my_lo + pad_y)
        return jax.lax.dynamic_slice(padded, starts, strip_shape)

    def _tap(strip, k):
        starts = [0] * strip.ndim
        starts[-1] = k + (kx_lo + pad_x)
        return jax.lax.dynamic_slice(strip, starts, list(img.shape))

    if method == "nearest":
        ir_y = jnp.round(dy).astype(jnp.int32)
        ir_x = jnp.round(dx).astype(jnp.int32)

        def xpass(strip):
            def bx(k, accs):
                s = k + kx_lo
                tap = _tap(strip, k)
                return tuple(
                    jnp.where(ir_x == (s - ox), tap, acc)
                    for ox, acc in zip(distinct_ox, accs)
                )

            init = tuple(
                jnp.full(img.shape, fill_value, img.dtype)
                for _ in distinct_ox
            )
            probe = _tap(strip, 0)
            init = tuple(
                jnp.where(jnp.zeros((), bool), probe, a) for a in init
            )
            return jax.lax.fori_loop(k_start, k_stop, bx, init)

        def by(m, accs):
            s = m + my_lo
            xs = xpass(_strip(m))
            x_by_ox = dict(zip(distinct_ox, xs))
            return tuple(
                jnp.where(ir_y == (s - oy), x_by_ox[ox], acc)
                for (ox, oy), acc in zip(offsets, accs)
            )

        init = tuple(jnp.full(img.shape, fill_value, img.dtype) for _ in offsets)
        probe = _tap(_strip(0), 0)
        init = tuple(jnp.where(jnp.zeros((), bool), probe, a) for a in init)
        return jnp.stack(jax.lax.fori_loop(m_start, m_stop, by, init), axis=0)

    lo_y = jnp.floor(dy)
    frac_y = (dy - lo_y).astype(jnp.float32)
    ilo_y = lo_y.astype(jnp.int32)
    wys = wfn(frac_y)
    lo_x = jnp.floor(dx)
    frac_x = (dx - lo_x).astype(jnp.float32)
    ilo_x = lo_x.astype(jnp.int32)
    wxs = wfn(frac_x)
    fdtype = img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32

    def xpass(strip):
        def bx(k, accs):
            s = k + kx_lo
            tap = _tap(strip, k)
            out = []
            for ox, acc in zip(distinct_ox, accs):
                c = jnp.zeros(ilo_x.shape, jnp.float32)
                for j in range(ntx):
                    # tap j of floor+ox reads column ilo_x + ox + tap0 + j
                    c = c + jnp.where(
                        ilo_x == (s - ox - tap0_x - j), wxs[j], 0.0
                    )
                out.append(acc + jnp.where(c == 0.0, 0.0, c * tap))
            return tuple(out)

        init = tuple(jnp.zeros(img.shape, fdtype) for _ in distinct_ox)
        probe = _tap(strip, 0).astype(fdtype)
        init = tuple(
            a + jnp.where(jnp.zeros((), bool), probe, a) for a in init
        )
        return jax.lax.fori_loop(k_start, k_stop, bx, init)

    def by(m, accs):
        s = m + my_lo
        xs = xpass(_strip(m))
        x_by_ox = dict(zip(distinct_ox, xs))
        out = []
        for (ox, oy), acc in zip(offsets, accs):
            c = jnp.zeros(ilo_y.shape, jnp.float32)
            for j in range(nty):
                c = c + jnp.where(ilo_y == (s - oy - tap0_y - j), wys[j], 0.0)
            out.append(acc + jnp.where(c == 0.0, 0.0, c * x_by_ox[ox]))
        return tuple(out)

    init = tuple(jnp.zeros(img.shape, fdtype) for _ in offsets)
    probe = _tap(_strip(0), 0).astype(fdtype)
    init = tuple(a + jnp.where(jnp.zeros((), bool), probe, a) for a in init)
    return jnp.stack(jax.lax.fori_loop(m_start, m_stop, by, init), axis=0)


def point_warp_fix(planes, img, flow, offsets, pos, method, fill_value):
    """Exact sparse repair of a banded warp's out-of-band pixels.

    ``planes`` — (n_offsets, H, W) output of ``warp_banded_exact_multi`` (or
    the separable path) whose displacements were clipped to the core band;
    ``pos`` — (K,) raveled frame positions needing repair (-1 padded).  Each
    position is re-warped per-pixel — floor + the method's taps, constant
    ``fill_value`` outside the frame, zero-weight taps skipped — reproducing
    the banded kernel's accumulation order bit-exactly, then scattered back.
    K-point XLA gathers/scatters are cheap; the pathological TPU gather path
    is only the full-volume form (module docstring).
    """
    h, w = img.shape[-2:]
    valid = pos >= 0
    p = jnp.maximum(pos, 0)
    py = p // w
    px = p % w
    d = flow[py, px]
    dx = d[..., 0]
    dy = d[..., 1]

    if method == "nearest":
        tap0 = 0
        nt = 1
        wfn = None
        iy0 = jnp.round(dy).astype(jnp.int32)
        ix0 = jnp.round(dx).astype(jnp.int32)
    else:
        if method == "linear":
            tap0, nt = 0, 2
            wfn = lambda f: [1.0 - f, f]
        elif method == "cubic":
            from tobac_flow_tpu.ops.warp import _cubic_weights

            tap0, nt = -1, 4
            wfn = _cubic_weights
        else:
            raise ValueError("method must be 'nearest', 'linear' or 'cubic'")
        lo_y = jnp.floor(dy)
        lo_x = jnp.floor(dx)
        wys = wfn((dy - lo_y).astype(jnp.float32))
        wxs = wfn((dx - lo_x).astype(jnp.float32))
        iy0 = lo_y.astype(jnp.int32)
        ix0 = lo_x.astype(jnp.int32)

    fdtype = (
        img.dtype if jnp.issubdtype(img.dtype, jnp.floating) else jnp.float32
    )
    fill = jnp.asarray(fill_value).astype(img.dtype)

    def sample(ty, tx):
        inb = (ty >= 0) & (ty < h) & (tx >= 0) & (tx < w)
        v = img[jnp.clip(ty, 0, h - 1), jnp.clip(tx, 0, w - 1)]
        return jnp.where(inb, v, fill)

    fixed = []
    for ox, oy in offsets:
        if method == "nearest":
            val = sample(py + iy0 + int(oy), px + ix0 + int(ox))
        else:
            val = jnp.zeros(p.shape, fdtype)
            for i in range(nt):
                xsum = jnp.zeros(p.shape, fdtype)
                for j in range(nt):
                    tap = sample(
                        py + iy0 + int(oy) + tap0 + i,
                        px + ix0 + int(ox) + tap0 + j,
                    ).astype(fdtype)
                    xsum = xsum + jnp.where(wxs[j] == 0.0, 0.0, wxs[j] * tap)
                val = val + jnp.where(wys[i] == 0.0, 0.0, wys[i] * xsum)
        fixed.append(val.astype(planes.dtype))
    new = jnp.stack(fixed, axis=0)
    old = planes[:, py, px]
    return planes.at[:, py, px].set(jnp.where(valid, new, old))


def warp_banded(img, flow, radius=20, method="linear", fill_value=jnp.nan, pad_mode="constant"):
    """Two-pass banded 2D warp of (..., H, W) by flow (..., H, W, 2)
    (channel 0 = x displacement, 1 = y).

    nearest: both passes are integer gathers on rounded displacements.
    linear: both passes interpolate linearly (separable bilinear).
    """
    dy = flow[..., 1]
    dx = flow[..., 0]
    if method == "nearest":
        a = banded_gather_axis(
            img, jnp.round(dy).astype(jnp.int32), -2, radius, fill_value, pad_mode
        )
        return banded_gather_axis(
            a, jnp.round(dx).astype(jnp.int32), -1, radius, fill_value, pad_mode
        )
    if method == "linear":
        a = banded_warp_axis(img, dy, -2, radius, fill_value, pad_mode)
        return banded_warp_axis(a, dx, -1, radius, fill_value, pad_mode)
    if method == "cubic":
        a = banded_warp_axis_cubic(img, dy, -2, radius, fill_value, pad_mode)
        return banded_warp_axis_cubic(a, dx, -1, radius, fill_value, pad_mode)
    raise ValueError("method must be 'nearest', 'linear' or 'cubic'")


def warp_banded_multi(
    channels, flow, radius=20, method="linear", fill_value=jnp.nan, pad_mode="constant"
):
    """Warp a stack of same-shaped fields (C, ..., H, W) by one flow field —
    the displacement masks are shared so the per-band cost is amortised."""
    stacked = jnp.stack(channels, axis=0) if isinstance(channels, (list, tuple)) else channels
    # flow identical across the channel axis; warp the stack in one pass
    dy = flow[..., 1]
    dx = flow[..., 0]
    dy = jnp.broadcast_to(dy, stacked.shape)
    dx = jnp.broadcast_to(dx, stacked.shape)
    if method == "nearest":
        a = banded_gather_axis(
            stacked, jnp.round(dy).astype(jnp.int32), -2, radius, fill_value, pad_mode
        )
        return banded_gather_axis(
            a, jnp.round(dx).astype(jnp.int32), -1, radius, fill_value, pad_mode
        )
    if method == "cubic":
        a = banded_warp_axis_cubic(stacked, dy, -2, radius, fill_value, pad_mode)
        return banded_warp_axis_cubic(a, dx, -1, radius, fill_value, pad_mode)
    a = banded_warp_axis(stacked, dy, -2, radius, fill_value, pad_mode)
    return banded_warp_axis(a, dx, -1, radius, fill_value, pad_mode)
