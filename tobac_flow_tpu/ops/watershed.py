"""Flow-aware watershed segmentation, TPU-native.

Reference behaviour: ``tobac_flow/watershed.py`` + ``tobac_flow/_watershed.pyx``
— a serial priority-flood (min-heap over (value, age)) where the temporal
neighbour offsets are displaced by the per-pixel rounded flow vectors.

The serial heap is inherently sequential, so the TPU implementation solves the
equivalent *minimax-path* formulation with data-parallel Jacobi sweeps:

  claim(p)  = min over neighbours q of cost(q),  cost(q) = max(field(q), claim(q))
  label(p)  = label of the lexicographic argmin (claim, hops, label)

where ``hops`` counts propagation steps and approximates the heap's age-based
tie-breaking on plateaus.  Each sweep uses

  * static shifts for the in-plane taps (no gathers at all), and
  * banded-shift gathers (``ops/banded.py``) for the flow-displaced temporal
    taps — flow is clipped to ±20 px so the 2R+1 masked shifts replace XLA's
    pathologically slow general gather.

Sweeps run in fixed-size device chunks with host-side convergence checks
(one long while_loop trips the remote worker's watchdog at GOES scale).

Temporal adjacency matches the serial kernel exactly: claims are *scattered*
along the source pixel's flow vector (``_banded_scatter_min`` — each source
pushes its cost to the displaced destination, the reference's neighbourhood
``_watershed.pyx``), not pulled at the destination.  Equivalence is tested
against the native C++ heap oracle (``tobac_flow_tpu/native``).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from tobac_flow_tpu.ops.banded import banded_gather_axis
from tobac_flow_tpu.utils.device_cache import device_put_cached
from tobac_flow_tpu.utils.program_cache import persistent_jit

__all__ = ["watershed"]

_INF = np.float32(np.inf)

# per-width probe cache: padded-width bucket -> True/False (the kernel's
# VMEM working set scales with frame width, so usability is width-dependent)
_PALLAS_SPATIAL: dict = {}


def _pallas_spatial_usable(h=256, w=256):
    """Probe whether the time-tiled Pallas sweep kernel compiles on the
    current backend AT THIS FRAME WIDTH (the remote Mosaic compiler rejects
    some programs and the VMEM scratch scales with width; CPU runs use the
    XLA formulation which the kernel is bit-equivalent to).  One probe
    compile per distinct padded width per process."""
    key = -(-int(w) // 128) * 128
    if key in _PALLAS_SPATIAL:
        return _PALLAS_SPATIAL[key]
    try:
        platform = jax.devices()[0].platform.lower()
    except Exception:
        platform = "cpu"
    if platform in ("cpu", "gpu"):
        _PALLAS_SPATIAL[key] = False
        return False
    # the probe compile itself costs seconds on the remote rig — memoise the
    # verdict on disk next to the persistent program cache
    from tobac_flow_tpu.utils.program_cache import (
        package_source_digest,
        program_cache_dir,
    )

    memo = (
        program_cache_dir()
        / f"pallas_probe_{platform}_{key}_{package_source_digest()}.ok"
    )
    try:
        if memo.exists():
            _PALLAS_SPATIAL[key] = memo.read_text().strip() == "1"
            return _PALLAS_SPATIAL[key]
    except OSError:
        pass
    try:
        from tobac_flow_tpu.ops.ws_pallas import spatial_sweeps_pallas

        hp = int(min(max(h, 8), 256))
        z = jnp.zeros((1, hp, int(w)), jnp.float32)
        m = jnp.full((1, hp, int(w)), np.iinfo(np.int32).max, jnp.int32)
        b = jnp.zeros((1, hp, int(w)), bool)
        out = spatial_sweeps_pallas(
            z, z, m, z, b, b, ((0, 1), (0, -1), (1, 0), (-1, 0)), k_sweeps=8
        )
        jax.block_until_ready(out)
        _PALLAS_SPATIAL[key] = True
    except Exception:
        _PALLAS_SPATIAL[key] = False
    try:
        memo.parent.mkdir(parents=True, exist_ok=True)
        memo.write_text("1" if _PALLAS_SPATIAL[key] else "0")
    except OSError:
        pass
    return _PALLAS_SPATIAL[key]


def connectivity_structure(connectivity):
    """Build the (3,3,3) boolean neighbourhood from an int connectivity or
    pass an explicit structuring array through."""
    if isinstance(connectivity, np.ndarray) or hasattr(connectivity, "shape"):
        s = np.asarray(connectivity).astype(bool)
        if s.shape != (3, 3, 3):
            raise ValueError("connectivity structure must have shape (3,3,3)")
        return s
    c = int(connectivity)
    grid = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0)
    return grid <= c


def _structure_taps_3d(structure):
    """(dt, dy, dx) neighbour offsets, excluding the centre."""
    taps = [
        (int(t) - 1, int(r) - 1, int(c) - 1)
        for t, r, c in zip(*np.nonzero(structure))
        if not (t == 1 and r == 1 and c == 1)
    ]
    return tuple(taps)


def _shift_t(arr, dt, fill):
    """arr[t + dt] with constant fill at the sequence ends."""
    t = arr.shape[0]
    fill_frame = jnp.full((1,) + arr.shape[1:], fill, dtype=arr.dtype)
    if dt == 1:
        return jnp.concatenate([arr[1:], fill_frame], axis=0)
    return jnp.concatenate([fill_frame, arr[:-1]], axis=0)


def _banded_pull(arrs, fills, disp_y, disp_x, radius):
    """2D banded gather of several same-shaped arrays by one displacement."""
    outs = []
    for a, fill in zip(arrs, fills):
        g = banded_gather_axis(a, disp_y, -2, radius, fill)
        outs.append(banded_gather_axis(g, disp_x, -1, radius, fill))
    return outs


def _scatter_axis(arrs, fills, s, axis, radius):
    """out[p + s ê_axis] = in[p] for a traced integer s in [-radius, radius]:
    one padded dynamic-slice per array (out[p] = in[p - s])."""
    outs = []
    for a, fill in zip(arrs, fills):
        pads = [(0, 0)] * a.ndim
        pads[axis % a.ndim] = (radius, radius)
        padded = jnp.pad(a, pads, constant_values=fill)
        starts = [0] * a.ndim
        starts[axis % a.ndim] = radius - s
        outs.append(jax.lax.dynamic_slice(padded, starts, list(a.shape)))
    return outs


def _lex_better(c1a, c2a, ma, c1b, c2b, mb):
    """Lexicographic (claim, second-claim, meta) comparison: a < b."""
    return (
        (c1a < c1b)
        | ((c1a == c1b) & (c2a < c2b))
        | ((c1a == c1b) & (c2a == c2b) & (ma < mb))
    )


def _banded_scatter_min(cost_s, cost2_s, meta_s, disp_y, disp_x, radius, meta_max):
    """Banded scatter-min: each source pixel p pushes (cost, cost2, meta) to
    p + (disp_y(p), disp_x(p)); colliding pushes keep the lexicographic
    minimum.  Two 1D passes — the y-pass transports each winner's
    x-displacement so the x-pass lands it exactly (unlike the gather, whose
    second pass must evaluate the displacement at the shifted position).
    This is the *push* adjacency of the reference heap
    (``_watershed.pyx:308-313``: neighbours at structure + index +
    flow-at-source), which a destination-side pull cannot represent when the
    forward and backward flows are not exact inverses."""
    dy = jnp.clip(disp_y, -radius, radius)
    dx = jnp.clip(disp_x, -radius, radius)
    big = jnp.asarray(_INF, cost_s.dtype)

    def pass_y(k, acc):
        acc_c, acc_c2, acc_m, acc_dx = acc
        s = k - radius
        m = dy == s
        cand = (
            jnp.where(m, cost_s, big),
            jnp.where(m, cost2_s, big),
            jnp.where(m, meta_s, meta_max),
            jnp.where(m, dx, 0),
        )
        cc, cc2, cm, cdx = _scatter_axis(
            cand, (big, big, meta_max, 0), s, -2, radius
        )
        better = _lex_better(cc, cc2, cm, acc_c, acc_c2, acc_m)
        return (
            jnp.where(better, cc, acc_c),
            jnp.where(better, cc2, acc_c2),
            jnp.where(better, cm, acc_m),
            jnp.where(better, cdx, acc_dx),
        )

    init = (
        jnp.full(cost_s.shape, _INF, cost_s.dtype),
        jnp.full(cost_s.shape, _INF, cost_s.dtype),
        jnp.full(meta_s.shape, meta_max, meta_s.dtype),
        jnp.zeros(dx.shape, dx.dtype),
    )
    acc_c, acc_c2, acc_m, acc_dx = jax.lax.fori_loop(
        0, 2 * radius + 1, pass_y, init
    )

    def pass_x(k, acc):
        out_c, out_c2, out_m = acc
        s = k - radius
        m = acc_dx == s
        cand = (
            jnp.where(m, acc_c, big),
            jnp.where(m, acc_c2, big),
            jnp.where(m, acc_m, meta_max),
        )
        cc, cc2, cm = _scatter_axis(cand, (big, big, meta_max), s, -1, radius)
        better = _lex_better(cc, cc2, cm, out_c, out_c2, out_m)
        return (
            jnp.where(better, cc, out_c),
            jnp.where(better, cc2, out_c2),
            jnp.where(better, cm, out_m),
        )

    out0 = (init[0], init[1], init[2])
    return jax.lax.fori_loop(0, 2 * radius + 1, pass_x, out0)


@persistent_jit(
    static_argnames=(
        "taps", "radius", "n_iters", "spatial_per_temporal", "grace",
        "use_pallas",
    ),
    # the packed state is rewritten every chunk: donating it lets XLA reuse
    # the ~1.4 GB of buffers instead of holding input + output copies
    donate_argnums=(5,),
)
def _watershed_sweeps(
    field, markers, mask, fwd_int, bwd_int, state, taps, radius, n_iters,
    spatial_per_temporal=8, grace=2, use_pallas=False,
):
    """Run up to n_iters sweep rounds; returns (state, rounds_used).

    State is (claim: f32, claim2: f32, meta: int32) with
    meta = min(hops, 255) << 23 | (label + 2).  ``claim`` is the minimax
    path cost; ``claim2`` is the second-largest value along the optimal
    path — the serial heap's pop clock orders fronts by their descending
    path-value profile, so ties in the minimax cost (plateaus behind equal
    barriers) resolve by the second barrier before falling back to the hop
    count (the heap's push-age analogue).  Labels must lie in
    [-1, 2^23 - 3] (detection labels are far below; asserted by the wrapper).
    """
    t, h, w = field.shape
    seeded = markers != 0
    floodable = mask & ~seeded
    meta_max = jnp.int32(np.iinfo(np.int32).max)
    ninf = jnp.float32(-jnp.inf)

    in_plane = tuple((dy, dx) for dt, dy, dx in taps if dt == 0)
    temporal = tuple((dt, dy, dx) for dt, dy, dx in taps if dt != 0)

    hops_step = jnp.int32(1 << 23)
    hops_cap = jnp.int32(255 << 23)

    def shift2(arrs, dy, dx, fills):
        outs = []
        for a, fill in zip(arrs, fills):
            padded = jnp.pad(
                a,
                ((0, 0), (abs(dy), abs(dy)), (abs(dx), abs(dx))),
                constant_values=fill,
            )
            outs.append(
                jax.lax.dynamic_slice(
                    padded, (0, abs(dy) + dy, abs(dx) + dx), (t, h, w)
                )
            )
        return outs

    def consider(best, cq, c2q, mq):
        bc, bc2, bm = best
        # bump the hop count of the incoming candidate (saturating at 255 —
        # an unconditional add would overflow the int32 at the cap)
        cand_m = mq + jnp.where(mq < hops_cap, hops_step, 0)
        valid = mq != meta_max  # unlabeled/out-of-frame sources never compete
        better = _lex_better(cq, c2q, cand_m, bc, bc2, bm) & valid
        return (
            jnp.where(better, cq, bc),
            jnp.where(better, c2q, bc2),
            jnp.where(better, cand_m, bm),
        )

    def sweep(state, include_temporal):
        claim, claim2, meta = state
        # extend the stored path pair through the pixel's own field value:
        # (max, 2nd-max) of the path INCLUDING this pixel
        cost = jnp.where(seeded, field, jnp.maximum(field, claim))
        cost2 = jnp.where(
            seeded,
            ninf,
            jnp.where(field >= claim, claim, jnp.maximum(claim2, field)),
        )
        best = (claim, claim2, meta)
        for dy, dx in in_plane:
            cq, c2q, mq = shift2(
                (cost, cost2, meta), dy, dx, (_INF, _INF, meta_max)
            )
            best = consider(best, cq, c2q, mq)
        if include_temporal:
            # the heap's temporal graph is directed by SOURCE-side flow:
            # p@t pushes to p + (dy,dx) + fwd(p) @ t+1 and to
            # p + (dy,dx) + bwd(p) @ t-1 (_watershed.pyx:308-313).  A tap
            # (dt, dy, dx) therefore receives, at the current frame, pushes
            # from frame t-dt displaced by that frame's own flow — an exact
            # banded scatter (destination-side pulls are a different graph
            # wherever fwd and bwd are not mutual inverses, e.g. growing
            # anvil edges).
            for dt, dy, dx in temporal:
                src_flow = fwd_int if dt == 1 else bwd_int
                cs = _shift_t(cost, -dt, _INF)
                c2s = _shift_t(cost2, -dt, _INF)
                ms = _shift_t(meta, -dt, meta_max)
                fs = _shift_t(src_flow, -dt, 0)
                # measured dead end: a Pallas VMEM form of this scatter
                # (tools git history, ws_pallas banded_scatter_min_pallas)
                # lost to this XLA formulation both ways it was built —
                # unrolled band passes blow scoped VMEM past 16M unless the
                # row blocks shrink to DMA-latency-bound sizes (11.2s vs
                # 6.9s), and fori_loop+roll rotation passes are slower still
                # (3.7s vs 2.3s) with diverging roll semantics between the
                # Mosaic backend and the interpreter
                cq, c2q, mq = _banded_scatter_min(
                    cs, c2s, ms, fs[..., 1] + dy, fs[..., 0] + dx, radius,
                    meta_max,
                )
                best = consider(best, cq, c2q, mq)
        return (
            jnp.where(floodable, best[0], claim),
            jnp.where(floodable, best[1], claim2),
            jnp.where(floodable, best[2], meta),
        )

    label_mask = jnp.int32((1 << 23) - 1)

    def cond(carry):
        _, quiet, it = carry
        # stop after `grace` consecutive rounds without label changes (claims
        # keep relaxing long after the assignment stabilises; label-only
        # convergence with a grace window avoids paying for that tail)
        return jnp.logical_and(quiet < grace, it < n_iters)

    if use_pallas:
        from tobac_flow_tpu.ops.ws_pallas import spatial_sweeps_pallas

        in_plane_taps = in_plane

        def run_spatial(new):
            # time-tiled VMEM kernel: exact equivalent of
            # spatial_per_temporal Jacobi sweeps, one HBM pass
            return spatial_sweeps_pallas(
                new[0], new[1], new[2], field, seeded, floodable,
                tuple((dy, dx) for dy, dx in in_plane_taps),
                k_sweeps=spatial_per_temporal,
            )
    else:

        def run_spatial(new):
            for _ in range(spatial_per_temporal):
                new = sweep(new, False)
            return new

    def body(carry):
        state, quiet, it = carry
        new = sweep(state, True)
        new = run_spatial(new)
        labels_changed = jnp.any(
            (new[2] & label_mask) != (state[2] & label_mask)
        )
        quiet = jnp.where(labels_changed, 0, quiet + 1)
        return new, quiet, it + 1

    state, _, used = jax.lax.while_loop(
        cond, body, (state, jnp.int32(0), jnp.int32(0))
    )
    return state, used


def _coarsen(a, f, reduce="max"):
    """Factor-f pooling of the spatial axes of a (T, H, W) array."""
    t, h, w = a.shape
    hc, wc = h // f, w // f
    v = a[:, : hc * f, : wc * f].reshape(t, hc, f, wc, f)
    if reduce == "max":
        return v.max(axis=(2, 4))
    if reduce == "min":
        return v.min(axis=(2, 4))
    return v.mean(axis=(2, 4))


def _upsample_nearest(a, f, h, w):
    up = jnp.repeat(jnp.repeat(a, f, axis=1), f, axis=2)
    pad_h = h - up.shape[1]
    pad_w = w - up.shape[2]
    if pad_h or pad_w:
        up = jnp.pad(up, ((0, 0), (0, pad_h), (0, pad_w)), mode="edge")
    return up


_META_MAX = np.int32(np.iinfo(np.int32).max)


@persistent_jit
def _ws_prep_jit(field_j, markers_j, mask_j, fwd_f, bwd_f):
    """Watershed preprocessing as one program: inf-fill NaN barriers,
    round/clip flows to int8 bands, seed the packed state, and compute the
    band-radius exceedance curve (99th-percentile displacement stats)."""
    field_j = jnp.where(jnp.isnan(field_j), jnp.inf, field_j)
    fwd_int = jnp.clip(jnp.round(fwd_f), -127, 127).astype(jnp.int8)
    bwd_int = jnp.clip(jnp.round(bwd_f), -127, 127).astype(jnp.int8)
    mag = jnp.maximum(jnp.abs(fwd_int), jnp.abs(bwd_int))
    mag = jnp.where(mask_j[..., None], mag, 0)
    total = jnp.maximum(mask_j.sum() * 2, 1)
    exceed = jnp.stack([(mag > k).sum() for k in range(21)])
    small_enough = exceed <= jnp.maximum(total // 100, 1)  # ≥99% in band
    seeded = markers_j != 0
    # packed meta = hops << 23 | (label + 2); unlabeled = INT32_MAX sentinel
    meta0 = jnp.where(seeded, markers_j + 2, _META_MAX).astype(jnp.int32)
    claim0 = jnp.where(seeded, -jnp.inf, jnp.inf).astype(jnp.float32)
    return field_j, fwd_int, bwd_int, (claim0, claim0, meta0), small_enough


@persistent_jit(static_argnames=("factor",))
def _ws_coarse_prep_jit(field_j, markers_j, mask_j, fwd_int, bwd_int, factor):
    """Coarse-grid (max-pooled) V-cycle inputs as one program."""
    cf = _coarsen(field_j, factor, "max")
    cmask = _coarsen(mask_j.astype(jnp.int32), factor, "max").astype(bool)
    cmark = _coarsen(markers_j, factor, "max")
    neg = _coarsen(markers_j, factor, "min")
    cmark = jnp.where((cmark == 0) & (neg < 0), neg, cmark)
    cfwd = (_coarsen(fwd_int[..., 0], factor, "mean") / factor).astype(jnp.int32)
    cfwy = (_coarsen(fwd_int[..., 1], factor, "mean") / factor).astype(jnp.int32)
    cbwx = (_coarsen(bwd_int[..., 0], factor, "mean") / factor).astype(jnp.int32)
    cbwy = (_coarsen(bwd_int[..., 1], factor, "mean") / factor).astype(jnp.int32)
    cfwd_i = jnp.stack([cfwd, cfwy], axis=-1)
    cbwd_i = jnp.stack([cbwx, cbwy], axis=-1)
    cseeded = cmark != 0
    cstate = (
        jnp.where(cseeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(cseeded, -jnp.inf, jnp.inf).astype(jnp.float32),
        jnp.where(cseeded, cmark + 2, _META_MAX).astype(jnp.int32),
    )
    return cf, cmask, cmark, cfwd_i, cbwd_i, cstate


@persistent_jit(static_argnames=("factor",), donate_argnums=(5,))
def _ws_adopt_jit(cstate, cmark, field_j, markers_j, mask_j, state, factor):
    """Adopt the coarse flood as an upper-bound initial fine state.

    The coarse solution is upsampled and adopted wherever the fine pixel is
    floodable and the coarse label is set; the edge-replicated crop margin is
    excluded (no upper-bound guarantee).  Negative (barrier) coarse labels
    are adopted ONLY deep inside barrier territory and never at boundary
    cells: a boundary coarse cell seeded by pooled -1 markers would hand the
    fine rim an optimal-cost -1 claim that only a long claim-relaxation tail
    can overturn — which label-only convergence cuts off (regression:
    test_negative_marker_boundary_multigrid).  Deep-interior -1 cells carry
    genuinely flooded values, and without adopting them the vast -1 region
    floods from scratch at ~1 px per sweep (hundreds of rounds at GOES-day
    scale)."""
    t, h, w = field_j.shape
    seeded = markers_j != 0
    cseeded = cmark != 0
    up_claim = _upsample_nearest(cstate[0], factor, h, w)
    up_meta = _upsample_nearest(cstate[2], factor, h, w)
    yi = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (t, h, w), 2)
    in_cov = (yi < (h // factor) * factor) & (xi < (w // factor) * factor)
    up_label = (up_meta & ((1 << 23) - 1)) - 2
    clabel = jnp.where(
        cstate[2] == _META_MAX, 0, (cstate[2] & ((1 << 23) - 1)) - 2
    )
    neg_cell = (clabel < 0) & ~cseeded
    deep_neg = neg_cell
    for axis, dlt in ((0, 1), (0, -1), (1, 1), (1, -1), (2, 1), (2, -1)):
        shifted = jnp.roll(clabel < 0, dlt, axis)
        # roll wraps; wrapped faces are barrier-adjacent only if the
        # opposite face is — conservatively mask the wrapped slice
        idx = jax.lax.broadcasted_iota(jnp.int32, clabel.shape, axis)
        n_ax = clabel.shape[axis]
        valid = (idx >= dlt) & (idx < n_ax + dlt) if dlt > 0 else (
            (idx >= 0) & (idx < n_ax + dlt)
        )
        deep_neg = deep_neg & jnp.where(valid, shifted, False)
    up_deep_neg = _upsample_nearest(
        deep_neg.astype(jnp.int32), factor, h, w
    ).astype(bool)
    adopt = (
        mask_j
        & ~seeded
        & (up_meta != _META_MAX)
        & ((up_label >= 1) | up_deep_neg)
        & in_cov
    )
    adopted_claim = jnp.maximum(up_claim, field_j)
    return (
        jnp.where(adopt, adopted_claim, state[0]),
        # the coarse second-max is not an upper bound on the fine grid;
        # claim2 <= claim always holds, so claim itself is the safe one
        jnp.where(adopt, adopted_claim, state[1]),
        jnp.where(adopt, up_meta, state[2]),
    )


@persistent_jit
def _ws_decode_jit(meta, markers_j, mask_j):
    """Unpack labels from the converged meta and restore marker identity."""
    label = jnp.where(meta == _META_MAX, 0, (meta & ((1 << 23) - 1)) - 2)
    label = jnp.where(markers_j != 0, markers_j, label)
    return jnp.where((markers_j != 0) | (mask_j & (label != 0)), label, 0)


def watershed(
    forward_flow,
    backward_flow,
    field,
    markers,
    mask=None,
    connectivity=1,
    max_iters: int | None = None,
    chunk_iters: int = 16,
    radius: int | None = None,
    return_device: bool = False,
    multigrid: bool = True,
    grace: int = 2,
):
    """Watershed segmentation of a (T, H, W) sequence in the moving frame
    (API parity: reference ``watershed.py:17-168``).

    Parameters
    ----------
    forward_flow, backward_flow : (T, H, W, 2) flow fields (x, y channels).
    field : (T, H, W) topography to flood (NaN treated as +inf barriers).
    markers : (T, H, W) int seeds; negative markers flood as barriers and can
        be removed by the caller afterwards (reference ``detection.py:570``).
    mask : optional bool array; False pixels are never flooded.
    connectivity : int (1..3) or explicit (3,3,3) structuring element.
    max_iters : total sweep-round cap; defaults to T + H + W + 32.
    chunk_iters : sweep rounds per device dispatch (long single programs trip
        remote-worker watchdogs; convergence is checked between chunks).
    radius : band radius for the flow-displaced temporal gathers; None
        (default) adapts it to the actual maximum rounded flow.
    """
    # keep device arrays on device: all preprocessing is jnp (a host numpy
    # round-trip here costs ~GBs of transfer on GOES-scale windows)
    field_j = jnp.asarray(getattr(field, "values", field), dtype=jnp.float32)
    markers_j = jnp.asarray(getattr(markers, "values", markers)).astype(jnp.int32)
    if markers_j.shape != field_j.shape:
        raise ValueError(
            f"`markers` (shape {markers_j.shape}) must have same shape as "
            f"`image` (shape {field_j.shape})"
        )
    if mask is None:
        mask_j = jnp.ones(field_j.shape, dtype=bool)
    else:
        mask_j = jnp.asarray(getattr(mask, "values", mask)).astype(bool)
        if mask_j.shape != field_j.shape:
            raise ValueError(
                f"`mask` (shape {mask_j.shape}) must have same shape "
                f"as `image` (shape {field_j.shape})"
            )
    structure = connectivity_structure(connectivity)
    taps = _structure_taps_3d(structure)
    if max_iters is None:
        max_iters = int(sum(field_j.shape)) + 32

    # rounded displacements fit int8 (flow is clipped to ±20 px upstream,
    # reference flow.py:60-61) — at GOES-day scale the int32 form alone was
    # 1.8 GB of HBM.  The whole prep runs as ONE program: on the remote-TPU
    # rig every eager jnp op is its own (per-process) compile, and this
    # block alone was ~30 mini-programs of first-dispatch latency.
    field_j, fwd_int, bwd_int, state, small_enough = _ws_prep_jit(
        field_j,
        markers_j,
        mask_j,
        device_put_cached(forward_flow),
        device_put_cached(backward_flow),
    )
    if radius is None:
        # adaptive band radius: the temporal-tap cost scales with 2R+1, so
        # specialise to the 99th-percentile rounded displacement (one small
        # readback; compile cache is keyed per radius value).  Only masked
        # pixels can ever push a label (unmasked sources carry +inf cost),
        # so the percentile is taken over the mask — the flow over empty
        # background is Farneback noise with a fat tail that would otherwise
        # inflate the band 2-3x.  Displacements beyond the band are clipped
        # by the banded scatter — the handful of outlier vectors saturate
        # exactly as the reference's ±max_value clip does.
        q = int(np.argmax(np.asarray(small_enough)))  # first radius covering 99%
        radius = int(min(q + 2, 21))

    t, h, w = field_j.shape
    # the Pallas time-tiled sweep kernel pays off once a frame outgrows its
    # block size; below that the XLA sweeps win on dispatch overhead
    use_pallas = h * w >= 256 * 256 and _pallas_spatial_usable(h, w)
    factor = 4
    if multigrid and h >= 8 * factor and w >= 8 * factor:
        # V-cycle: flood a max-pooled field first (coarse barriers >= true
        # barriers, so the upsampled claims are upper bounds and full-res
        # sweeps relax monotonically to the same fixed point), then refine.
        cf, cmask, cmark, cfwd_i, cbwd_i, cstate = _ws_coarse_prep_jit(
            field_j, markers_j, mask_j, fwd_int, bwd_int, factor
        )
        cradius = max(radius // factor, 1) if radius is not None else 5
        cdone = 0
        cmax = (max_iters // 2) + 8
        while cdone < cmax:
            n = min(chunk_iters, cmax - cdone)
            cstate, used = _watershed_sweeps(
                cf, cmark, cmask, cfwd_i, cbwd_i, cstate, taps, cradius, n,
                grace=grace,
                use_pallas=use_pallas and (h // factor) * (w // factor) >= 256 * 256,
            )
            used = int(used)
            cdone += used
            if used < n:
                break
        state = _ws_adopt_jit(
            cstate, cmark, field_j, markers_j, mask_j, state, factor
        )
        # free the coarse-grid device buffers before the fine dispatches —
        # at GOES-day scale they are several hundred MB of HBM the flood
        # needs back
        del cstate, cf, cmask, cmark, cfwd_i, cbwd_i

    done = 0
    while done < max_iters:
        n = min(chunk_iters, max_iters - done)
        state, used = _watershed_sweeps(
            field_j, markers_j, mask_j, fwd_int, bwd_int, state, taps, radius, n,
            grace=grace, use_pallas=use_pallas,
        )
        used = int(used)
        done += used
        if used < n:  # converged inside the chunk
            break

    out = _ws_decode_jit(state[2], markers_j, mask_j)
    if return_device:
        return out
    return np.array(out)
