"""Sharded (multi-chip) detection pipeline step.

One jitted SPMD program over a (t, x) device mesh covering the dense compute
of the DCC pipeline: pairwise optical flow, semi-Lagrangian growth rates,
anvil edge field, core/anvil marker masks, and seeded watershed sweeps.
Time shards exchange ±1-frame halos, spatial tiles exchange
±(max_flow + stencil) pixel halos — all over ICI via ``ppermute``
(see ``parallel/halo.py``).  The data-dependent label bookkeeping (CCL
renumbering, overlap-graph linking, per-object filters) stays on host after a
gather, mirroring the reference's file-level relinking (SURVEY §2.6).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tobac_flow_tpu.models.farneback import FarnebackParams, farneback_pair
from tobac_flow_tpu.parallel.halo import halo_exchange_t, halo_exchange_x

__all__ = ["sharded_detect_step", "make_sharded_step"]


def _normalise_pair_block(prev, nxt):
    """Joint linear normalisation of a frame pair to 0..255 (see
    models._normalise_pair; NaN holes inherit the other frame)."""
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


def _local_flow(bt_h, params, vr_steps=0, smoothing_passes=0,
                interp_method="linear"):
    """Forward/backward flow for a halo-extended (T_l + 2, H, W) block.

    Returns flows for the T_l interior frames.  ``vr_steps`` /
    ``smoothing_passes`` mirror the CLI-default ``create_flow``
    configuration: both are elementwise + banded-shift passes (no
    collectives), so they run unchanged inside the shard_map body — banded
    warps near tile edges read the x halo, so pass ``hx`` of at least the
    warp band (~21 px) for edge-exact production flows.
    """
    t_ext = bt_h.shape[0]

    def pair(i):
        p8, n8 = _normalise_pair_block(bt_h[i], bt_h[i + 1])
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

    fwds, bwds = [], []
    for j in range(t_ext - 1):  # static unroll over local pairs
        f, b = pair(j)
        fwds.append(f)
        bwds.append(b)
    fwd_pairs = jnp.stack(fwds)  # pair j: frame j -> j+1 (halo indexing)
    bwd_pairs = jnp.stack(bwds)
    # interior frame i (halo index i+1): forward = pair i+1, backward = pair i
    fwd = fwd_pairs[1:]
    bwd = bwd_pairs[:-1]
    return fwd, bwd


def _stencil_gather(data_h, flow, dyx, taps, fill):
    """Gather flow-displaced neighbours from the ±1-frame halo block via the
    banded-shift warp (``ops/banded.py``) — the integer structuring offsets
    fold into the displacement field, so each tap is one banded 2D pass.

    data_h: (T_l + 2, H, W); flow: (T_l, H, W, 2) displacement toward the
    neighbouring frame (dt = dyx); returns list of (T_l, H, W) taps.
    """
    from tobac_flow_tpu.ops.banded import banded_warp_axis

    tl = flow.shape[0]
    neighbour = jax.lax.dynamic_slice_in_dim(data_h, 1 + dyx, tl, axis=0)
    outs = []
    for ox, oy in taps:
        a = banded_warp_axis(neighbour, flow[..., 1] + oy, -2, 21, fill)
        outs.append(banded_warp_axis(a, flow[..., 0] + ox, -1, 21, fill))
    return outs


def _pad_shift(a, dy, dx, fill):
    """a[t, y + dy, x + dx] with constant fill at the tile edges (the x halo
    supplies the true neighbour values; y edges are the domain boundary)."""
    t, h, w = a.shape
    padded = jnp.pad(
        a, ((0, 0), (abs(dy), abs(dy)), (abs(dx), abs(dx))), constant_values=fill
    )
    return jax.lax.dynamic_slice(padded, (0, abs(dy) + dy, abs(dx) + dx), (t, h, w))


def _nanmean_taps(taps):
    total = None
    count = None
    for tap in taps:
        fin = jnp.isfinite(tap)
        v = jnp.where(fin, tap, 0.0)
        total = v if total is None else total + v
        c = fin.astype(jnp.float32)
        count = c if count is None else count + c
    return jnp.where(count > 0, total / jnp.maximum(count, 1), jnp.nan)


def _detect_step_local(bt, wvd, swd, dt_minutes, params, hx, ws_sweeps,
                       vr_steps=0, smoothing_passes=0,
                       interp_method="linear"):
    """shard_map body: local (T_l, H, W_l) blocks + halo exchanges."""
    nan = jnp.float32(jnp.nan)

    # -- halo-extend in x then t ----------------------------------------
    bt_x = halo_exchange_x(bt, halo=hx, fill_value=nan)
    wvd_x = halo_exchange_x(wvd, halo=hx, fill_value=nan)
    swd_x = halo_exchange_x(swd, halo=hx, fill_value=nan)
    bt_h = halo_exchange_t(bt_x, halo=1, fill_value=nan)
    wvd_h = halo_exchange_t(wvd_x, halo=1, fill_value=nan)

    # -- optical flow on extended tiles ---------------------------------
    fwd, bwd = _local_flow(
        bt_h, params, vr_steps=vr_steps,
        smoothing_passes=smoothing_passes, interp_method=interp_method,
    )
    fwd = jnp.clip(fwd, -20.0, 20.0)
    bwd = jnp.clip(bwd, -20.0, 20.0)
    # reference boundary rule at the global sequence ends
    t_idx = jax.lax.axis_index("t")
    n_t = jax.lax.axis_size("t")
    is_first = t_idx == 0
    is_last = t_idx == n_t - 1
    bwd = bwd.at[0].set(jnp.where(is_first, -fwd[0], bwd[0]))
    fwd = fwd.at[-1].set(jnp.where(is_last, -bwd[-1], fwd[-1]))

    # -- semi-Lagrangian growth rate of -bt -----------------------------
    centre = (0, 0)
    prev_tap = _stencil_gather(-bt_h, bwd, -1, [centre], nan)[0]
    next_tap = _stencil_gather(-bt_h, fwd, +1, [centre], nan)[0]
    cur = -bt_x
    f_ok = jnp.isfinite(next_tap)
    b_ok = jnp.isfinite(prev_tap)
    diff = (
        jnp.where(f_ok, next_tap - cur, 0.0) + jnp.where(b_ok, cur - prev_tap, 0.0)
    ) / jnp.maximum(f_ok.astype(jnp.float32) + b_ok.astype(jnp.float32), 1.0)
    growth = diff / dt_minutes
    # spatial smoothing (in-plane cross); NaN-padded shifts — a roll would
    # wrap the domain toroidally in y (and leak across the x halo)
    sp = [growth]
    for ox, oy in ((1, 0), (-1, 0), (0, 1), (0, -1)):
        sp.append(_pad_shift(growth, oy, ox, nan))
    bt_growth = _nanmean_taps(sp)

    # -- core marker mask -----------------------------------------------
    core_markers = bt_growth > 0.5

    # -- anvil field, markers, edge field -------------------------------
    anvil_field = jnp.clip((wvd_x - swd_x + 15.0) / 10.0, 0.0, 1.0)
    anvil_markers = anvil_field >= 1.0
    # uphill Sobel magnitude along the flow (full 27-tap stencil)
    offsets = [(ox, oy) for oy in (-1, 0, 1) for ox in (-1, 0, 1)]
    field_h = halo_exchange_t(anvil_field, halo=1, fill_value=nan)
    taps_prev = _stencil_gather(field_h, bwd, -1, offsets, nan)
    taps_next = _stencil_gather(field_h, fwd, +1, offsets, nan)
    taps_same = [_pad_shift(anvil_field, oy, ox, nan) for ox, oy in offsets]
    centre_val = anvil_field
    # axis-permuted 3D Sobel weights over the (3,3,3) stencil
    base = np.multiply.outer(
        np.array([1, 2, 1]), np.multiply.outer(np.array([1, 2, 1]), np.array([-1, 0, 1]))
    )
    w_x = base  # gradient along x
    w_y = base.transpose(0, 2, 1)
    w_tt = base.transpose(2, 0, 1)
    gx = gy = gt = 0.0
    all_taps = [taps_prev, taps_same, taps_next]
    for pi, plane in enumerate(all_taps):
        for oi, (ox, oy) in enumerate(offsets):
            rect = jnp.fmax(plane[oi] - centre_val, 0.0)
            rect = jnp.where(jnp.isnan(rect), 0.0, rect)
            gx = gx + float(w_x[pi, oy + 1, ox + 1]) * rect
            gy = gy + float(w_y[pi, oy + 1, ox + 1]) * rect
            gt = gt + float(w_tt[pi, oy + 1, ox + 1]) * rect
    edges = jnp.sqrt(gx * gx + gy * gy + gt * gt)
    edges = jnp.where(edges > 0, edges + 1.0, edges) - anvil_field
    edges = jnp.where(jnp.isnan(anvil_field), jnp.inf, edges)

    # -- seeded watershed: interior tiles, per-round ICI halo refresh ----
    from tobac_flow_tpu.parallel.watershed import (
        global_marker_labels,
        sharded_watershed_local,
    )

    # crop x halos back to the interior tile (the x axis is axis 2; flow
    # arrays carry a trailing component axis)
    def crop(a):
        return a[:, :, hx:-hx] if hx else a

    markers_int = global_marker_labels(crop(anvil_markers))
    label = sharded_watershed_local(
        crop(edges),
        markers_int,
        jnp.round(crop(fwd)).astype(jnp.int32),
        jnp.round(crop(bwd)).astype(jnp.int32),
        max_rounds=ws_sweeps,
    )

    return (
        crop(fwd),
        crop(bwd),
        crop(bt_growth),
        crop(core_markers),
        crop(edges),
        label,
    )


def make_sharded_step(
    mesh,
    dt_minutes: float = 5.0,
    params: FarnebackParams | None = None,
    hx: int = 8,
    ws_sweeps: int = 4,
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    interp_method: str = "linear",
):
    """Build the jitted SPMD detection step for a given mesh.

    Returns a function (bt, wvd, swd) -> (fwd, bwd, bt_growth, core_markers,
    edge_field, watershed_labels) with all inputs/outputs sharded
    P('t', None, 'x').
    """
    if params is None:
        params = FarnebackParams(num_levels=2, winsize=9, num_iters=3)
    spec = P("t", None, "x")

    body = functools.partial(
        _detect_step_local,
        dt_minutes=dt_minutes,
        params=params,
        hx=hx,
        ws_sweeps=ws_sweeps,
        vr_steps=vr_steps,
        smoothing_passes=smoothing_passes,
        interp_method=interp_method,
    )
    flow_spec = P("t", None, "x", None)
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec),
        out_specs=(flow_spec, flow_spec, spec, spec, spec, spec),
    )
    return jax.jit(mapped)


def sharded_detect_step(mesh, bt, wvd, swd, **kwargs):
    """Convenience wrapper: place the inputs on the mesh and run one step."""
    step = make_sharded_step(mesh, **kwargs)
    spec = P("t", None, "x")
    sharding = NamedSharding(mesh, spec)
    args = [
        jax.device_put(jnp.asarray(np.asarray(a), dtype=jnp.float32), sharding)
        for a in (bt, wvd, swd)
    ]
    return step(*args)
