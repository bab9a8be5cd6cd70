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

__all__ = [
    "sharded_detect_step",
    "make_sharded_step",
    "make_sharded_thin_step",
    "sharded_detect_all",
]


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


def _detect_step_local(bt, wvd, swd, dt, fwd_in, bwd_in, *, params, hx,
                       ws_sweeps, vr_steps, smoothing_passes, interp_method,
                       use_wvd, wvd_threshold, bt_threshold, thick_upper,
                       thick_lower, erode_distance, warp_radius, w_global,
                       use_injected_flows, label_rounds, run_thick):
    """shard_map body: local (T_l, H, W_l) tiles + halo exchanges.

    Runs the REAL detection science (``parallel/science.py`` — the
    cross-shard-exact form of ``detect/fused.py``): combined curvature/peak
    filters, flow-tracked growth markers, flow-displaced core labelling, and
    the thick-anvil chain (marker mask -> -1-barrier seeds -> cubic
    uphill-Sobel edges -> sharded watershed).  Reference science:
    ``tobac_flow/detection.py:301-482,538-642``.
    """
    from tobac_flow_tpu.parallel.science import (
        sharded_anvil_marker_mask,
        sharded_anvil_prep,
        sharded_core_markers,
    )

    nan = jnp.float32(jnp.nan)

    if use_injected_flows:
        fwd, bwd = fwd_in, bwd_in
    else:
        bt_x = halo_exchange_x(bt, halo=hx, fill_value=nan)
        bt_h = halo_exchange_t(bt_x, halo=1, fill_value=nan)
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
        # crop the x halo: the science layer re-exchanges per stage
        fwd = fwd[:, :, hx:-hx] if hx else fwd
        bwd = bwd[:, :, hx:-hx] if hx else bwd

    core_markers = sharded_core_markers(
        bt, wvd, swd, fwd, bwd, dt, hx, w_global,
        use_wvd=use_wvd, wvd_threshold=wvd_threshold,
        bt_threshold=bt_threshold, warp_radius=warp_radius,
    )

    from tobac_flow_tpu.parallel.label import _label_step_local

    in_plane = tuple(
        (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0) and abs(dy) + abs(dx) <= 1
    )
    core_labels = _label_step_local(
        core_markers, fwd, bwd, t_total=0, w_total=w_global,
        in_plane=in_plane, halo=warp_radius, max_rounds=label_rounds,
    )

    # sequence the core-label loop before the anvil chain's collective
    # loops: XLA CPU executes independent collective while-loops
    # concurrently per device, and its rendezvous keying collides across
    # loops (hard crash); the barrier makes the ordering explicit
    core_labels, wvd_seq = jax.lax.optimization_barrier((core_labels, wvd))

    field_thick = wvd_seq - swd
    anvil_mask = sharded_anvil_marker_mask(field_thick, thick_upper)

    from tobac_flow_tpu.parallel.watershed import (
        global_marker_labels,
        sharded_watershed_local,
    )

    marker_ids = global_marker_labels(anvil_mask, w_global=w_global)
    edges, eroded = sharded_anvil_prep(
        field_thick, marker_ids, fwd, bwd, thick_lower, thick_upper,
        erode_distance, hx, warp_radius=warp_radius,
    )
    if run_thick:
        # pure-SPMD demonstration flood (pixel-id seeds); the parity chain
        # (sharded_detect_all) skips this and floods from the host-linked
        # marker LABELS instead — the single-chip seeding
        thick_labels = sharded_watershed_local(
            edges,
            eroded,
            jnp.round(fwd).astype(jnp.int32),
            jnp.round(bwd).astype(jnp.int32),
            radius=warp_radius,
            max_rounds=ws_sweeps,
        )
        from tobac_flow_tpu.parallel.science import sharded_anvil_post

        thick_labels = sharded_anvil_post(thick_labels, marker_ids)
    else:
        thick_labels = jnp.zeros_like(eroded)

    return fwd, bwd, core_markers, core_labels, edges, thick_labels, anvil_mask


def make_sharded_step(
    mesh,
    w_global,
    dt_minutes: float = 5.0,
    params: FarnebackParams | None = None,
    hx: int = 24,
    ws_sweeps: int = 8,
    vr_steps: int = 0,
    smoothing_passes: int = 0,
    interp_method: str = "linear",
    use_wvd: bool = True,
    wvd_threshold: float = 0.25,
    bt_threshold: float = 0.5,
    thick_upper: float = -5.0,
    thick_lower: float = -12.5,
    erode_distance: int = 2,
    warp_radius: int = 21,
    inject_flows: bool = False,
    label_rounds: int = 256,
    run_thick: bool = True,
):
    """Build the jitted SPMD detection step for a given mesh.

    Returns a function (bt, wvd, swd[, fwd, bwd]) -> (fwd, bwd,
    core_markers, core_labels, edge_field, thick_anvil_labels) with all
    inputs/outputs sharded P('t', None, 'x').  ``hx`` must be at least
    ``warp_radius + 3`` for edge-exact science (the warp band plus the
    deepest local stencil margin); flow fields can be injected
    (``inject_flows=True``) to decouple flow estimation from the science —
    that configuration is bit-comparable to the single-chip fused programs.
    """
    if params is None:
        params = FarnebackParams(num_levels=2, winsize=9, num_iters=3)
    spec = P("t", None, "x")
    spec_t = P("t", None, None)
    flow_spec = P("t", None, "x", None)

    body = functools.partial(
        _detect_step_local,
        params=params,
        hx=hx,
        ws_sweeps=ws_sweeps,
        vr_steps=vr_steps,
        smoothing_passes=smoothing_passes,
        interp_method=interp_method,
        use_wvd=use_wvd,
        wvd_threshold=wvd_threshold,
        bt_threshold=bt_threshold,
        thick_upper=thick_upper,
        thick_lower=thick_lower,
        erode_distance=erode_distance,
        warp_radius=warp_radius,
        w_global=w_global,
        use_injected_flows=inject_flows,
        label_rounds=label_rounds,
        run_thick=run_thick,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, spec, spec_t, flow_spec, flow_spec),
        out_specs=(flow_spec, flow_spec, spec, spec, spec, spec, spec),
    )
    jitted = jax.jit(mapped)

    def step(bt, wvd, swd, fwd=None, bwd=None):
        t = bt.shape[0]
        dt = jnp.full((t, 1, 1), jnp.float32(dt_minutes))
        if fwd is None:
            fwd = jnp.zeros(bt.shape + (2,), jnp.float32)
            bwd = jnp.zeros(bt.shape + (2,), jnp.float32)
        return jitted(bt, wvd, swd, dt, fwd, bwd)

    return step


def sharded_detect_step(mesh, bt, wvd, swd, flows=None, **kwargs):
    """Convenience wrapper: place the inputs on the mesh and run one step.

    ``flows=(fwd, bwd)`` injects precomputed flow fields (sets
    ``inject_flows``); otherwise the step estimates flow on halo-extended
    tiles in-body.
    """
    w_global = np.asarray(bt).shape[-1]
    step = make_sharded_step(
        mesh, w_global, inject_flows=flows is not None, **kwargs
    )
    spec = P("t", None, "x")
    sharding = NamedSharding(mesh, spec)
    args = [
        jax.device_put(jnp.asarray(np.asarray(a), dtype=jnp.float32), sharding)
        for a in (bt, wvd, swd)
    ]
    if flows is not None:
        fsh = NamedSharding(mesh, P("t", None, "x", None))
        args += [
            jax.device_put(jnp.asarray(np.asarray(f), dtype=jnp.float32), fsh)
            for f in flows
        ]
    return step(*args)


def _anvil_step_local(field, markers, fwd, bwd, *, hx, warp_radius,
                      upper, lower, erode_distance, ws_sweeps):
    """shard_map body for one seeded anvil-watershed phase: prep (linearise,
    erode markers, uphill-Sobel edges), flood, post (clamp/opening/marker
    restore).  Serves the thick chain (upper -5, lower -12.5, markers = the
    flow-linked anvil marker labels) and the thin chain (upper 0, lower
    -7.5, markers = the relabeled thick labels) — reference
    ``scripts/dcc_detect_goes.py:217-309``."""
    from tobac_flow_tpu.parallel.science import (
        sharded_anvil_post,
        sharded_anvil_prep,
    )
    from tobac_flow_tpu.parallel.watershed import sharded_watershed_local

    edges, eroded = sharded_anvil_prep(
        field, markers, fwd, bwd, lower, upper, erode_distance,
        hx, warp_radius=warp_radius,
    )
    labels = sharded_watershed_local(
        edges,
        eroded,
        jnp.round(fwd).astype(jnp.int32),
        jnp.round(bwd).astype(jnp.int32),
        radius=warp_radius,
        max_rounds=ws_sweeps,
    )
    return sharded_anvil_post(labels, markers)


def make_sharded_anvil_step(
    mesh,
    hx: int = 24,
    ws_sweeps: int = 8,
    upper: float = -5.0,
    lower: float = -12.5,
    erode_distance: int = 2,
    warp_radius: int = 21,
):
    """Build a jitted SPMD seeded anvil-watershed phase: (field, markers,
    fwd, bwd) -> anvil labels, all sharded P('t', None, 'x')."""
    spec = P("t", None, "x")
    flow_spec = P("t", None, "x", None)
    body = functools.partial(
        _anvil_step_local,
        hx=hx,
        warp_radius=warp_radius,
        upper=upper,
        lower=lower,
        erode_distance=erode_distance,
        ws_sweeps=ws_sweeps,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, flow_spec, flow_spec),
        out_specs=spec,
    )
    return jax.jit(mapped)


# backwards-compatible alias (the thin phase is the same program with the
# thin thresholds)
def make_sharded_thin_step(mesh, thin_upper=0.0, thin_lower=-7.5, **kw):
    return make_sharded_anvil_step(
        mesh, upper=thin_upper, lower=thin_lower, **kw
    )


def sharded_detect_all(
    mesh,
    bt,
    wvd,
    swd,
    flows=None,
    overlap: float = 0.5,
    absolute_overlap: int = 4,
    min_length: int = 3,
    relabel: bool = True,
    thick_upper: float = -5.0,
    thick_lower: float = -12.5,
    thin_upper: float = 0.0,
    thin_lower: float = -7.5,
    erode_distance: int = 2,
    **kwargs,
):
    """Full sharded detection chain: flow -> cores -> anvil markers -> thick
    anvils -> relabel -> thin anvils (the complete dense pipeline of
    ``cli/common.run_detection``, reference ``dcc_detect_goes.py:134-309``).

    The dense phases are jitted SPMD programs over the mesh (flow/core
    science in ``sharded_detect_step``; each seeded anvil watershed in
    ``make_sharded_anvil_step``); the data-dependent label bookkeeping
    between them — the flow-linked anvil-marker labels, length/marker
    filters, and the overlap-threshold relabel (``detection.py:500-520,
    660-687``) — runs on host through the exact single-chip functions after
    a gather, this package's documented split (see ``parallel/label.py``:
    "the data-dependent label bookkeeping stays on host").  Returns a dict
    with core/marker/thick/thin labels (host arrays, contiguous ids) and the
    sharded flow fields.
    """
    from tobac_flow_tpu.core.flow import Flow
    from tobac_flow_tpu.detect.analysis import find_object_lengths, mask_labels
    from tobac_flow_tpu.detect.detection import get_anvil_markers, relabel_anvils
    from tobac_flow_tpu.utils.labels import remap_labels

    kwargs.setdefault("thick_upper", thick_upper)
    kwargs.setdefault("thick_lower", thick_lower)
    kwargs.setdefault("erode_distance", erode_distance)
    kwargs.setdefault("run_thick", False)  # the parity flood runs in phase B
    out = sharded_detect_step(mesh, bt, wvd, swd, flows=flows, **kwargs)
    fwd, bwd, core_markers, core_labels, _edges, _thick_raw, anvil_mask = out

    fwd_np = np.asarray(fwd)
    bwd_np = np.asarray(bwd)
    host_flow = Flow(fwd_np, bwd_np)
    field_thick_np = np.asarray(wvd) - np.asarray(swd)

    # anvil marker labels: the exact single-chip path (threshold mask ->
    # flow.label with the overlap thresholds -> length filter), reference
    # detection.py:500-520
    marker_labels = np.asarray(
        get_anvil_markers(
            host_flow,
            field_thick_np,
            threshold=thick_upper,
            overlap=overlap,
            absolute_overlap=absolute_overlap,
            min_length=min_length,
        )
    )

    spec = P("t", None, "x")
    sharding = NamedSharding(mesh, spec)

    def put(a, dtype):
        return jax.device_put(jnp.asarray(np.asarray(a), dtype), sharding)

    anvil_kw = dict(
        hx=kwargs.get("hx", 24),
        ws_sweeps=kwargs.get("ws_sweeps", 8),
        erode_distance=erode_distance,
        warp_radius=kwargs.get("warp_radius", 21),
    )
    thick_step = make_sharded_anvil_step(
        mesh, upper=thick_upper, lower=thick_lower, **anvil_kw
    )
    thick_raw = thick_step(
        put(field_thick_np, jnp.float32),
        put(marker_labels, jnp.int32),
        fwd,
        bwd,
    )

    # host tail of detect_anvils (detection.py:575-587)
    thick_np = np.asarray(thick_raw)
    lengths = find_object_lengths(thick_np)
    marker_overlap = mask_labels(thick_np, marker_labels != 0)
    thick_np = remap_labels(
        thick_np, np.logical_and(lengths > min_length, marker_overlap)
    )
    if relabel:
        thick_np = np.asarray(
            relabel_anvils(
                host_flow,
                thick_np,
                markers=marker_labels,
                overlap=overlap,
                absolute_overlap=absolute_overlap,
                min_length=min_length,
            )
        )

    # thin-anvil watershed seeded by the relabeled thick labels
    thin_step = make_sharded_anvil_step(
        mesh, upper=thin_upper, lower=thin_lower, **anvil_kw
    )
    field_thin_np = np.asarray(wvd) + np.asarray(swd)
    thin_raw = thin_step(
        put(field_thin_np, jnp.float32), put(thick_np, jnp.int32), fwd, bwd
    )

    thin_np = np.asarray(thin_raw)
    lengths = find_object_lengths(thin_np)
    marker_overlap = mask_labels(thin_np, thick_np != 0)
    thin_np = remap_labels(
        thin_np, np.logical_and(lengths > min_length, marker_overlap)
    )

    return {
        "forward_flow": fwd,
        "backward_flow": bwd,
        "core_markers": np.asarray(core_markers),
        "core_labels": np.asarray(core_labels),
        "anvil_marker_mask": np.asarray(anvil_mask),
        "anvil_marker_labels": marker_labels,
        "thick_anvil_labels": thick_np,
        "thin_anvil_labels": thin_np,
    }
