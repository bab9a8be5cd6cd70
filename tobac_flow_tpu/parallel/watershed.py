"""Sharded flow-aware watershed over a (t, x) device mesh.

The single-chip kernel (``ops/watershed.py``) solves the minimax-path
formulation of the reference's priority-flood watershed
(``tobac_flow/watershed.py`` + ``_watershed.pyx:308-313``) with data-parallel
Jacobi sweeps.  This module runs those sweeps SPMD over a mesh with the
SAME heap-faithful tie semantics as the single-chip kernel — the packed
(claim, claim2/gate, hops<<23|label) state, plateau-relative hop clocks and
the barrier-last label order of ``ops/watershed._lex_better`` — so a mesh
flood and the single-chip flood agree on ties, not just on clear minimax
winners:

 * state (claim, claim2, meta) lives on the interior tile of every shard;
 * every round exchanges x halos of the state over ICI (width = the banded
   flow radius, so both the in-plane and the flow-displaced temporal taps can
   reach across tile boundaries) and ±1-frame t halos for the temporal taps;
 * temporal adjacency is the reference's SOURCE-side scatter
   (``ops/watershed._banded_scatter_min``): frame t-1 pushes along its own
   forward flow, t+1 along its backward flow (``_watershed.pyx:308-313``);
 * in-plane taps are inf-padded static shifts — the global domain edge is a
   barrier exactly like the single-chip kernel's +inf padding
   (``ops/watershed.py:112-125``), never a wraparound;
 * convergence is a label-only check with a two-round grace (claims keep
   relaxing long after the assignment settles) reduced over the whole mesh
   with ``psum``, inside one ``lax.while_loop``.

Labels must lie in [-1, 2^23 - 3] (the packed-meta contract shared with the
single-chip kernel); the production chain (``parallel/pipeline.py``) seeds
with small contiguous label ids.  Claims relax monotonically downward, so
stale halo data between the once-per-round refreshes only delays
propagation — it can never adopt an invalid label — and a fixed point that
survives two freshly-exchanged rounds is the global fixed point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tobac_flow_tpu.ops.watershed import _banded_scatter_min, _lex_better
from tobac_flow_tpu.parallel.halo import halo_exchange_t, halo_exchange_x

__all__ = ["sharded_watershed", "sharded_watershed_local"]

_INF = np.float32(np.inf)
_META_MAX = np.int32(np.iinfo(np.int32).max)
_LABEL_MASK = np.int32((1 << 23) - 1)
_HOPS_STEP = np.int32(1 << 23)
_HOPS_CAP = np.int32(255 << 23)


def _pad_shift_yx(arrs, dy, dx, fills):
    """arr[t, y + dy, x + dx] with constant fill at the array edges."""
    outs = []
    for a, fill in zip(arrs, fills):
        t, h, w = a.shape
        padded = jnp.pad(
            a,
            ((0, 0), (abs(dy), abs(dy)), (abs(dx), abs(dx))),
            constant_values=fill,
        )
        outs.append(
            jax.lax.dynamic_slice(padded, (0, abs(dy) + dy, abs(dx) + dx), (t, h, w))
        )
    return outs


def _shift_t(arr, dt, fill):
    fill_frame = jnp.full((1,) + arr.shape[1:], fill, dtype=arr.dtype)
    if dt == 1:
        return jnp.concatenate([arr[1:], fill_frame], axis=0)
    return jnp.concatenate([fill_frame, arr[:-1]], axis=0)


def sharded_watershed_local(
    field,
    markers,
    fwd_int,
    bwd_int,
    mask=None,
    radius: int = 21,
    max_rounds: int = 64,
    spatial_per_temporal: int = 8,
    t_axis: str = "t",
    x_axis: str = "x",
):
    """shard_map body: minimax watershed on local (T_l, H, W_l) tiles.

    field: local topography (NaN/+inf pixels flood last, like the serial
    heap); markers: int labels (globally unique across shards, 0 =
    unlabeled); fwd_int/bwd_int: local rounded flow (T_l, H, W_l, 2); mask:
    optional bool tile — False pixels are never flooded and never propagate
    (reference ``watershed.py:55-60``).  Returns the local label tile.
    """
    seeded = markers != 0
    if mask is None:
        mask = jnp.ones(field.shape, dtype=bool)
    floodable = mask & ~seeded
    field = jnp.where(jnp.isnan(field), _INF, field)

    # packed state, identical to the single-chip kernel's
    # (ops/watershed._watershed_sweeps): claim = minimax path cost, claim2 =
    # the frozen gate (approach bottleneck at the path's last strict max
    # rise), meta = min(hops, 255) << 23 | (label + 2)
    claim = jnp.where(seeded, -_INF, _INF).astype(jnp.float32)
    claim2 = claim
    meta = jnp.where(
        seeded, markers.astype(jnp.int32) + 2, _META_MAX
    ).astype(jnp.int32)

    tl = field.shape[0]
    hw = int(radius)  # x-halo width: covers in-plane and banded temporal taps

    field_x = halo_exchange_x(field, x_axis, hw, _INF)
    seeded_x = halo_exchange_x(seeded, x_axis, hw, False)
    flood_x = halo_exchange_x(floodable, x_axis, hw, False)
    fwd_x = halo_exchange_x(fwd_int, x_axis, hw, 0, axis=-2)
    bwd_x = halo_exchange_x(bwd_int, x_axis, hw, 0, axis=-2)
    ninf = jnp.float32(-jnp.inf)

    def consider(best, cq, c2q, mq):
        # hop clock ticks only while the wave stays ON its level plateau —
        # bit-equal to ops/watershed._watershed_sweeps.consider
        bc, bc2, bm = best
        on_level = field_x == cq
        cand_m = mq + jnp.where((mq < _HOPS_CAP) & on_level, _HOPS_STEP, 0)
        valid = mq != _META_MAX
        better = _lex_better(cq, c2q, cand_m, bc, bc2, bm) & valid
        return (
            jnp.where(better, cq, bc),
            jnp.where(better, c2q, bc2),
            jnp.where(better, cand_m, bm),
        )

    def sweep(state, include_temporal):
        """One Jacobi sweep on x-halo-extended state."""
        claim, claim2, meta = state
        cost = jnp.where(seeded_x, field_x, jnp.maximum(field_x, claim))
        cost2 = jnp.where(
            seeded_x, ninf, jnp.where(field_x > claim, claim, claim2)
        )
        meta_p = jnp.where(
            ~seeded_x & (field_x > claim), meta & _LABEL_MASK, meta
        )
        best = (claim, claim2, meta)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            cq, c2q, mq = _pad_shift_yx(
                (cost, cost2, meta_p), dy, dx, (_INF, _INF, _META_MAX)
            )
            best = consider(best, cq, c2q, mq)
        if include_temporal:
            cost_t = halo_exchange_t(cost, t_axis, 1, _INF)
            cost2_t = halo_exchange_t(cost2, t_axis, 1, _INF)
            meta_t = halo_exchange_t(meta_p, t_axis, 1, _META_MAX)
            fwd_t = halo_exchange_t(fwd_x, t_axis, 1, 0)
            bwd_t = halo_exchange_t(bwd_x, t_axis, 1, 0)
            # source-side scatter (the reference heap's adjacency,
            # _watershed.pyx:308-313): frame t-dt pushes along ITS OWN flow
            for dt, flow_t in ((1, fwd_t), (-1, bwd_t)):
                cs = jax.lax.dynamic_slice_in_dim(cost_t, 1 - dt, tl, axis=0)
                c2s = jax.lax.dynamic_slice_in_dim(cost2_t, 1 - dt, tl, axis=0)
                ms = jax.lax.dynamic_slice_in_dim(meta_t, 1 - dt, tl, axis=0)
                fs = jax.lax.dynamic_slice_in_dim(flow_t, 1 - dt, tl, axis=0)
                cq, c2q, mq = _banded_scatter_min(
                    cs, c2s, ms, fs[..., 1], fs[..., 0], radius, _META_MAX
                )
                best = consider(best, cq, c2q, mq)
        return (
            jnp.where(flood_x, best[0], claim),
            jnp.where(flood_x, best[1], claim2),
            jnp.where(flood_x, best[2], meta),
        )

    def crop(a):
        return a[:, :, hw:-hw] if hw else a

    def cond(carry):
        _, quiet, it = carry
        return jnp.logical_and(quiet < 2, it < max_rounds)

    def body(carry):
        (claim, claim2, meta), quiet, it = carry
        # refresh the x halos from the neighbours' interiors
        st = (
            halo_exchange_x(claim, x_axis, hw, _INF),
            halo_exchange_x(claim2, x_axis, hw, _INF),
            halo_exchange_x(meta, x_axis, hw, _META_MAX),
        )
        st = sweep(st, True)
        for _ in range(spatial_per_temporal):
            st = sweep(st, False)
        new = tuple(crop(a) for a in st)
        changed_local = jnp.any(
            (new[2] & _LABEL_MASK) != (meta & _LABEL_MASK)
        ).astype(jnp.float32)
        changed = jax.lax.psum(changed_local, (t_axis, x_axis))
        quiet = jnp.where(changed > 0, 0, quiet + 1)
        return new, quiet, it + 1

    (claim, claim2, meta), _, _ = jax.lax.while_loop(
        cond, body, ((claim, claim2, meta), jnp.int32(0), jnp.int32(0))
    )
    label = jnp.where(meta == _META_MAX, 0, (meta & _LABEL_MASK) - 2)
    return jnp.where(seeded, markers, label)


def global_marker_labels(markers_bool, t_axis="t", x_axis="x", w_global=None):
    """Globally-unique positive labels for a boolean local marker tile.

    The id is the 1-based global raveled pixel index, identical no matter how
    the domain is sharded (so multi-chip output can be compared to the
    single-chip path after CCL renumbering).
    """
    tl, h, wl = markers_bool.shape
    n_x = jax.lax.axis_size(x_axis)
    if w_global is None:
        w_global = wl * n_x
    t0 = jax.lax.axis_index(t_axis) * tl
    x0 = jax.lax.axis_index(x_axis) * wl
    ti = jax.lax.broadcasted_iota(jnp.int32, (tl, h, wl), 0) + t0
    yi = jax.lax.broadcasted_iota(jnp.int32, (tl, h, wl), 1)
    xi = jax.lax.broadcasted_iota(jnp.int32, (tl, h, wl), 2) + x0
    pix = (ti * h + yi) * w_global + xi + 1
    return jnp.where(markers_bool, pix, 0)


def sharded_watershed(
    mesh,
    field,
    markers,
    forward_flow,
    backward_flow,
    mask=None,
    radius: int = 21,
    max_rounds: int = 64,
    spatial_per_temporal: int = 8,
):
    """Seeded flow-aware watershed of a (T, H, W) field over a (t, x) mesh.

    Multi-chip counterpart of ``ops/watershed.py`` (reference semantics:
    ``tobac_flow/watershed.py:17-168``).  ``markers`` is an int (T, H, W)
    array of seed labels; flows are (T, H, W, 2) float fields (x, y
    channels); ``mask`` is an optional bool array — False pixels are never
    flooded.  Returns the (T, H, W) label array, sharded P('t', None, 'x').
    """
    spec = P("t", None, "x")
    fspec = P("t", None, "x", None)
    sharding = NamedSharding(mesh, spec)
    fsharding = NamedSharding(mesh, fspec)
    field_j = jax.device_put(jnp.asarray(field, jnp.float32), sharding)
    markers_j = jax.device_put(jnp.asarray(markers).astype(jnp.int32), sharding)
    if mask is None:
        mask = np.ones(np.shape(field), bool)
    mask_j = jax.device_put(jnp.asarray(mask).astype(bool), sharding)
    fwd_i = jax.device_put(
        jnp.round(jnp.asarray(forward_flow)).astype(jnp.int32), fsharding
    )
    bwd_i = jax.device_put(
        jnp.round(jnp.asarray(backward_flow)).astype(jnp.int32), fsharding
    )

    body = functools.partial(
        sharded_watershed_local,
        radius=radius,
        max_rounds=max_rounds,
        spatial_per_temporal=spatial_per_temporal,
    )
    mapped = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(spec, spec, fspec, fspec, spec),
        out_specs=spec,
    )
    return jax.jit(mapped)(field_j, markers_j, fwd_i, bwd_i, mask_j)
