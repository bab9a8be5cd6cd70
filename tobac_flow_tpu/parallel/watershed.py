"""Sharded flow-aware watershed over a (t, x) device mesh.

The single-chip kernel (``ops/watershed.py``) solves the minimax-path
formulation of the reference's priority-flood watershed
(``tobac_flow/watershed.py`` + ``_watershed.pyx:308-313``) with data-parallel
Jacobi sweeps.  This module runs those sweeps SPMD over a mesh:

 * state (claim, hops, label) lives on the interior tile of every shard;
 * every round exchanges x halos of the state over ICI (width = the banded
   flow radius, so both the in-plane and the flow-displaced temporal taps can
   reach across tile boundaries) and ±1-frame t halos for the temporal taps;
 * in-plane taps are inf-padded static shifts — the global domain edge is a
   barrier exactly like the single-chip kernel's +inf padding
   (``ops/watershed.py:112-125``), never a wraparound;
 * convergence is a label-only check with a two-round grace (claims keep
   relaxing long after the assignment settles) reduced over the whole mesh
   with ``psum``, inside one ``lax.while_loop``.

Claims relax monotonically downward, so stale halo data between the
once-per-round refreshes only delays propagation — it can never adopt an
invalid label — and a fixed point that survives two freshly-exchanged rounds
is the global fixed point.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tobac_flow_tpu.ops.banded import banded_gather_axis
from tobac_flow_tpu.parallel.halo import halo_exchange_t, halo_exchange_x

__all__ = ["sharded_watershed", "sharded_watershed_local"]

_INF = np.float32(np.inf)
_HOPS_MAX = np.int32(1 << 30)


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

    claim = jnp.where(seeded, -_INF, _INF).astype(jnp.float32)
    hops = jnp.where(seeded, 0, _HOPS_MAX).astype(jnp.int32)
    label = jnp.where(seeded, markers, 0).astype(jnp.int32)

    tl = field.shape[0]
    hw = int(radius)  # x-halo width: covers in-plane and banded temporal taps

    field_x = halo_exchange_x(field, x_axis, hw, _INF)
    seeded_x = halo_exchange_x(seeded, x_axis, hw, False)
    flood_x = halo_exchange_x(floodable, x_axis, hw, False)
    fwd_x = halo_exchange_x(fwd_int, x_axis, hw, 0, axis=-2)
    bwd_x = halo_exchange_x(bwd_int, x_axis, hw, 0, axis=-2)

    def consider(best, cq, hq, lq):
        bc, bh, bl = best
        cand_h = jnp.minimum(hq + 1, _HOPS_MAX - 1)
        valid = lq != 0
        better = ((cq < bc) | ((cq == bc) & (cand_h < bh))) & valid
        return (
            jnp.where(better, cq, bc),
            jnp.where(better, cand_h, bh),
            jnp.where(better, lq, bl),
        )

    def sweep(state, include_temporal):
        """One Jacobi sweep on x-halo-extended state."""
        claim, hops, label = state
        cost = jnp.where(seeded_x, field_x, jnp.maximum(field_x, claim))
        best = (claim, hops, label)
        for dy, dx in ((1, 0), (-1, 0), (0, 1), (0, -1)):
            cq, hq, lq = _pad_shift_yx(
                (cost, hops, label), dy, dx, (_INF, 0, 0)
            )
            best = consider(best, cq, hq, lq)
        if include_temporal:
            cost_t = halo_exchange_t(cost, t_axis, 1, _INF)
            hops_t = halo_exchange_t(hops, t_axis, 1, 0)
            label_t = halo_exchange_t(label, t_axis, 1, 0)
            for dt, flow in ((-1, bwd_x), (1, fwd_x)):
                cs = jax.lax.dynamic_slice_in_dim(cost_t, dt + 1, tl, axis=0)
                hs = jax.lax.dynamic_slice_in_dim(hops_t, dt + 1, tl, axis=0)
                ls = jax.lax.dynamic_slice_in_dim(label_t, dt + 1, tl, axis=0)
                dy = flow[..., 1]
                dx = flow[..., 0]
                cq = banded_gather_axis(
                    banded_gather_axis(cs, dy, -2, radius, _INF), dx, -1, radius, _INF
                )
                hq = banded_gather_axis(
                    banded_gather_axis(hs, dy, -2, radius, 0), dx, -1, radius, 0
                )
                lq = banded_gather_axis(
                    banded_gather_axis(ls, dy, -2, radius, 0), dx, -1, radius, 0
                )
                best = consider(best, cq, hq, lq)
        return (
            jnp.where(flood_x, best[0], claim),
            jnp.where(flood_x, best[1], hops),
            jnp.where(flood_x, best[2], label),
        )

    def crop(a):
        return a[:, :, hw:-hw] if hw else a

    def cond(carry):
        _, quiet, it = carry
        return jnp.logical_and(quiet < 2, it < max_rounds)

    def body(carry):
        (claim, hops, label), quiet, it = carry
        # refresh the x halos from the neighbours' interiors
        st = (
            halo_exchange_x(claim, x_axis, hw, _INF),
            halo_exchange_x(hops, x_axis, hw, 0),
            halo_exchange_x(label, x_axis, hw, 0),
        )
        st = sweep(st, True)
        for _ in range(spatial_per_temporal):
            st = sweep(st, False)
        new = tuple(crop(a) for a in st)
        changed_local = jnp.any(new[2] != label).astype(jnp.float32)
        changed = jax.lax.psum(changed_local, (t_axis, x_axis))
        quiet = jnp.where(changed > 0, 0, quiet + 1)
        return new, quiet, it + 1

    (claim, hops, label), _, _ = jax.lax.while_loop(
        cond, body, ((claim, hops, label), jnp.int32(0), jnp.int32(0))
    )
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
