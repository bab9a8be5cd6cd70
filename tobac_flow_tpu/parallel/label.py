"""Cross-shard connected-component labelling in the moving frame.

The single-chip tracking core (``segment/label.py:flow_label``) labels 3D
objects whose temporal connectivity follows the flow field.  This module is
its multi-chip form (SURVEY §2.6: "watershed and label linking need iterative
cross-shard label reconciliation"): the mask is sharded over a (t, x) device
mesh, every in-mask pixel seeds a globally unique id, and min-label
propagation sweeps run with per-round halo exchange over ICI until a global
``psum`` convergence check reports no change on any shard.

Semantics: threshold-free flow labelling (reference ``label.py:84-175`` with
``overlap=0`` / ``absolute_overlap=0``) — two objects link if any pixel of
one overlaps the flow-displaced footprint of the other in the adjacent
frame.  Temporal taps displace by the *rounded* flow (the reference's
nearest-interpolation label warp, ``label.py:133-137``), applied as banded
static shifts so no gather appears in the program.  Output labels are the
minimum seed id of each component; renumber on the host with
``utils.labels.relabel_objects`` if contiguous ids are needed.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from tobac_flow_tpu.parallel.halo import halo_exchange_t, halo_exchange_x

__all__ = ["sharded_flow_label", "make_sharded_flow_label"]

_INT_MAX = np.int32(np.iinfo(np.int32).max)


def _gather_int_displaced(plane, dy, dx, radius):
    """plane[(y + dy(p), x + dx(p))] per destination pixel p, zero fill.

    plane: (T, H, Wl + 2*radius) halo-extended labels; dy/dx: (T, H, Wl)
    integer displacement evaluated at the destination (two 1D passes; exact
    for locally smooth flow, the same contract as the fused watershed's
    temporal taps).  Returns (T, H, Wl).
    """
    t, h, we = plane.shape
    wl = we - 2 * radius
    dy = jnp.clip(dy, -radius, radius)
    dx = jnp.clip(dx, -radius, radius)
    # pad y so all row displacements stay in frame
    plane = jnp.pad(plane, ((0, 0), (radius, radius), (0, 0)))
    dye = jnp.pad(dy, ((0, 0), (0, 0), (radius, radius)), mode="edge")

    def body_y(k, acc):
        s = k - radius
        shifted = jax.lax.dynamic_slice(plane, (0, k, 0), (t, h, we))
        return jnp.where(dye == s, shifted, acc)

    init = jnp.zeros((t, h, we), plane.dtype)
    probe = jax.lax.dynamic_slice(plane, (0, 0, 0), (t, h, we))
    init = jnp.where(jnp.zeros((), bool), probe, init)
    rows = jax.lax.fori_loop(0, 2 * radius + 1, body_y, init)

    def body_x(k, acc):
        s = k - radius
        shifted = jax.lax.dynamic_slice(rows, (0, 0, k), (t, h, wl))
        return jnp.where(dx == s, shifted, acc)

    init = jnp.zeros((t, h, wl), plane.dtype)
    probe = jax.lax.dynamic_slice(rows, (0, 0, 0), (t, h, wl))
    init = jnp.where(jnp.zeros((), bool), probe, init)
    return jax.lax.fori_loop(0, 2 * radius + 1, body_x, init)


def _label_step_local(mask, fwd, bwd, t_total, w_total, in_plane, halo, max_rounds):
    """shard_map body: seed globally unique ids, min-propagate to fixpoint."""
    tl, h, wl = mask.shape
    ti = jax.lax.axis_index("t")
    xi = jax.lax.axis_index("x")

    tt = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 0) + ti * tl
    yy = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 1)
    xx = jax.lax.broadcasted_iota(jnp.int32, mask.shape, 2) + xi * wl
    gid = (tt * h + yy) * jnp.int32(w_total) + xx + 1
    labels = jnp.where(mask, gid, 0)

    fdx = jnp.round(fwd[..., 0]).astype(jnp.int32)
    fdy = jnp.round(fwd[..., 1]).astype(jnp.int32)
    bdx = jnp.round(bwd[..., 0]).astype(jnp.int32)
    bdy = jnp.round(bwd[..., 1]).astype(jnp.int32)

    def sweep(labels):
        # 0 means unlabeled; propagate minima with an INT_MAX sentinel
        ext = halo_exchange_t(labels, "t", 1, 0)
        ext = halo_exchange_x(ext, "x", halo, 0, axis=2)
        te, he, we = ext.shape
        best = jnp.where(labels == 0, _INT_MAX, labels)

        def cand(v):
            return jnp.where(v == 0, _INT_MAX, v)

        for dy, dx in in_plane:
            shifted = jax.lax.dynamic_slice(
                ext, (1 + 0, 0, halo + dx), (tl, h, wl)
            )
            if dy:
                shifted = jax.lax.dynamic_slice(
                    jnp.pad(shifted, ((0, 0), (abs(dy), abs(dy)), (0, 0))),
                    (0, abs(dy) + dy, 0),
                    (tl, h, wl),
                )
            best = jnp.minimum(best, cand(shifted))
        # t+1 plane sampled through the forward flow, t-1 through backward
        nxt = jax.lax.dynamic_slice(ext, (2, 0, 0), (tl, h, we))
        prv = jax.lax.dynamic_slice(ext, (0, 0, 0), (tl, h, we))
        best = jnp.minimum(best, cand(_gather_int_displaced(nxt, fdy, fdx, halo)))
        best = jnp.minimum(best, cand(_gather_int_displaced(prv, bdy, bdx, halo)))
        return jnp.where(mask & (best != _INT_MAX), best, labels)

    def cond(carry):
        _, changed, it = carry
        return jnp.logical_and(changed, it < max_rounds)

    def body(carry):
        labels, _, it = carry
        new = sweep(labels)
        local_changed = jnp.any(new != labels)
        changed = jax.lax.psum(
            local_changed.astype(jnp.int32), ("t", "x")
        ) > 0
        return new, changed, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, body, (labels, jnp.bool_(True), jnp.int32(0))
    )
    return labels


def make_sharded_flow_label(mesh, t_total, h, w_total, halo=24, max_rounds=512):
    """Compile a sharded flow-label step for fixed global shapes.

    Returns ``fn(mask, forward_flow, backward_flow) -> labels`` with all
    arrays sharded P('t', None, 'x'); labels carry the minimum seed id per
    component (stable under resharding).
    """
    in_plane = tuple(
        (dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1)
        if (dy, dx) != (0, 0) and abs(dy) + abs(dx) <= 1
    )
    spec3 = P("t", None, "x")
    spec4 = P("t", None, "x", None)

    body = functools.partial(
        _label_step_local,
        t_total=t_total,
        w_total=w_total,
        in_plane=in_plane,
        halo=halo,
        max_rounds=max_rounds,
    )
    mapped = jax.shard_map(
        body, mesh=mesh, in_specs=(spec3, spec4, spec4), out_specs=spec3
    )
    jitted = jax.jit(mapped)

    def fn(mask, forward_flow, backward_flow):
        mask = jax.device_put(
            jnp.asarray(mask, dtype=bool), NamedSharding(mesh, spec3)
        )
        fwd = jax.device_put(
            jnp.asarray(forward_flow, dtype=jnp.float32), NamedSharding(mesh, spec4)
        )
        bwd = jax.device_put(
            jnp.asarray(backward_flow, dtype=jnp.float32), NamedSharding(mesh, spec4)
        )
        return jitted(mask, fwd, bwd)

    return fn


def sharded_flow_label(mesh, mask, forward_flow, backward_flow, halo=24):
    """One-shot sharded flow labelling (see ``make_sharded_flow_label``)."""
    t, h, w = mask.shape
    fn = make_sharded_flow_label(mesh, t, h, w, halo=halo)
    return fn(mask, forward_flow, backward_flow)
