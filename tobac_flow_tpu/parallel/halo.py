"""Halo exchange over the device mesh (inside ``shard_map``).

Stencil ops in the moving frame need bounded neighbourhoods only: ±1 frame in
time (temporal structuring planes) and ±(max_flow + interp support) pixels in
space (flow vectors are clipped to ±20 px, reference ``flow.py:60-61``), so a
fixed halo bounds all cross-shard communication.  Halos ride ICI via
``jax.lax.ppermute``; edge shards receive a constant fill (the domain
boundary behaves exactly like the single-device out-of-frame fill).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["halo_exchange_t", "halo_exchange_x"]


def _shift_from(x, axis_name, direction):
    """Pull a copy of ``x`` from the neighbouring shard.

    direction=+1 pulls from the next shard (shard i receives shard i+1's
    data); direction=-1 pulls from the previous shard.  The edge shard
    receives zeros (callers overwrite with their fill).
    """
    n = jax.lax.axis_size(axis_name)
    # ppermute perm maps (source, destination)
    if direction > 0:
        perm = [(i, i - 1) for i in range(1, n)]
    else:
        perm = [(i, i + 1) for i in range(n - 1)]
    return jax.lax.ppermute(x, axis_name, perm)


def halo_exchange_t(local, axis_name="t", halo=1, fill_value=0.0):
    """Concatenate ``halo`` frames from the neighbouring time shards.

    local: (T_local, ...) block.  Returns (T_local + 2*halo, ...) with the
    first/last global shard padded by ``fill_value`` frames.
    """
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    head = local[:halo]  # frames the previous shard needs
    tail = local[-halo:]  # frames the next shard needs
    from_next = _shift_from(head, axis_name, +1)
    from_prev = _shift_from(tail, axis_name, -1)
    fill = jnp.full_like(head, fill_value)
    from_prev = jnp.where((idx == 0), fill, from_prev)
    from_next = jnp.where((idx == n - 1), fill, from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=0)


def halo_exchange_x(local, axis_name="x", halo=24, fill_value=0.0, axis=-1):
    """Concatenate ``halo`` columns from the neighbouring spatial shards
    along ``axis`` (the sharded trailing spatial dimension)."""
    n = jax.lax.axis_size(axis_name)
    idx = jax.lax.axis_index(axis_name)
    axis = axis % local.ndim

    def take(sl):
        index = [slice(None)] * local.ndim
        index[axis] = sl
        return local[tuple(index)]

    head = take(slice(0, halo))
    tail = take(slice(local.shape[axis] - halo, local.shape[axis]))
    from_next = _shift_from(head, axis_name, +1)
    from_prev = _shift_from(tail, axis_name, -1)
    fill = jnp.full_like(head, fill_value)
    from_prev = jnp.where((idx == 0), fill, from_prev)
    from_next = jnp.where((idx == n - 1), fill, from_next)
    return jnp.concatenate([from_prev, local, from_next], axis=axis)
