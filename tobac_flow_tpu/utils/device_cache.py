"""Identity-keyed host→device transfer cache.

The CLI/science layer keeps its arrays host-resident (numpy) and calls the
jitted op layer many times with the SAME flow fields — semi-Lagrangian
convolve/diff/sobel/watershed each re-upload the (T, H, W, 2) forward and
backward flows, which dominates wall clock when the host↔device link is
slow (the axon tunnel here; PCIe on production hosts still pays ~1 GB per
GOES-day call).  ``device_put_cached`` uploads a given ndarray once and
replays the device copy while the host object is alive and unchanged —
identity-keyed (id + weakref liveness check), LRU-capped so pinned HBM stays
bounded.

Only arrays treated as immutable after construction should pass through
here (flow fields are; they are built once by ``create_flow`` and read
thereafter).  A mutated-in-place array with an unchanged id would replay a
stale device copy — the cache stores a cheap fingerprint (first/last lanes)
and drops entries whose fingerprint moved, which catches wholesale
mutation.
"""

from __future__ import annotations

import weakref
from collections import OrderedDict

import jax.numpy as jnp
import numpy as np

__all__ = ["device_put_cached", "seed_device_cache", "clear_device_cache"]

_MAX_ENTRIES = 8  # bt/wvd/swd + both flows + derived fields; full-disk-scale
# arrays bypass the cache upstream (detect/fused.WHOLE_UPLOAD_BUDGET_BYTES)
# so pinned HBM leaves room for the watershed's working set on a 16 GB chip
_CACHE: OrderedDict = OrderedDict()


def _fingerprint(arr):
    # strided 64-element sample across the whole array (not just the
    # first/last lanes): interior in-place mutations of a re-passed array
    # must invalidate the cached device copy too.  ``flat`` fancy-indexing
    # avoids materialising non-contiguous views.
    n = arr.size
    idx = np.linspace(0, n - 1, num=min(64, n), dtype=np.int64)
    return (arr.shape, arr.dtype.str, arr.flat[idx].tobytes())


def clear_device_cache():
    _CACHE.clear()


def seed_device_cache(arr, dev):
    """Register ``dev`` as the cached device copy of host ``arr``.

    For derived fields whose device form is cheaper to COMPUTE from
    already-uploaded operands than to upload: e.g. the detection chain's
    ``wvd - swd`` / ``wvd + swd`` combinations are one elementwise device op
    over the cached ``wvd``/``swd`` uploads, vs a third full-volume trip over
    the host↔device link.  Subsequent ``device_put_cached(arr)`` calls replay
    ``dev`` under the same identity+fingerprint contract."""
    if not isinstance(arr, np.ndarray) or arr.nbytes < (1 << 20):
        return dev
    key = id(arr)
    try:
        ref = weakref.ref(arr, lambda _r, k=key: _CACHE.pop(k, None))
    except TypeError:
        return dev
    _CACHE[key] = (ref, _fingerprint(arr), dev)
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return dev


def device_put_cached(arr):
    """Device copy of ``arr``; cached when ``arr`` is a host ndarray."""
    if not isinstance(arr, np.ndarray):
        return jnp.asarray(arr)  # already device-resident (or scalar-like)
    if arr.nbytes < (1 << 20):
        return jnp.asarray(arr)  # not worth pinning HBM for small arrays
    key = id(arr)
    entry = _CACHE.get(key)
    if entry is not None:
        ref, fp, dev = entry
        if ref() is arr and fp == _fingerprint(arr):
            _CACHE.move_to_end(key)
            return dev
        del _CACHE[key]
    dev = None
    if arr.dtype == np.int32:
        # label/marker volumes are dense small ints: ship them at int16
        # width and widen on device — halves the upload over the slow link
        # for an identical int32 device array
        mn, mx = arr.min(), arr.max()
        if -32768 <= mn and mx < 32767:
            dev = jnp.asarray(arr.astype(np.int16)).astype(jnp.int32)
    if dev is None:
        dev = jnp.asarray(arr)
    try:
        ref = weakref.ref(arr, lambda _r, k=key: _CACHE.pop(k, None))
    except TypeError:  # some ndarray subclasses reject weakrefs
        return dev
    _CACHE[key] = (ref, _fingerprint(arr), dev)
    while len(_CACHE) > _MAX_ENTRIES:
        _CACHE.popitem(last=False)
    return dev
