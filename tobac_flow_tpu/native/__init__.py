"""Native (C++) host runtime components.

The TPU compute path is JAX/Pallas; these kernels cover the places the
reference relies on native code for host-side work: the serial flow-aware
watershed (oracle + fallback for the Cython kernel semantics of
``tobac_flow/_watershed.pyx``).  Built on demand with g++ and loaded through
ctypes (no pybind11 in the image).
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
from pathlib import Path

import numpy as np

__all__ = ["flow_watershed_host", "flow_watershed_costs_host", "load_library"]

_SRC_DIR = Path(__file__).parent
_LIB = None


def load_library():
    """Compile (if needed) and load the native library."""
    global _LIB
    if _LIB is not None:
        return _LIB
    src = _SRC_DIR / "watershed.cc"
    tag = hashlib.sha256(src.read_bytes()).hexdigest()[:12]
    out = _SRC_DIR / f"libtfwatershed-{tag}.so"
    if not out.exists():
        subprocess.run(
            ["g++", "-O3", "-shared", "-fPIC", str(src), "-o", str(out)],
            check=True,
            capture_output=True,
        )
    lib = ctypes.CDLL(str(out))
    lib.flow_watershed.restype = None
    lib.flow_watershed.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    lib.flow_watershed_costs.restype = None
    lib.flow_watershed_costs.argtypes = [
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_int8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int64,
        ctypes.c_int64,
    ]
    _LIB = lib
    return lib


def _as_ptr(arr, ctype):
    return arr.ctypes.data_as(ctypes.POINTER(ctype))


def flow_watershed_host(
    forward_flow,
    backward_flow,
    field,
    markers,
    mask=None,
    connectivity=1,
    seed_order=None,
):
    """Serial heap watershed with flow-displaced temporal neighbours.

    Same call contract as :func:`tobac_flow_tpu.ops.watershed.watershed`;
    exact (value, age)-heap, label-at-push semantics with the temporal
    neighbour pushed along the *source* pixel's rounded flow.

    ``seed_order``: optional permutation of the seed pixels (array of indices
    into the scan-ordered seed list, or a ``numpy.random.Generator`` to draw
    one).  Seeds are pushed with strictly increasing ages in this order, so
    permuting it perturbs exactly the heap's tie-breaking — the oracle's
    own tie-class sensitivity (``tools/tie_sensitivity.py``).  Default:
    scan order, the reference kernel's behaviour.
    """
    from tobac_flow_tpu.ops.watershed import connectivity_structure

    field = np.ascontiguousarray(
        np.where(np.isnan(field), np.inf, np.asarray(field)), dtype=np.float32
    )
    markers = np.ascontiguousarray(np.asarray(markers), dtype=np.int32)
    if mask is None:
        mask = np.ones(field.shape, dtype=np.int8)
    else:
        mask = np.ascontiguousarray(np.asarray(mask), dtype=np.int8)

    structure = connectivity_structure(connectivity)

    fwd = np.asarray(forward_flow)
    bwd = np.asarray(backward_flow)
    fy = np.round(fwd[..., 1]).astype(np.int64)
    fx = np.round(fwd[..., 0]).astype(np.int64)
    by = np.round(bwd[..., 1]).astype(np.int64)
    bx = np.round(bwd[..., 0]).astype(np.int64)

    # pad so no neighbour (incl. flow displacement) leaves the volume
    pad_y = 1 + int(max(np.abs(fy).max(initial=0), np.abs(by).max(initial=0)))
    pad_x = 1 + int(max(np.abs(fx).max(initial=0), np.abs(bx).max(initial=0)))
    pw = ((1, 1), (pad_y, pad_y), (pad_x, pad_x))

    fieldp = np.pad(field, pw, mode="constant")
    maskp = np.pad(mask, pw, mode="constant")
    outp = np.pad(markers, pw, mode="constant")
    fyp = np.pad(fy, pw, mode="constant")
    fxp = np.pad(fx, pw, mode="constant")
    byp = np.pad(by, pw, mode="constant")
    bxp = np.pad(bx, pw, mode="constant")

    t, h, w = fieldp.shape
    stride_t = np.int64(h * w)
    stride_y = np.int64(w)

    offs = []
    fwd_flag = []
    bwd_flag = []
    for dt, dy, dx in zip(*np.nonzero(structure)):
        dt, dy, dx = int(dt) - 1, int(dy) - 1, int(dx) - 1
        if dt == 0 and dy == 0 and dx == 0:
            continue
        offs.append(dt * stride_t + dy * stride_y + dx)
        fwd_flag.append(dt == 1)
        bwd_flag.append(dt == -1)
    offs = np.asarray(offs, dtype=np.int64)
    fwd_flag = np.asarray(fwd_flag, dtype=np.uint8)
    bwd_flag = np.asarray(bwd_flag, dtype=np.uint8)

    fwd_off = np.ascontiguousarray((fyp * stride_y + fxp).ravel(), dtype=np.int64)
    bwd_off = np.ascontiguousarray((byp * stride_y + bxp).ravel(), dtype=np.int64)

    out_flat = np.ascontiguousarray(outp.ravel(), dtype=np.int32)
    marker_locs = np.ascontiguousarray(np.flatnonzero(out_flat), dtype=np.int64)
    if seed_order is not None:
        if isinstance(seed_order, np.random.Generator):
            seed_order = seed_order.permutation(len(marker_locs))
        marker_locs = np.ascontiguousarray(
            marker_locs[np.asarray(seed_order, dtype=np.int64)]
        )
    field_flat = np.ascontiguousarray(fieldp.ravel())
    mask_flat = np.ascontiguousarray(maskp.ravel())

    lib = load_library()
    lib.flow_watershed(
        _as_ptr(field_flat, ctypes.c_float),
        _as_ptr(mask_flat, ctypes.c_int8),
        _as_ptr(out_flat, ctypes.c_int32),
        _as_ptr(offs, ctypes.c_int64),
        _as_ptr(fwd_flag, ctypes.c_uint8),
        _as_ptr(bwd_flag, ctypes.c_uint8),
        _as_ptr(fwd_off, ctypes.c_int64),
        _as_ptr(bwd_off, ctypes.c_int64),
        np.int64(len(offs)),
        _as_ptr(marker_locs, ctypes.c_int64),
        np.int64(len(marker_locs)),
        np.int64(field_flat.size),
    )
    outp = out_flat.reshape(fieldp.shape)
    return outp[1:-1, pad_y : pad_y + field.shape[1], pad_x : pad_x + field.shape[2]]


def flow_watershed_costs_host(
    forward_flow, backward_flow, field, seeds, mask=None, connectivity=1
):
    """Exact minimax arrival costs from a seed set over the serial heap's
    directed graph (diagnostic): cost(p) = min over paths seed..q->p of
    max(field along seed..q), EXCLUDING field(p) — the quantity the
    data-parallel flood stores as ``claim``.  Same padding/adjacency as
    :func:`flow_watershed_host`."""
    field = np.ascontiguousarray(
        np.where(np.isnan(field), np.inf, np.asarray(field)), dtype=np.float32
    )
    seeds = np.ascontiguousarray(np.asarray(seeds) != 0, dtype=np.int8)
    if mask is None:
        mask = np.ones(field.shape, dtype=np.int8)
    else:
        mask = np.ascontiguousarray(np.asarray(mask), dtype=np.int8)

    from tobac_flow_tpu.ops.watershed import connectivity_structure

    structure = connectivity_structure(connectivity)

    fwd = np.asarray(forward_flow)
    bwd = np.asarray(backward_flow)
    fy = np.round(fwd[..., 1]).astype(np.int64)
    fx = np.round(fwd[..., 0]).astype(np.int64)
    by = np.round(bwd[..., 1]).astype(np.int64)
    bx = np.round(bwd[..., 0]).astype(np.int64)
    pad_y = 1 + int(max(np.abs(fy).max(initial=0), np.abs(by).max(initial=0)))
    pad_x = 1 + int(max(np.abs(fx).max(initial=0), np.abs(bx).max(initial=0)))
    pw = ((1, 1), (pad_y, pad_y), (pad_x, pad_x))

    fieldp = np.pad(field, pw, mode="constant")
    maskp = np.pad(mask, pw, mode="constant")
    seedsp = np.pad(seeds, pw, mode="constant")
    fyp = np.pad(fy, pw, mode="constant")
    fxp = np.pad(fx, pw, mode="constant")
    byp = np.pad(by, pw, mode="constant")
    bxp = np.pad(bx, pw, mode="constant")

    t, h, w = fieldp.shape
    stride_t = np.int64(h * w)
    stride_y = np.int64(w)
    offs, fwd_flag, bwd_flag = [], [], []
    for dt, dy, dx in zip(*np.nonzero(structure)):
        dt, dy, dx = int(dt) - 1, int(dy) - 1, int(dx) - 1
        if dt == 0 and dy == 0 and dx == 0:
            continue
        offs.append(dt * stride_t + dy * stride_y + dx)
        fwd_flag.append(dt == 1)
        bwd_flag.append(dt == -1)
    offs = np.asarray(offs, dtype=np.int64)
    fwd_flag = np.asarray(fwd_flag, dtype=np.uint8)
    bwd_flag = np.asarray(bwd_flag, dtype=np.uint8)
    fwd_off = np.ascontiguousarray((fyp * stride_y + fxp).ravel(), dtype=np.int64)
    bwd_off = np.ascontiguousarray((byp * stride_y + bxp).ravel(), dtype=np.int64)

    field_flat = np.ascontiguousarray(fieldp.ravel())
    mask_flat = np.ascontiguousarray(maskp.ravel())
    seeds_flat = np.ascontiguousarray(seedsp.ravel())
    cost_flat = np.empty(field_flat.size, dtype=np.float32)

    lib = load_library()
    lib.flow_watershed_costs(
        _as_ptr(field_flat, ctypes.c_float),
        _as_ptr(mask_flat, ctypes.c_int8),
        _as_ptr(seeds_flat, ctypes.c_int8),
        _as_ptr(cost_flat, ctypes.c_float),
        _as_ptr(offs, ctypes.c_int64),
        _as_ptr(fwd_flag, ctypes.c_uint8),
        _as_ptr(bwd_flag, ctypes.c_uint8),
        _as_ptr(fwd_off, ctypes.c_int64),
        _as_ptr(bwd_off, ctypes.c_int64),
        np.int64(len(offs)),
        np.int64(field_flat.size),
    )
    costp = cost_flat.reshape(fieldp.shape)
    return costp[
        1:-1, pad_y : pad_y + field.shape[1], pad_x : pad_x + field.shape[2]
    ]
