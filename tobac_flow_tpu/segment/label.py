"""Flow-aware labelling: connected-component tracking in the moving frame.

Parity target: reference ``tobac_flow/label.py`` (``flow_label`` lines 84-175,
``flow_link_overlap`` lines 249-321).  The pipeline is

1. per-frame connected components (device CCL, ``ops/ccl.py``),
2. warp the label raster one step forward/backward along the flow
   (nearest-neighbour ``convolve`` with the t±1 centre taps),
3. link label pairs whose warped overlap passes the absolute (strictly
   greater) and proportional (>= overlap × min area) thresholds,
4. resolve the undirected overlap graph to connected components and renumber
   by each group's smallest member label.

Steps 1-2 run on device.  Step 3 is a vectorised pair-histogram (numpy
bincount over fused (label, warped-label) keys) instead of the reference's
per-label Python BFS (``label.py:145-175``) — identical link decisions, no
serial graph walk.  Step 4 uses scipy's connected_components.
"""

from __future__ import annotations

import functools
import sys
import warnings

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sparse
import scipy.sparse.csgraph as csgraph

from tobac_flow_tpu.ops.ccl import flat_label
from tobac_flow_tpu.ops.convolve import (
    DEFAULT_STRUCTURE,
    _convolve_impl,
    convolve,
    structure_taps,
)
from tobac_flow_tpu.utils.program_cache import persistent_jit

__all__ = ["flow_label", "flow_link_overlap", "link_labels_by_overlap"]

# keys per device program for the on-device overlap histogram: bounds the
# on-device sort (inside jnp.unique) well under the ~30 s XLA program
# watchdog and the chunk working set in HBM
_PAIR_CHUNK_PX = 16_000_000
# unique-pair capacity per program.  Starts big: the capacity only sizes the
# (tiny) readback arrays while the unique's internal sort cost is set by the
# chunk size, and every quadruple-on-saturation retry used to recompile the
# program and rerun every chunk (measured as the superlinear blowup of the
# anvil-marker stage at day scale: 39 s at 96 frames -> 386 s at 288).
_PAIR_CAP = 1 << 16
_PAIR_CAP_MAX = 1 << 20


def _label_struct_taps(structure):
    """Temporal-plane centre taps of ``structure`` for label warping
    (reference ``label.py:133-137``: t±1 planes carry one centre tap each)."""
    structure = np.asarray(structure)
    label_struct = structure * np.array([1, 0, 1])[:, np.newaxis, np.newaxis]
    if (
        np.count_nonzero(label_struct[0]) != 1
        or np.count_nonzero(label_struct[2]) != 1
    ):
        raise ValueError(
            "structure must have exactly the centre tap in its temporal planes"
        )
    return label_struct


def _warp_mode_key():
    m = sys.modules["tobac_flow_tpu.ops.convolve"]
    return (m.FAST_WARP, m.BANDED_EXACT, m.PLAN_FRAME_K)


@persistent_jit(static_argnames=("taps", "n_cap", "lo", "hi", "mode"))
def _pair_hist_jit(labels, fwd, bwd, nplus1, taps, n_cap, lo, hi, mode):
    """Unique (a·(n+1)+b) overlap keys and counts over interior frames
    [lo, hi) for both warp directions, entirely on device.

    ``labels`` is the (chunk+halo, H, W) integer label raster; the warped
    neighbour volumes never leave the device — only the ≤ ``n_cap`` unique
    foreground pair keys and their pixel counts do (the full histogram the
    overlap thresholds of reference ``label_utils.py:352-376`` consume)."""
    del mode  # jit cache key only: the warp kernel reads convolve globals
    # int8 chunks (host-resident flows ship rounded) widen to the f32 the
    # warp kernels expect; f32 inputs pass through unchanged
    fwd = fwd.astype(jnp.float32)
    bwd = bwd.astype(jnp.float32)
    warped = _convolve_impl(labels, fwd, bwd, taps, "nearest", 0, None, 0)
    a = labels[lo:hi].astype(jnp.int32)
    outs = []
    for d in range(2):  # 0 = backward-warped, 1 = forward-warped
        b = warped[d, lo:hi].astype(jnp.int32)
        # int32 keys: the driver guarantees (n+1)^2 fits (x64 is disabled,
        # so a jnp "int64" would silently wrap at 2^31 anyway)
        key = jnp.where((a > 0) & (b > 0), a * jnp.int32(nplus1) + b, 0)
        uniq, counts = jnp.unique(
            key.ravel(), size=n_cap, fill_value=0, return_counts=True
        )
        outs.append((uniq, counts))
    return outs


def _overlap_pair_hists_device(flow, flat_labels, structure, nplus1):
    """Per-direction {pair-key: overlap count} dicts, computed on device.

    Replaces the full warped-label downloads of ``_warped_neighbour_labels``
    (2 × the volume over the host link) with per-chunk unique-pair
    histograms — identical counts, ~KBs of readback.  Returns
    (back_hist, forward_hist) or None when a chunk's pair count exceeds
    ``_PAIR_CAP_MAX`` (caller falls back to the host path)."""
    if nplus1 * nplus1 > np.iinfo(np.int32).max:
        return None  # pair keys would wrap int32 (x64 is disabled under jit)
    taps = structure_taps(_label_struct_taps(structure))
    t, h, w = flat_labels.shape
    chunk_t = min(max(4, _PAIR_CHUNK_PX // max(h * w, 1)), t)
    n_chunks = -(-t // chunk_t)
    # uniform chunk geometry: every dispatch sees a (chunk_t + 2, h, w)
    # window whose interior is frames [1, 1 + chunk_t) — zero-padded label
    # frames at the sequence ends and past-the-end tail reproduce the
    # fill_value=0 boundary semantics while keeping ONE compiled program
    # (ragged first/last chunk shapes each paid a 20-70 s remote compile)
    padded_t = n_chunks * chunk_t + 2
    lab_dtype = (
        np.int16 if nplus1 - 1 < np.iinfo(np.int16).max else np.int32
    )
    lab_all = np.zeros((padded_t, h, w), lab_dtype)
    lab_all[1 : 1 + t] = flat_labels
    fwd_all = flow.forward_flow
    bwd_all = flow.backward_flow
    if isinstance(fwd_all, np.ndarray):
        # host-resident flows (above the residency budget, e.g. CONUS day):
        # the nearest-neighbour label warp only ever sees round(flow), so
        # ship the chunks as rounded int8 — a quarter of the f32 upload —
        # and widen on device (np.round and jnp.round are both half-to-even,
        # so the warp result is bit-identical)
        def flow_chunk(arr, s0):
            buf = np.zeros((chunk_t + 2, h, w, 2), np.int8)
            lo = max(0, s0 - 1)  # unpadded frame range covered by this window
            hi = min(t, s0 + chunk_t + 1)
            buf[(lo + 1 - s0) : (lo + 1 - s0) + (hi - lo)] = np.round(
                arr[lo:hi]
            ).astype(np.int8)
            return jnp.asarray(buf)
    else:
        fwd_pad = jnp.pad(
            jnp.asarray(fwd_all), ((1, padded_t - t - 1), (0, 0), (0, 0), (0, 0))
        )
        bwd_pad = jnp.pad(
            jnp.asarray(bwd_all), ((1, padded_t - t - 1), (0, 0), (0, 0), (0, 0))
        )

        def flow_chunk(arr, s0):
            src = fwd_pad if arr is fwd_all else bwd_pad
            return jax.lax.dynamic_slice_in_dim(src, s0, chunk_t + 2, axis=0)

    mode = _warp_mode_key()
    hists = [{}, {}]
    n_cap = _PAIR_CAP
    chunk_px = chunk_t * h * w
    for ci in range(n_chunks):
        s0 = ci * chunk_t  # padded coordinates; interior = [1, 1 + chunk_t)
        lab = jnp.asarray(lab_all[s0 : s0 + chunk_t + 2]).astype(jnp.int32)
        fw = flow_chunk(fwd_all, s0)
        bw = flow_chunk(bwd_all, s0)
        while True:
            res = jax.device_get(
                _pair_hist_jit(
                    lab, fw, bw, nplus1, taps, n_cap, 1, 1 + chunk_t, mode
                )
            )
            # complete iff every pixel's key was counted: unique() silently
            # truncates to the smallest `size` keys when the cap is exceeded
            if all(int(c.astype(np.int64).sum()) == chunk_px for _, c in res):
                break
            n_cap *= 4  # saturated: some pairs were truncated — recompile
            if n_cap > _PAIR_CAP_MAX:
                return None
        live = [(u > 0) & (c > 0) for u, c in res]
        for d in range(2):
            u, c = res[d]
            m = live[d]
            hd = hists[d]
            for k, v in zip(u[m].tolist(), c[m].tolist()):
                hd[k] = hd.get(k, 0) + v
    return hists


def _edges_from_hist(hist, sizes, overlap, absolute_overlap):
    """Apply the overlap thresholds (reference ``label_utils.py:352-376``)
    to a {a·n+b: count} histogram."""
    if not hist:
        return np.empty((0, 2), dtype=np.int64)
    keys = np.fromiter(hist.keys(), dtype=np.int64, count=len(hist))
    counts = np.fromiter(hist.values(), dtype=np.int64, count=len(hist))
    n = sizes.size
    ua = keys // n
    ub = keys % n
    min_size = np.minimum(sizes[ua], sizes[ub])
    ok = (counts > absolute_overlap) & (counts >= overlap * min_size)
    return np.stack([ua[ok], ub[ok]], axis=-1)


def _warped_neighbour_labels(flow, flat_labels, structure, dtype):
    """Warp the label raster to the previous/next timestep positions
    (reference ``label.py:133-137``): returns (back_labels, forward_labels)."""
    label_struct = _label_struct_taps(structure)
    warped = convolve(
        flat_labels,
        flow.forward_flow,
        flow.backward_flow,
        structure=label_struct,
        method="nearest",
        dtype=dtype,
        fill_value=0,
    )
    return np.asarray(warped[0]), np.asarray(warped[1])


def _overlap_edges(flat_labels, warped_labels, sizes, overlap, absolute_overlap):
    """Label pairs (a, b) whose overlap count passes both thresholds.

    For each label a, counts how often label b appears in ``warped_labels``
    within a's footprint; passes iff count > absolute_overlap and
    count >= overlap * min(|a|, |b|) (reference ``label_utils.py:352-376``).
    """
    a = flat_labels.ravel()
    b = warped_labels.ravel()
    wh = (a > 0) & (b > 0)
    if not np.any(wh):
        return np.empty((0, 2), dtype=np.int64)
    a = a[wh].astype(np.int64)
    b = b[wh].astype(np.int64)
    n = sizes.size  # sizes[v] = pixel count of label v; index 0 unused
    keys = a * n + b
    uniq, counts = np.unique(keys, return_counts=True)
    ua = uniq // n
    ub = uniq % n
    min_size = np.minimum(sizes[ua], sizes[ub])
    ok = (counts > absolute_overlap) & (counts >= overlap * min_size)
    return np.stack([ua[ok], ub[ok]], axis=-1)


def link_labels_by_overlap(
    flow,
    flat_labels,
    structure=DEFAULT_STRUCTURE,
    dtype=np.int32,
    overlap: float = 0.0,
    absolute_overlap: int = 0,
):
    """Merge per-frame labels into tracked objects via warped overlap.

    Returns a relabelled array where linked groups share one id, numbered by
    each group's smallest original label (matching the reference BFS
    processing order, ``label.py:145-175``).
    """
    flat_labels = np.asarray(flat_labels)
    n_labels = int(flat_labels.max())
    if n_labels == 0:
        return np.zeros(flat_labels.shape, dtype=dtype)

    sizes = np.bincount(flat_labels.ravel(), minlength=n_labels + 1).astype(np.int64)

    hists = None
    if getattr(flow, "fused_detect", False):
        # device op stack: the warped neighbour volumes stay on device and
        # only the unique-pair histograms come back
        hists = _overlap_pair_hists_device(
            flow, flat_labels, structure, n_labels + 1
        )
    if hists is not None:
        back_hist, fwd_hist = hists
        edges = np.concatenate(
            [
                _edges_from_hist(fwd_hist, sizes, overlap, absolute_overlap),
                _edges_from_hist(back_hist, sizes, overlap, absolute_overlap),
            ],
            axis=0,
        )
    else:
        back_labels, forward_labels = _warped_neighbour_labels(
            flow, flat_labels, structure, dtype
        )
        edges = np.concatenate(
            [
                _overlap_edges(flat_labels, forward_labels, sizes, overlap, absolute_overlap),
                _overlap_edges(flat_labels, back_labels, sizes, overlap, absolute_overlap),
            ],
            axis=0,
        )

    graph = sparse.coo_matrix(
        (np.ones(len(edges), dtype=np.int8), (edges[:, 0], edges[:, 1])),
        shape=(n_labels + 1, n_labels + 1),
    )
    _, comp = csgraph.connected_components(graph, directed=False)

    # renumber groups by their smallest member label — the order the
    # reference BFS discovers them in (label.py:145-170); label 0 excluded
    n_comp = int(comp.max()) + 1
    first_member = np.full(n_comp, np.iinfo(np.int64).max, dtype=np.int64)
    np.minimum.at(first_member, comp[1:], np.arange(1, n_labels + 1))
    active = first_member != np.iinfo(np.int64).max
    new_id = np.zeros(n_comp, dtype=np.int64)
    ranks = np.argsort(np.argsort(first_member[active], kind="stable"))
    new_id[active] = ranks + 1

    lut = np.zeros(n_labels + 1, dtype=dtype)
    lut[1:] = new_id[comp[1:]]
    return lut[flat_labels]


def flow_label(
    flow,
    mask,
    structure=DEFAULT_STRUCTURE,
    dtype=np.int32,
    overlap: float = 0.0,
    absolute_overlap: int = 0,
    subsegment_shrink: float = 0.0,
    peak_min_distance: int = 10,
):
    """Label 3d connected objects in a semi-Lagrangian reference frame
    (reference ``label.py:84-175``)."""
    mask = np.asarray(getattr(mask, "values", mask))
    if subsegment_shrink == 0:
        flat_labels = flat_label(mask != 0, structure=structure).astype(dtype)
    else:
        from tobac_flow_tpu.segment.subsegment import subsegment_labels

        flat_labels = subsegment_labels(
            mask != 0,
            shrink_factor=subsegment_shrink,
            peak_min_distance=peak_min_distance,
        )

    new_labels = link_labels_by_overlap(
        flow,
        flat_labels,
        structure=structure,
        dtype=dtype,
        overlap=overlap,
        absolute_overlap=absolute_overlap,
    )

    if not np.all((new_labels != 0) == (mask != 0)):
        warnings.warn("Not all regions present in labeled array", RuntimeWarning)
    return new_labels


def flow_link_overlap(
    flow,
    flat_labels,
    structure=DEFAULT_STRUCTURE,
    dtype=np.int32,
    overlap: float = 0.0,
    absolute_overlap: int = 0,
):
    """Link an existing label raster into contiguous objects
    (reference ``label.py:249-321``)."""
    flat_labels = np.asarray(getattr(flat_labels, "values", flat_labels))
    new_labels = link_labels_by_overlap(
        flow,
        flat_labels,
        structure=structure,
        dtype=dtype,
        overlap=overlap,
        absolute_overlap=absolute_overlap,
    )
    if not np.all(new_labels.astype(bool) == flat_labels.astype(bool)):
        warnings.warn("Not all regions present in labeled array", RuntimeWarning)
    return new_labels
