"""Host-side label bookkeeping utilities.

Behavioural parity with reference ``tobac_flow/utils/label_utils.py``:
per-label comprehensions, contiguous renumbering, per-step label slicing and
overlap queries.  Dense (t,y,x) label rasters stay on device in the pipeline;
these utilities operate on the (small) per-label summaries or perform the
data-dependent renumbering steps that need dynamic shapes.
"""

from __future__ import annotations

from typing import Callable

import numpy as np

__all__ = [
    "labeled_comprehension",
    "apply_func_to_labels",
    "unique_labels",
    "flat_label",
    "make_step_labels",
    "get_step_labels_for_label",
    "relabel_objects",
    "remap_labels",
    "slice_labels",
    "find_overlapping_labels",
]


class _LabelGroups:
    """Foreground-compressed per-label position index.

    Label rasters are overwhelmingly background (zero): grouping only the
    nonzero pixels turns the full-volume argsort the reference's comprehension
    pattern implies (~seconds per GOES-day raster, gigabytes of int64 order
    indices) into a counting sort over the few-percent foreground.

    ``positions(v)`` returns the raveled positions of label ``v`` in ascending
    raster order; ``order[starts[v - base] : starts[v - base + 1]]`` is the
    underlying contiguous slice.  The zero label's bin is empty (computed
    lazily on request — no production caller asks for it)."""

    __slots__ = ("shape", "lab_min", "lab_max", "base", "order", "starts",
                 "fg", "_zero_pos", "_probe_pos", "_fingerprint")

    def __init__(self, labels):
        flat = labels.ravel()
        self.shape = labels.shape
        fg = np.flatnonzero(flat)
        self.fg = fg  # raster-order foreground positions
        vals = flat[fg]
        self._probe_pos = fg[:: max(1, fg.size // 64)].copy() if fg.size else fg
        if vals.size:
            vmin = int(vals.min())
            vmax = int(vals.max())
        else:
            vmin = vmax = 0
        # extrema over ALL pixels: background contributes 0 when present
        has_zero = fg.size < flat.size
        self.lab_min = min(vmin, 0) if has_zero else vmin
        self.lab_max = max(vmax, 0) if has_zero else vmax
        self.base = min(vmin, 0)
        shifted = vals - self.base
        counts = np.bincount(shifted, minlength=vmax - self.base + 1)
        # counting sort: radix argsort over the compressed foreground keeps
        # equal labels in raster order (stable), composed with fg positions
        self.order = fg[np.argsort(shifted, kind="stable")]
        self.starts = np.concatenate([[0], np.cumsum(counts)])
        self._zero_pos = None
        self._fingerprint = _groups_fingerprint(flat, self._probe_pos)

    def positions(self, v):
        v = int(v)
        if v == 0:
            if self._zero_pos is None:
                flat_n = int(np.prod(self.shape))
                mask = np.ones(flat_n, dtype=bool)
                mask[self.order] = False
                self._zero_pos = np.flatnonzero(mask)
            return self._zero_pos
        b = v - self.base
        if 0 <= b < self.starts.size - 1:
            return self.order[self.starts[b] : self.starts[b + 1]]
        return self.order[:0]

    def count(self, v):
        b = int(v) - self.base
        if v != 0 and 0 <= b < self.starts.size - 1:
            return int(self.starts[b + 1] - self.starts[b])
        return 0

    @property
    def nonzero_values(self):
        counts = np.diff(self.starts)
        vals = np.flatnonzero(counts) + self.base
        return vals[vals != 0]


def _groups_fingerprint(flat, probe_pos):
    # cheap staleness guard, O(samples) to verify: in-place mutation of a
    # memoised raster (e.g. link_cores_and_anvils painting cores into the
    # anvil volumes) must not replay stale groupings.  Two probes: the values
    # at a strided sample of build-time foreground positions (catches
    # relabelling/zeroing) and the nonzero count of a strided full-volume
    # sample (catches foreground appearing in background)
    vol_step = max(1, flat.size // 4096)
    return (
        int(flat[probe_pos].sum(dtype=np.int64)) if probe_pos.size else 0,
        int(np.count_nonzero(flat[::vol_step])),
    )


_GROUPS_MEMO: dict = {}
_GROUPS_MEMO_MAX = 8


def _label_groups_cached(labels_obj, labels=None) -> _LabelGroups:
    """Identity-keyed (fingerprint-guarded) memo of :class:`_LabelGroups`."""
    import weakref

    if labels is None:
        labels = labels_obj
    key = id(labels_obj)
    ent = _GROUPS_MEMO.get(key)
    if ent is not None and ent[0]() is labels_obj:
        groups = ent[1]
        flat = labels.ravel()
        if (
            groups.shape == labels.shape
            and _groups_fingerprint(flat, groups._probe_pos)
            == groups._fingerprint
        ):
            return groups
        _GROUPS_MEMO.pop(key, None)
    groups = _LabelGroups(np.asarray(labels))
    try:
        ref = weakref.ref(labels_obj, lambda _r, k=key: _GROUPS_MEMO.pop(k, None))
        _GROUPS_MEMO[key] = (ref, groups)
        while len(_GROUPS_MEMO) > _GROUPS_MEMO_MAX:
            _GROUPS_MEMO.pop(next(iter(_GROUPS_MEMO)))
    except TypeError:
        pass
    return groups


def _label_groups(labels):
    """Sorted positions grouped by label: returns (order, starts) such that
    positions of label v occupy order[starts[v]:starts[v+1]].

    Retained for callers indexing by raw bin (including 0); positions of the
    zero label are NOT in ``order`` (use :class:`_LabelGroups` semantics)."""
    groups = _label_groups_cached(labels)
    if groups.base != 0:
        raise ValueError("_label_groups requires non-negative labels")
    return groups.order, groups.starts


def labeled_comprehension(
    field,
    labels,
    func: Callable,
    index=None,
    dtype=None,
    default=None,
    pass_positions: bool = False,
):
    """Apply ``func`` to the values of ``field`` within each labelled region
    (reference ``label_utils.py:8-55``; scipy.ndimage.labeled_comprehension
    semantics). ``index=None`` applies it to every non-zero label present."""
    labels_orig = labels
    field = np.asarray(getattr(field, "values", field))
    labels = np.asarray(getattr(labels, "values", labels))
    if dtype is None:
        dtype = field.dtype

    # foreground-compressed grouping, memoised by raster identity: the
    # detection/schema layers run many comprehensions over the SAME
    # day-scale label raster and only the few-percent nonzero pixels matter
    groups = _label_groups_cached(labels_orig, labels)
    if index is None:
        index = groups.nonzero_values
        index = index[index > 0]
    index = np.atleast_1d(np.asarray(index))

    field_b = np.broadcast_to(field, labels.shape)
    # gather every foreground field value once (label-sorted): per-label
    # values are then contiguous slices instead of per-label fancy gathers
    sorted_vals = field_b[np.unravel_index(groups.order, labels.shape)]
    starts, base = groups.starts, groups.base
    n_bins = starts.size - 1
    out = []
    for v in index:
        v = int(v)
        if v == 0:
            pos = groups.positions(0)
            if pos.size:
                vals0 = field_b[np.unravel_index(pos, labels.shape)]
                out.append(func(vals0, pos) if pass_positions else func(vals0))
            else:
                out.append(default)
            continue
        b = v - base
        if 0 <= b < n_bins and starts[b + 1] > starts[b]:
            sl = slice(starts[b], starts[b + 1])
            if pass_positions:
                out.append(func(sorted_vals[sl], groups.order[sl]))
            else:
                out.append(func(sorted_vals[sl]))
        else:
            out.append(default)
    return np.asarray(out, dtype=dtype)


# identity-keyed memo of the label raster's stable argsort (+ extrema): the
# schema/statistics layer calls apply_func_to_labels many times per label
# field and the argsort of a GOES-day raster costs ~10 s per call on host
_SORT_MEMO: dict = {}
_SORT_MEMO_MAX = 4


def _label_sort_cached(labels):
    import weakref

    key = id(labels)
    ent = _SORT_MEMO.get(key)
    if ent is not None and ent[0]() is labels:
        return ent[1], ent[2], ent[3]
    lab_min = int(np.min(labels)) if labels.size else 0
    lab_max = int(np.max(labels)) if labels.size else 0
    # order of (labels - c) is the order of labels for any constant shift
    order = np.argsort(labels.ravel(), kind="stable")
    try:
        ref = weakref.ref(labels, lambda _r, k=key: _SORT_MEMO.pop(k, None))
        _SORT_MEMO[key] = (ref, lab_min, lab_max, order)
        while len(_SORT_MEMO) > _SORT_MEMO_MAX:
            _SORT_MEMO.pop(next(iter(_SORT_MEMO)))
    except TypeError:
        pass
    return lab_min, lab_max, order


def apply_func_to_labels(
    labels,
    *fields,
    func: Callable = np.mean,
    index=None,
    default=None,
):
    """Multi-field / multi-return per-label comprehension (reference
    ``label_utils.py:58-140``).  ``index=None`` runs over 1..max(labels)."""
    labels_orig = labels
    labels = np.asarray(getattr(labels, "values", labels))
    fields = [np.asarray(getattr(f, "values", f)) for f in fields]
    shape = np.broadcast_shapes(labels.shape, *[f.shape for f in fields])
    if labels.shape != shape:
        labels = np.broadcast_to(labels, shape)
        groups = _LabelGroups(labels)  # broadcast raster: no identity memo
    else:
        groups = _label_groups_cached(labels_orig, labels)

    if index is None:
        min_label = min(groups.lab_min, 0)
        n_bins = groups.lab_max - min_label + 1
        index = range(1, n_bins)
    elif len(index) == 0:  # no objects at all (empty label coord)
        return np.empty(0)
    if len(index) == 0:  # empty label raster with index=None
        return np.empty(0)

    # gather every foreground value of every field once (label-sorted):
    # per-label slices are contiguous views instead of per-label gathers
    # over full-volume (possibly broadcast) rasters
    idx_nd = np.unravel_index(groups.order, shape)
    sorted_fields = [np.broadcast_to(f, shape)[idx_nd] for f in fields]
    starts, base = groups.starts, groups.base
    n_bins_g = starts.size - 1

    def group_slice(v):
        b = int(v) - base
        if v != 0 and 0 <= b < n_bins_g and starts[b + 1] > starts[b]:
            return slice(starts[b], starts[b + 1])
        return None

    # determine the default tuple arity by probing func on the first
    # populated label (reference label_utils.py:101-121)
    default_vals = default
    try:
        iter(default)
        assert not isinstance(default, str)
    except (TypeError, AssertionError):
        nz = groups.nonzero_values
        if nz.size:
            sl = group_slice(nz[0])
            probe = func(*[sf[sl] for sf in sorted_fields])
            try:
                assert not isinstance(probe, str)
                default_vals = [default] * len(probe)
            except (AssertionError, TypeError):
                default_vals = default
    else:
        if len(default) == 1 and not isinstance(default, str):
            default_vals = default[0]

    results = []
    for i in index:
        sl = group_slice(i)
        if sl is not None:
            results.append(func(*[sf[sl] for sf in sorted_fields]))
        elif i == 0 and groups.positions(0).size:
            pos = groups.positions(0)
            pos_nd = np.unravel_index(pos, shape)
            results.append(
                func(*[np.broadcast_to(f, shape)[pos_nd] for f in fields])
            )
        else:
            results.append(default_vals)
    return np.stack(results, -1).squeeze()


def unique_labels(labels):
    """Sorted nonzero label values present — ``np.unique`` minus the sort:
    non-negative integer rasters take the O(N) bincount path (a GOES-day
    ``np.unique`` is a multi-second full-volume sort)."""
    labels = np.asarray(getattr(labels, "values", labels))
    if labels.size == 0:
        return np.empty(0, dtype=labels.dtype)
    if np.issubdtype(labels.dtype, np.integer) and labels.min() >= 0:
        present = np.flatnonzero(np.bincount(labels.ravel()))
        return present[present != 0].astype(labels.dtype)
    uniq = np.unique(labels)
    return uniq[uniq != 0]


def flat_label(mask, structure=None, dtype=np.int32):
    """Per-timestep connected components (device CCL under the hood)."""
    from tobac_flow_tpu.ops.ccl import flat_label as _device_flat_label
    from tobac_flow_tpu.ops.convolve import DEFAULT_STRUCTURE

    if structure is None:
        structure = DEFAULT_STRUCTURE
    return _device_flat_label(np.asarray(mask) != 0, structure=structure, dtype=dtype)


def make_step_labels(labels):
    """Split a label raster into per-step labels where each (label, step,
    connected region) gets its own id, numbered in step-label order
    (reference ``label_utils.py:183-200``)."""
    labels = np.asarray(getattr(labels, "values", labels))
    step_labels = flat_label(labels != 0)
    # combine (per-step component, original label) so one component that
    # covers two original labels splits, and renumber contiguously in
    # (component, original label) order.  Only foreground pixels carry a
    # combined key: the unique/inverse runs over the compressed foreground,
    # not the full volume
    fg = np.flatnonzero(step_labels.ravel())
    combined = (
        step_labels.ravel()[fg].astype(np.int64) * (np.int64(labels.max()) + 1)
        + labels.ravel()[fg]
    )
    _uniq, inverse = np.unique(combined, return_inverse=True)
    out = np.zeros(labels.size, dtype=np.int32)
    out[fg] = inverse.astype(np.int32) + 1
    return out.reshape(labels.shape)


def get_step_labels_for_label(labels, step_labels):
    """For each label value, the step-label values its pixels carry
    (reference ``label_utils.py:202-235``)."""
    labels = np.asarray(labels)
    step_labels = np.asarray(step_labels)
    groups = _label_groups_cached(labels)
    flat_steps = step_labels.ravel()
    out = []
    for v in range(groups.lab_max + 1):
        pos = groups.positions(v)
        out.append(np.unique(flat_steps[pos]) if pos.size else None)
    return out


def relabel_objects(labels, inplace=False):
    """Renumber labels to contiguous 1..N preserving order
    (reference ``label_utils.py:238-262``)."""
    labels = np.asarray(labels)
    uniq = unique_labels(labels)
    out = labels if inplace else np.zeros_like(labels)
    lut = np.zeros(int(labels.max()) + 1 if labels.size else 1, dtype=labels.dtype)
    lut[uniq] = np.arange(1, uniq.size + 1, dtype=labels.dtype)
    out[...] = lut[labels]
    return out


def remap_labels(labels, locations=None, new_labels=None):
    """Keep/renumber the labels flagged in ``locations`` (bool per label, or
    integer label values) and zero the rest (reference
    ``label_utils.py:265-309``)."""
    labels = np.asarray(getattr(labels, "values", labels))
    max_label = int(np.nanmax(labels)) if labels.size else 0
    if new_labels is not None:
        max_label = max(max_label, np.size(new_labels))
    remapper = np.zeros(max_label + 1, dtype=labels.dtype)
    if new_labels is None and locations is not None:
        new_labels = np.arange(1, int(np.sum(locations)) + 1)
    if locations is not None:
        locations = np.asarray(locations)
        if locations.dtype == bool:
            remapper[1:][locations] = new_labels
        else:
            remapper[locations] = new_labels
    else:
        remapper[1:] = new_labels
    return remapper[labels]


def slice_labels(labels):
    """Split labels along the leading dimension keeping each label's pixels
    at a step as one id even if disconnected (reference
    ``label_utils.py:312-349``)."""
    labels_orig = labels
    labels = np.asarray(getattr(labels, "values", labels))
    groups = _label_groups_cached(labels_orig, labels)
    fg = groups.fg
    vals = labels.ravel()[fg].astype(np.int64)
    frame_px = int(np.prod(labels.shape[1:], dtype=np.int64)) or 1
    t_idx = fg // frame_px
    step_max = np.zeros(labels.shape[0], dtype=np.int64)
    np.maximum.at(step_max, t_idx, vals)
    offsets = np.concatenate([[0], np.cumsum(step_max)[:-1]])
    step_vals = vals + offsets[t_idx]
    present = np.unique(step_vals)
    out = np.zeros(labels.size, dtype=np.int32)
    out[fg] = np.searchsorted(present, step_vals).astype(np.int32) + 1
    return out.reshape(labels.shape)


def find_overlapping_labels(
    labels,
    locs,
    bins,
    overlap: float = 0,
    absolute_overlap: int = 0,
):
    """Labels overlapping the raveled positions ``locs`` subject to absolute
    (strictly greater) and proportional (>= overlap * min size) thresholds
    (reference ``label_utils.py:352-376``)."""
    n_locs = len(locs)
    if not n_locs:
        return []
    values = labels.ravel()[locs]
    counts = np.bincount(np.maximum(values, 0))
    return [
        int(v)
        for v in np.unique(values)
        if v != 0
        and counts[v] > absolute_overlap
        and counts[v] >= overlap * min(n_locs, bins[v] - bins[v - 1])
    ]
