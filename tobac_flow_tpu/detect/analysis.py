"""Per-label filters and statistics (parity: reference ``tobac_flow/analysis.py``)."""

from __future__ import annotations

import numpy as np
import scipy.ndimage as ndi

from tobac_flow_tpu.utils.labels import apply_func_to_labels

__all__ = [
    "find_object_lengths",
    "mask_labels",
    "filter_labels_by_length",
    "filter_labels_by_mask",
    "filter_labels_by_length_and_mask",
    "filter_labels_by_multimask",
    "filter_labels_by_length_and_multimask",
    "get_stats_for_labels",
    "get_label_stats",
    "weighted_statistics_on_labels",
    "n_unique_along_axis",
]


def _vals(a):
    return np.asarray(getattr(a, "values", a))


def _grouped_reduce(labels_orig, labels, values_fn, ufunc, empty):
    """Per-label ``ufunc`` reduction for labels 1..max over the compressed
    foreground (``values_fn(order) -> per-foreground values``, label-sorted).

    Empty labels get ``empty``.  Requires a non-negative raster (returns
    None otherwise so callers can fall back)."""
    from tobac_flow_tpu.utils.labels import _label_groups_cached

    groups = _label_groups_cached(labels_orig, labels)
    if groups.base < 0:
        return None
    vals = values_fn(groups.order)
    starts, counts = groups.starts, np.diff(groups.starts)
    if vals.size == 0:
        return np.full(max(groups.lab_max, 0), empty)
    red = ufunc.reduceat(vals, np.minimum(starts[:-1], vals.size - 1))
    out = np.where(counts > 0, red, empty)
    return out[1:]  # labels 1..max (bin 0 = background, always empty here)


def find_object_lengths(labels, axis: int = 0):
    """Extent of each label along `axis` (usually time)."""
    labels = _vals(labels)
    if labels.ndim and np.issubdtype(labels.dtype, np.integer):
        stride = int(np.prod(labels.shape[axis + 1 :], dtype=np.int64)) or 1
        size_ax = labels.shape[axis]

        def ax_idx(order):
            return (order // stride) % size_ax

        lo = _grouped_reduce(labels, labels, ax_idx, np.minimum, 0)
        hi = _grouped_reduce(labels, labels, ax_idx, np.maximum, -1)
        if lo is not None:
            return np.where(hi >= lo, hi - lo + 1, 0)
    objs = ndi.find_objects(labels)
    return np.array(
        [o[axis].stop - o[axis].start if o is not None else 0 for o in objs]
    )


def mask_labels(labels, mask):
    """Boolean per label (1..max): does the label overlap the mask?"""
    labels = _vals(labels)
    mask_flat = (_vals(mask) != 0).ravel()
    assert (
        labels.shape == _vals(mask).shape
    ), "Labels and mask parameters must have the same shape"
    out = _label_any_mask(labels, mask_flat)
    return out


def _label_any_mask(labels, mask):
    """Per-label np.any(mask) for labels 1..max (0 where label empty)."""
    labels = np.asarray(labels)
    mask_flat = np.asarray(mask).ravel() != 0
    if np.issubdtype(labels.dtype, np.integer):
        out = _grouped_reduce(
            labels, labels, lambda order: mask_flat[order], np.logical_or, False
        )
        if out is not None:
            return out
    out = np.zeros(int(labels.max()) + 1, dtype=bool)
    np.logical_or.at(out, labels.ravel(), mask_flat)
    return out[1:]


def _remap_keep(labels, keep):
    """Zero labels not kept and renumber survivors contiguously in order."""
    remap = np.zeros(int(np.nanmax(labels)) + 1, dtype=labels.dtype)
    remap[1:] = np.cumsum(keep) * keep
    return remap[labels]


def filter_labels_by_length(labels, min_length):
    labels = _vals(labels)
    keep = find_object_lengths(labels) >= min_length
    return _remap_keep(labels, keep)


def filter_labels_by_mask(labels, mask):
    labels = _vals(labels)
    keep = _label_any_mask(labels, _vals(mask))
    return _remap_keep(labels, keep)


def filter_labels_by_length_and_mask(labels, mask, min_length):
    labels = _vals(labels)
    keep = (find_object_lengths(labels) >= min_length) & _label_any_mask(
        labels, _vals(mask)
    )
    return _remap_keep(labels, keep)


def filter_labels_by_multimask(labels, masks):
    if not isinstance(masks, list):
        raise ValueError("masks input must be a list of masks to process")
    labels = _vals(labels)
    keep = np.logical_and.reduce([_label_any_mask(labels, _vals(m)) for m in masks])
    return _remap_keep(labels, keep)


def filter_labels_by_length_and_multimask(labels, masks, min_length):
    if not isinstance(masks, list):
        raise ValueError("masks input must be a list of masks to process")
    labels = _vals(labels)
    keep = (find_object_lengths(labels) >= min_length) & np.logical_and.reduce(
        [_label_any_mask(labels, _vals(m)) for m in masks]
    )
    return _remap_keep(labels, keep)


# the reference keeps *_legacy in-place variants with identical outputs; the
# vectorised versions above are the single implementation here
filter_labels_by_length_and_multimask_legacy = filter_labels_by_length_and_multimask


def n_unique_along_axis(a, axis=0):
    """Number of unique non-zero values along an axis."""
    a = np.asarray(a)
    sorted_a = np.sort(np.moveaxis(a, axis, 0), axis=0)
    changes = np.concatenate(
        [
            (sorted_a[:1] != 0),
            np.diff(sorted_a, axis=0) != 0,
        ],
        axis=0,
    ) & (sorted_a != 0)
    return changes.sum(axis=0)


def get_stats_for_labels(labels, da, dim=None, dtype=None):
    """Mean/std/max/min of a field over each label, returned as DataArrays."""
    from tobac_flow_tpu.data.ncdataset import DataArray

    if not dim:
        dim = labels.name.split("_label")[0]
    if dtype is None:
        dtype = da.dtype
    long_name = da.attrs.get("long_name", da.name) if hasattr(da, "attrs") else da.name
    units = da.attrs.get("units", "") if hasattr(da, "attrs") else ""
    out = []
    for stat, func in [
        ("mean", np.nanmean),
        ("std", np.nanstd),
        ("max", np.nanmax),
        ("min", np.nanmin),
    ]:
        vals = apply_func_to_labels(_vals(labels), _vals(da), func=func, default=np.nan)
        out.append(
            DataArray(
                np.asarray(vals, dtype=dtype),
                dims=(dim,),
                name=f"{dim}_{da.name}_{stat}",
                attrs={
                    "long_name": f"{stat} of {long_name} for each {dim}",
                    "units": units,
                },
            )
        )
    return tuple(out)


def get_label_stats(da, ds):
    """Spatial/temporal coverage statistics of a label field, added to ds."""
    from tobac_flow_tpu.data.ncdataset import DataArray

    vals = _vals(da)
    t_size = vals.shape[0]
    long_name = da.attrs.get("long_name", da.name)
    ds[f"{da.name}_fraction"] = DataArray(
        (np.count_nonzero(vals, 0) / t_size).astype(np.float32),
        dims=("y", "x"),
        attrs={"long_name": f"Fractional coverage of {long_name}", "units": ""},
    )
    ds[f"{da.name}_unique_count"] = DataArray(
        n_unique_along_axis(vals, 0).astype(np.int32),
        dims=("y", "x"),
        attrs={"long_name": f"Number of unique {long_name}", "units": ""},
    )
    ds[f"{da.name}_temporal_fraction"] = DataArray(
        (np.count_nonzero(vals, (1, 2)) / (vals.shape[1] * vals.shape[2])).astype(
            np.float32
        ),
        dims=("t",),
        attrs={
            "long_name": f"Fractional coverage of {long_name} over time",
            "units": "",
        },
    )
    ds[f"{da.name}_temporal_unique_count"] = DataArray(
        n_unique_along_axis(vals.reshape([t_size, -1]), 1).astype(np.int32),
        dims=("t",),
        attrs={"long_name": f"Number of unique {long_name} over time", "units": ""},
    )


def weighted_statistics_on_labels(labels, da, weights, name=None, dim=None, dtype=None):
    """Area-weighted mean/std/max/min per label (NaN-aware)."""
    from tobac_flow_tpu.data.ncdataset import DataArray

    if not dim:
        dim = labels.name.split("_label")[0]
    if dtype is None:
        dtype = da.dtype
    long_name = da.attrs.get("long_name", da.name) if hasattr(da, "attrs") else da.name
    units = da.attrs.get("units", "") if hasattr(da, "attrs") else ""

    def weighted_average(values, w):
        nan = np.isnan(values)
        values, w = values[~nan], w[~nan]
        if np.nansum(w) == 0:
            return np.nan
        return np.average(values, weights=w)

    def weighted_stats(x, w):
        if np.nansum(w) <= 0:
            return [np.nan, np.nan, np.nan, np.nan]
        mean = weighted_average(x, w)
        std = weighted_average((x - mean) ** 2, w) ** 0.5
        return [mean, std, np.nanmax(x[w > 0]), np.nanmin(x[w > 0])]

    stats = apply_func_to_labels(
        _vals(labels),
        _vals(da),
        np.broadcast_to(_vals(weights), _vals(da).shape),
        func=weighted_stats,
        default=[np.nan] * 4,
    )
    stats = np.asarray(stats, dtype=np.float64)
    if stats.ndim == 1:  # single label: squeeze removed the label axis
        stats = stats.reshape(4, -1)
    out = []
    for i, stat in enumerate(["mean", "std", "max", "min"]):
        out.append(
            DataArray(
                stats[i].astype(dtype),
                dims=(dim,),
                name=f"{name}_{da.name}_{stat}",
                attrs={
                    "long_name": f"{stat} of {long_name} for each {dim}",
                    "units": units,
                },
            )
        )
    return tuple(out)
