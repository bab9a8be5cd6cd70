"""Weighted / grouped statistics (parity: reference ``utils/stats_utils.py``).

The reference's groupby helpers operate on xarray groupbys; here groups are
plain integer id arrays and the grouped reductions use the sorted-positions
idiom, so the same math runs with numpy only.
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "find_overlap_mode",
    "n_unique_along_axis",
    "weighted_average_and_std",
    "weighted_stats",
    "weighted_average_uncertainty",
    "weighted_uncertainties",
    "weighted_stats_and_uncertainties",
    "get_weighted_proportions",
    "calc_combined_mean",
    "calc_combined_std",
    "calc_max_cooling_rate",
    "calc_cooling_rate",
    "calc_growth_rate",
    "cooling_rate_groupby",
    "growth_rate_groupby",
    "idxmax_cooling_rate_groupby",
    "idxmax_growth_rate_groupby",
    "weighted_covariance",
    "weighted_correlation",
    "mse",
    "groupby_apply",
    "combined_mean_groupby",
    "combined_std_groupby",
    "weighted_average_groupby",
    "weighted_average_uncertainty_groupby",
    "argmax_groupby",
    "argmin_groupby",
    "counts_groupby",
    "idxmin_groupby",
    "idxmax_groupby",
]


def find_overlap_mode(x, background=0):
    """Mode of the non-background values (background if none)."""
    x = np.asarray(x)
    nz = x[x != background]
    if nz.size == 0:
        return background
    vals, counts = np.unique(nz, return_counts=True)
    return vals[np.argmax(counts)]


def n_unique_along_axis(a, axis=0):
    b = np.sort(np.moveaxis(a, axis, 0), axis=0)
    return (b[1:] != b[:-1]).sum(axis=0) + (
        np.count_nonzero(a, axis=axis) == a.shape[axis]
    ).astype(int)


def weighted_average_and_std(data, weights, unbiased=True):
    average = np.average(data, weights=weights)
    variance = np.average((data - average) ** 2, weights=weights)
    std = np.nan
    if unbiased:
        correction = 1 - (np.sum(weights**2) / np.sum(weights) ** 2)
        if correction > 0:
            std = (variance / correction) ** 0.5
    else:
        std = variance**0.5
    return average, std


def weighted_stats(data, weights, ignore_nan=True, default=np.nan):
    data = np.asarray(data, dtype=float)
    weights = np.asarray(weights, dtype=float)
    if ignore_nan:
        wh = np.isfinite(data)
        data, weights = data[wh], weights[wh]
    if data.size > 0 and np.sum(weights) > 0:
        average, std = weighted_average_and_std(data, weights)
        return average, std, np.min(data), np.max(data)
    return default, default, default, default


def weighted_average_uncertainty(errors, weights):
    errors = np.asarray(errors, dtype=float)
    weights = np.asarray(weights, dtype=float)
    if errors.size > 0 and np.sum(weights) > 0:
        return np.sum(weights**2 * errors**2) ** 0.5 / np.sum(weights)
    return np.nan


def weighted_uncertainties(data, errors, weights, std, ignore_nan=True):
    data = np.asarray(data, dtype=float)
    errors = np.asarray(errors, dtype=float)
    weights = np.asarray(weights, dtype=float)
    if ignore_nan:
        wh = np.isfinite(data)
        data, errors, weights = data[wh], errors[wh], weights[wh]
    if data.size > 0 and np.sum(weights) > 0:
        uncertainty = weighted_average_uncertainty(errors, weights)
        combined = ((std / data.size**0.5) ** 2 + uncertainty**2) ** 0.5
        return uncertainty, combined, errors[np.argmin(data)], errors[np.argmax(data)]
    return np.nan, np.nan, np.nan, np.nan


def weighted_stats_and_uncertainties(data, errors, weights, ignore_nan=True):
    average, std, minimum, maximum = weighted_stats(data, weights, ignore_nan)
    uncertainty, combined, min_err, max_err = weighted_uncertainties(
        data, errors, weights, std, ignore_nan
    )
    return average, std, minimum, maximum, uncertainty, combined, min_err, max_err


def get_weighted_proportions(data, weights, flag_values):
    flag_values = np.asarray(list(flag_values))
    wh = np.expand_dims(data, -1) == flag_values
    weighted = wh.astype(float) * np.expand_dims(weights, -1)
    total = np.nansum(weights)
    if total > 0:
        return np.nansum(weighted.reshape(-1, flag_values.size), 0) / total
    return np.full(flag_values.size, np.nan)


def calc_combined_mean(step_mean, step_area):
    wh = np.isfinite(step_mean) & np.isfinite(step_area)
    if np.any(wh):
        return np.sum(step_mean[wh] * step_area[wh]) / np.sum(step_area[wh])
    return np.nan


def calc_combined_std(step_std, step_mean, step_area):
    combined_mean = calc_combined_mean(step_mean, step_area)
    wh = np.isfinite(step_std) & np.isfinite(step_mean) & np.isfinite(step_area)
    if np.any(wh):
        return (
            (
                np.sum(step_area[wh] * step_std[wh])
                + np.sum(step_area[wh] * (step_mean[wh] - combined_mean) ** 2)
            )
            / np.sum(step_area[wh])
        ) ** 0.5
    return np.nan


def calc_max_cooling_rate(step_bt, step_t, t_steps=1):
    order = np.argsort(step_t)
    step_bt = np.asarray(step_bt)[order]
    step_t = np.asarray(step_t)[order]
    if len(step_bt) >= t_steps + 1:
        return np.max(
            (step_bt[:-t_steps] - step_bt[t_steps:])
            / (
                (step_t[t_steps:] - step_t[:-t_steps])
                .astype("timedelta64[s]")
                .astype(int)
                / 60
            )
        )
    return (step_bt[0] - step_bt[-t_steps]) / (
        (step_t[0] - step_t[-t_steps]).astype("timedelta64[s]").astype(int) / 60
    )


def _rate_gradient(step_vals, step_t):
    """d(field)/dt [per minute] over the time-sorted steps (the reference's
    ``differentiate('t') * 6e10`` idiom, stats_utils.py:317-351)."""
    order = np.argsort(step_t)
    vals = np.asarray(step_vals, dtype=float)[order]
    tm = np.asarray(step_t)[order].astype("datetime64[ns]").astype(np.int64) / 6e10
    if vals.size < 2:
        return np.asarray([np.nan]), order
    return np.gradient(vals, tm), order


def calc_cooling_rate(step_vals, step_t):
    """Maximum cooling (−min d/dt) rate per minute."""
    grad, _ = _rate_gradient(step_vals, step_t)
    return -np.nanmin(grad)


def calc_growth_rate(step_vals, step_t):
    """Maximum growth (max d/dt) rate per minute."""
    grad, _ = _rate_gradient(step_vals, step_t)
    return np.nanmax(grad)


def cooling_rate_groupby(field, times, groups, index=None):
    """Per-object maximum cooling rate (reference stats_utils.py:317-322)."""
    return groupby_apply(calc_cooling_rate, groups, field, times, index=index)


def growth_rate_groupby(field, times, groups, index=None):
    return groupby_apply(calc_growth_rate, groups, field, times, index=index)


def idxmax_cooling_rate_groupby(field, times, coord, groups, index=None):
    """Step id where the cooling rate peaks (reference stats_utils.py:345-351)."""

    def pick(vals, t, c):
        grad, order = _rate_gradient(vals, t)
        if not np.isfinite(grad).any():
            return np.asarray(c)[0]
        return np.asarray(c)[order[np.nanargmin(grad)]]

    return groupby_apply(pick, groups, field, times, coord, index=index)


def idxmax_growth_rate_groupby(field, times, coord, groups, index=None):
    def pick(vals, t, c):
        grad, order = _rate_gradient(vals, t)
        if not np.isfinite(grad).any():
            return np.asarray(c)[0]
        return np.asarray(c)[order[np.nanargmax(grad)]]

    return groupby_apply(pick, groups, field, times, coord, index=index)


def weighted_covariance(x, y, w):
    return np.sum(
        w * (x - np.average(x, weights=w)) * (y - np.average(y, weights=w))
    ) / np.sum(w)


def weighted_correlation(x, y, w):
    return weighted_covariance(x, y, w) / np.sqrt(
        weighted_covariance(x, x, w) * weighted_covariance(y, y, w)
    )


def mse(a, b):
    return np.nansum((a - b) ** 2) / np.sum(np.isfinite(a - b))


# -- grouped reductions over integer group ids -------------------------------


def groupby_apply(func, groups, *fields, index=None, default=np.nan):
    """Apply ``func(*field_slices)`` to the elements of each group.

    groups: int array of group ids per element; index: which group ids to
    report (defaults to sorted unique non-zero ids).
    """
    groups = np.asarray(getattr(groups, "values", groups)).ravel()
    fields = [np.asarray(getattr(f, "values", f)).ravel() for f in fields]
    order = np.argsort(groups, kind="stable")
    sorted_groups = groups[order]
    if index is None:
        index = np.unique(groups[groups != 0])
    starts = np.searchsorted(sorted_groups, index, side="left")
    stops = np.searchsorted(sorted_groups, index, side="right")
    out = []
    for s, e in zip(starts, stops):
        if e > s:
            pos = order[s:e]
            out.append(func(*[f[pos] for f in fields]))
        else:
            out.append(default)
    if not out and fields:
        # empty index: keep the field dtype so downstream comparisons work
        return np.asarray(out, dtype=fields[0].dtype)
    return np.asarray(out)


def combined_mean_groupby(means, area, groups, index=None):
    return groupby_apply(calc_combined_mean, groups, means, area, index=index)


def combined_std_groupby(stds, means, area, groups, index=None):
    return groupby_apply(calc_combined_std, groups, stds, means, area, index=index)


def weighted_average_groupby(field, area, groups, index=None):
    return groupby_apply(
        lambda f, a: np.average(f, weights=a), groups, field, area, index=index
    )


def weighted_average_uncertainty_groupby(field, area, groups, index=None):
    return groupby_apply(weighted_average_uncertainty, groups, field, area, index=index)


def argmax_groupby(field, find_max, groups, index=None):
    return groupby_apply(
        lambda f, m: f[np.argmax(m)], groups, field, find_max, index=index
    )


def argmin_groupby(field, find_min, groups, index=None):
    return groupby_apply(
        lambda f, m: f[np.argmin(m)], groups, field, find_min, index=index
    )


def counts_groupby(groups, index=None):
    return groupby_apply(lambda g: g.size, groups, groups, index=index, default=0)


def idxmin_groupby(field, coord, groups, index=None):
    return groupby_apply(
        lambda f, c: c[np.argmin(f)], groups, field, coord, index=index
    )


def idxmax_groupby(field, coord, groups, index=None):
    return groupby_apply(
        lambda f, c: c[np.argmax(f)], groups, field, coord, index=index
    )
