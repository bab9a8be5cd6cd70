"""Object-level filters (parity: reference ``utils/filter_utils.py``):
orphan-coordinate removal and the science filters on cores (cooling >= 8 K,
max time gap, minimum lifetime, maximum area, NaN checks) and anvils."""

from __future__ import annotations

from datetime import timedelta

import numpy as np

from tobac_flow_tpu.utils.stats import groupby_apply

__all__ = ["remove_orphan_coords", "filter_cores", "filter_anvils"]


def _v(a):
    return np.asarray(getattr(a, "values", a))


def remove_orphan_coords(dataset):
    """Drop cores/anvils without steps and steps without objects
    (reference filter_utils.py:10-30)."""
    wh_core = np.isin(dataset.coords["core"], _v(dataset["core_step_core_index"]))
    wh_anvil = np.logical_and(
        np.isin(dataset.coords["anvil"], _v(dataset["thick_anvil_step_anvil_index"])),
        np.isin(dataset.coords["anvil"], _v(dataset["thin_anvil_step_anvil_index"])),
    )
    dataset = dataset.sel(
        core=dataset.coords["core"][wh_core], anvil=dataset.coords["anvil"][wh_anvil]
    )
    wh_core_step = np.isin(_v(dataset["core_step_core_index"]), dataset.coords["core"])
    wh_thick = np.isin(
        _v(dataset["thick_anvil_step_anvil_index"]), dataset.coords["anvil"]
    )
    wh_thin = np.isin(
        _v(dataset["thin_anvil_step_anvil_index"]), dataset.coords["anvil"]
    )
    return dataset.sel(
        core_step=dataset.coords["core_step"][wh_core_step],
        thick_anvil_step=dataset.coords["thick_anvil_step"][wh_thick],
        thin_anvil_step=dataset.coords["thin_anvil_step"][wh_thin],
    )


def _max_t_gap(t):
    if len(t) > 1:
        return np.max(np.diff(np.sort(t)))
    return np.timedelta64(0, "s")


def filter_cores(
    dataset,
    verbose=False,
    min_lifetime=timedelta(minutes=14),
    max_time_gap=timedelta(minutes=16),
):
    """Remove cores failing the science validity criteria
    (reference filter_utils.py:33-129)."""
    cores = dataset.coords["core"]
    groups = _v(dataset["core_step_core_index"])
    step_t = _v(dataset["core_step_t"])
    if verbose:
        print(f"Initial core count: {cores.size}")

    if "core_step_bt_mean" in dataset:
        bt = _v(dataset["core_step_bt_mean"])
        bt_change = groupby_apply(lambda x: x[0] - x[-1], groups, bt, index=cores)
        invalid_bt = np.asarray(bt_change, dtype=float) < 8
        any_nan = groupby_apply(
            lambda x: np.any(np.isnan(x)), groups, bt, index=cores, default=False
        ).astype(bool)
        if "core_nan_flag" in dataset:
            any_nan = np.logical_and(any_nan, _v(dataset["core_nan_flag"]))
    else:
        invalid_bt = np.zeros(cores.size, bool)
        any_nan = np.zeros(cores.size, bool)

    max_gap = groupby_apply(
        _max_t_gap, groups, step_t, index=cores, default=np.timedelta64(0, "s")
    )
    invalid_gap = max_gap > np.timedelta64(max_time_gap)
    lifetime = groupby_apply(
        lambda t: np.max(t) - np.min(t), groups, step_t, index=cores,
        default=np.timedelta64(0, "s"),
    )
    invalid_lifetime = lifetime < np.timedelta64(min_lifetime)
    max_area = groupby_apply(
        np.max, groups, _v(dataset["core_step_area"]), index=cores, default=0.0
    )
    invalid_area = np.asarray(max_area, dtype=float) > 1e4

    invalid = np.logical_or.reduce(
        [invalid_bt, invalid_gap, invalid_lifetime, invalid_area, any_nan]
    )
    dataset = dataset.sel(core=cores[~invalid])
    if verbose:
        print(f"Final core count: {dataset.coords['core'].size}")
    wh_step = np.isin(_v(dataset["core_step_core_index"]), dataset.coords["core"])
    return dataset.sel(core_step=dataset.coords["core_step"][wh_step])


def filter_anvils(
    dataset,
    verbose=False,
    min_lifetime=timedelta(minutes=14),
    max_time_gap=timedelta(minutes=16),
):
    """Remove anvils failing the science validity criteria
    (reference filter_utils.py:132-289)."""
    anvils = dataset.coords["anvil"]
    if verbose:
        print(f"Initial anvil count: {anvils.size}")

    has_core = np.isin(anvils, _v(dataset["core_anvil_index"]))
    dataset = dataset.sel(anvil=anvils[has_core])
    wh_thick = np.isin(
        _v(dataset["thick_anvil_step_anvil_index"]), dataset.coords["anvil"]
    )
    wh_thin = np.isin(
        _v(dataset["thin_anvil_step_anvil_index"]), dataset.coords["anvil"]
    )
    dataset = dataset.sel(
        thick_anvil_step=dataset.coords["thick_anvil_step"][wh_thick],
        thin_anvil_step=dataset.coords["thin_anvil_step"][wh_thin],
    )
    anvils = dataset.coords["anvil"]
    thick_groups = _v(dataset["thick_anvil_step_anvil_index"])
    thick_t = _v(dataset["thick_anvil_step_t"])

    if "thin_anvil_step_bt_mean" in dataset:
        thin_groups = _v(dataset["thin_anvil_step_anvil_index"])
        any_nan = groupby_apply(
            lambda x: np.any(np.isnan(x)),
            thin_groups,
            _v(dataset["thin_anvil_step_bt_mean"]),
            index=anvils,
            default=False,
        ).astype(bool)
        if "thin_anvil_nan_flag" in dataset:
            any_nan = np.logical_and(any_nan, _v(dataset["thin_anvil_nan_flag"]))
    else:
        any_nan = np.zeros(anvils.size, bool)

    lifetime = groupby_apply(
        lambda t: np.max(t) - np.min(t), thick_groups, thick_t, index=anvils,
        default=np.timedelta64(0, "s"),
    )
    invalid_lifetime = lifetime < np.timedelta64(min_lifetime)
    max_gap = groupby_apply(
        _max_t_gap, thick_groups, thick_t, index=anvils,
        default=np.timedelta64(0, "s"),
    )
    invalid_gap = max_gap > np.timedelta64(max_time_gap)

    anvil_max_area = groupby_apply(
        np.max, thick_groups, _v(dataset["thick_anvil_step_area"]), index=anvils,
        default=0.0,
    ).astype(float)
    core_anvil_index = _v(dataset["core_anvil_index"])
    wh_core_has_anvil = np.isin(core_anvil_index, anvils)
    anvil_max_core_area = groupby_apply(
        np.max,
        core_anvil_index[wh_core_has_anvil],
        _v(dataset["core_max_area"])[wh_core_has_anvil],
        index=anvils,
        default=np.inf,
    ).astype(float)
    invalid_area = anvil_max_area <= anvil_max_core_area

    anvil_end_t = groupby_apply(
        np.max, thick_groups, thick_t, index=anvils,
        default=np.datetime64("NaT"),
    )
    anvil_core_end_t = groupby_apply(
        np.max,
        core_anvil_index[wh_core_has_anvil],
        _v(dataset["core_end_t"])[wh_core_has_anvil],
        index=anvils,
        default=np.datetime64("NaT"),
    )
    invalid_end = anvil_end_t <= anvil_core_end_t

    invalid = np.logical_or.reduce(
        [any_nan, invalid_lifetime, invalid_gap, invalid_area, invalid_end]
    )
    dataset = dataset.sel(anvil=anvils[~invalid])
    if verbose:
        print(f"Final anvil count: {dataset.coords['anvil'].size}")
    wh_thick = np.isin(
        _v(dataset["thick_anvil_step_anvil_index"]), dataset.coords["anvil"]
    )
    wh_thin = np.isin(
        _v(dataset["thin_anvil_step_anvil_index"]), dataset.coords["anvil"]
    )
    return dataset.sel(
        thick_anvil_step=dataset.coords["thick_anvil_step"][wh_thick],
        thin_anvil_step=dataset.coords["thin_anvil_step"][wh_thin],
    )
