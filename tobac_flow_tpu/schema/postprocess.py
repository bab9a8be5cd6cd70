"""Per-object statistics and validity flags (parity: reference
``tobac_flow/postprocess.py``): start/end/average positions, area and
cooling-rate aggregates per core/anvil (``process_core_properties`` 313-642,
``process_thick_anvil_properties`` 643-924, ``process_thin_anvil_properties``
925-1172), weighted per-label statistics with uncertainties
(``weighted_label_stats`` 102-242), flag-proportion stats (245-310), CRE
computation (29-99), and ``add_validity_flags`` (1173-1314)."""

from __future__ import annotations

from functools import partial

import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray
from tobac_flow_tpu.utils.geo import get_mean_object_azimuth_and_speed
from tobac_flow_tpu.utils.labels import apply_func_to_labels
from tobac_flow_tpu.utils.stats import (
    argmax_groupby,
    argmin_groupby,
    calc_combined_mean,
    calc_combined_std,
    cooling_rate_groupby,
    counts_groupby,
    get_weighted_proportions,
    groupby_apply,
    growth_rate_groupby,
    idxmax_cooling_rate_groupby,
    idxmax_growth_rate_groupby,
    idxmax_groupby,
    idxmin_groupby,
    weighted_average_groupby,
    weighted_average_uncertainty_groupby,
    weighted_stats,
    weighted_stats_and_uncertainties,
)

__all__ = [
    "get_cre",
    "add_cre_to_dataset",
    "weighted_label_stats",
    "add_weighted_stats_to_dataset",
    "get_weighted_proportions_da",
    "add_weighted_proportions_to_dataset",
    "process_core_properties",
    "process_thick_anvil_properties",
    "process_thin_anvil_properties",
    "add_validity_flags",
]


def _v(a):
    return np.asarray(getattr(a, "values", a))


def _da(values, dim, name, attrs=None):
    return DataArray(np.asarray(values), dims=(dim,), name=name, attrs=attrs or {})


def _lookup(values_by_key, keys, query, default=np.nan):
    """values at positions of `query` within `keys` (xarray .loc analogue)."""
    keys = np.asarray(keys)
    query = np.asarray(query)
    order = np.argsort(keys)
    pos = np.searchsorted(keys, query, sorter=order)
    pos = np.clip(pos, 0, keys.size - 1)
    found = keys[order[pos]] == query
    vals = np.asarray(values_by_key)[order[pos]]
    if np.issubdtype(vals.dtype, np.floating):
        vals = np.where(found, vals, default)
    return vals


# -- cloud radiative effect ---------------------------------------------------


def get_cre(flux, clear_flux):
    """CRE = all-sky minus clear-sky flux (reference postprocess.py:29-36)."""
    cre = flux - clear_flux
    cre.attrs = dict(flux.attrs)
    cre.attrs["long_name"] = cre.attrs.get("long_name", flux.name) + " cloud radiative effect"
    if "standard_name" in cre.attrs:
        cre.attrs["standard_name"] += "_cloud_radiative_effect"
    if "valid_max" in cre.attrs:
        cre.attrs["valid_min"] = -cre.attrs["valid_max"]
    cre.name = f"{flux.name}_cre"
    return cre


def add_cre_to_dataset(dataset):
    for var in ("toa_swup", "toa_lwup", "boa_swdn", "boa_swup", "boa_lwdn", "boa_lwup"):
        dataset[f"{var}_cre"] = get_cre(dataset[var], dataset[f"{var}_clr"])
    flux_attrs = lambda ln, sn: {
        "long_name": ln, "standard_name": sn, "units": "W m-2",
        "valid_min": -1500.0, "valid_max": 1500.0,
    }
    toa_net = dataset["toa_swdn"] - (dataset["toa_swup"] + dataset["toa_lwup"])
    toa_net.attrs = flux_attrs("top of atmosphere net radiation", "toa_net_flux")
    dataset["toa_net"] = toa_net
    toa_net_cre = -(dataset["toa_swup_cre"] + dataset["toa_lwup_cre"])
    toa_net_cre.attrs = flux_attrs(
        "top of atmosphere net cloud radiative effect",
        "toa_net_cloud_radiative_effect",
    )
    dataset["toa_net_cre"] = toa_net_cre
    boa_net = (
        dataset["boa_swdn"] + dataset["boa_lwdn"]
        - (dataset["boa_swup"] + dataset["boa_lwup"])
    )
    boa_net.attrs = flux_attrs("bottom of atmosphere net radiation", "boa_net_flux")
    dataset["boa_net"] = boa_net
    boa_net_cre = (
        dataset["boa_swdn_cre"] + dataset["boa_lwdn_cre"]
        - (dataset["boa_swup_cre"] + dataset["boa_lwup_cre"])
    )
    boa_net_cre.attrs = flux_attrs(
        "bottom of atmosphere net cloud radiative effect",
        "boa_net_cloud_radiative_effect",
    )
    dataset["boa_net_cre"] = boa_net_cre
    return dataset


# -- weighted per-label statistics -------------------------------------------


def weighted_label_stats(
    labels, weights, dataset, var, coord, dim, dim_name=None, attrs=None,
    uncertainty=False,
):
    """Weighted mean/std/min/max (± uncertainties) of a field per label."""
    if dim_name is None:
        dim_name = dim
    index = np.asarray(getattr(coord, "values", coord))
    if uncertainty:
        stats = apply_func_to_labels(
            _v(labels),
            _v(dataset[var]),
            _v(dataset[f"{var}_uncertainty"]),
            np.broadcast_to(_v(weights), _v(labels).shape),
            func=weighted_stats_and_uncertainties,
            index=index,
            default=[np.nan] * 8,
        )
        names = [
            "mean", "std", "min", "max",
            "mean_uncertainty", "mean_combined_error", "min_error", "max_error",
        ]
    else:
        stats = apply_func_to_labels(
            _v(labels),
            _v(dataset[var]),
            np.broadcast_to(_v(weights), _v(labels).shape),
            func=weighted_stats,
            index=index,
            default=[np.nan] * 4,
        )
        names = ["mean", "std", "min", "max"]
    stats = np.asarray(stats, dtype=float)
    if stats.ndim == 1:  # single label: squeeze removed the label axis
        stats = stats.reshape(len(names), -1)
    return tuple(
        _da(stats[i], dim, f"{dim_name}_{var}_{stat}")
        for i, stat in enumerate(names)
    )


def add_weighted_stats_to_dataset(
    dcc_dataset, field_dataset, weights, var, dim, dim_name=None, index=None,
    labels=None,
):
    if dim_name is None:
        dim_name = dim
    if index is None:
        index = dcc_dataset.coords[dim]
    if labels is None:
        labels = dcc_dataset[f"{dim_name}_label"]
    stats = weighted_label_stats(
        labels, weights, field_dataset, var, index, dim, dim_name=dim_name,
        uncertainty=(f"{var}_uncertainty" in field_dataset.data_vars),
    )
    for da in stats:
        dcc_dataset[da.name] = da
    return dcc_dataset


def get_weighted_proportions_da(flag_da, weights, labels, dim, dim_name=None, index=None):
    """Per-label weighted proportion of each flag value."""
    if dim_name is None:
        dim_name = dim
    if index is None:
        index = np.arange(1, int(np.nanmax(_v(labels))) + 1)
    index = np.asarray(getattr(index, "values", index))
    flag_values = np.asarray(
        [int(n) for n in str(flag_da.attrs["flag_values"]).replace("b", "").split()]
    )
    proportions = apply_func_to_labels(
        _v(labels),
        _v(flag_da),
        np.broadcast_to(_v(weights), _v(labels).shape),
        func=partial(get_weighted_proportions, flag_values=flag_values),
        index=index,
        default=np.asarray([np.nan] * len(flag_values)),
    )
    proportions = np.atleast_2d(np.asarray(proportions, dtype=float))
    out = DataArray(
        proportions.T,
        dims=(dim, flag_da.name),
        name=f"{dim_name}_{flag_da.name}_proportion",
    )
    out.coords[dim] = index
    out.coords[flag_da.name] = flag_values
    return out


def add_weighted_proportions_to_dataset(
    dcc_dataset, flag_da, weights, dim, dim_name=None, index=None, labels=None
):
    if dim_name is None:
        dim_name = dim
    if index is None:
        index = dcc_dataset.coords[dim]
    if labels is None:
        labels = dcc_dataset[f"{dim_name}_label"]
    da = get_weighted_proportions_da(
        flag_da, weights, labels, dim, dim_name=dim_name, index=index
    )
    dcc_dataset[da.name] = da
    return dcc_dataset


# -- per-object property aggregation ------------------------------------------


def _process_object(
    dataset, dim, obj_prefix, step_prefix, link_name, time_steps=3,
    propagation_prefix=None,
):
    """Start/end/average positions, areas and rate statistics for one object
    family (the common core of process_{core,thick_anvil,thin_anvil}_properties).

    ``propagation_prefix`` names the propagation direction/speed variables
    (the reference calls the thick-anvil ones ``anvil_propagation_*`` and
    emits none for thin anvils, postprocess.py:643-924); None skips them.
    """
    objs = dataset.coords[dim]
    groups = _v(dataset[link_name])
    step_vals = dataset.coords[f"{step_prefix}"]
    step_t = _v(dataset[f"{step_prefix}_t"])
    step_area = _v(dataset[f"{step_prefix}_area"])

    has_latlon = f"{step_prefix}_lat" in dataset
    pos_names = ["x", "y"] + (["lat", "lon"] if has_latlon else [])

    start_step = argmin_groupby(step_vals, step_t, groups, index=objs)
    end_step = argmax_groupby(step_vals, step_t, groups, index=objs)
    dataset[f"{obj_prefix}_initial_{step_prefix}_index"] = _da(
        start_step, dim, f"{obj_prefix}_initial_{step_prefix}_index"
    )
    for pos in pos_names + ["t"]:
        vals = _v(dataset[f"{step_prefix}_{pos}"])
        dataset[f"{obj_prefix}_start_{pos}"] = _da(
            _lookup(vals, step_vals, start_step), dim, f"{obj_prefix}_start_{pos}"
        )
        dataset[f"{obj_prefix}_end_{pos}"] = _da(
            _lookup(vals, step_vals, end_step), dim, f"{obj_prefix}_end_{pos}"
        )
    dataset[f"{obj_prefix}_lifetime"] = _da(
        _v(dataset[f"{obj_prefix}_end_t"]) - _v(dataset[f"{obj_prefix}_start_t"]),
        dim,
        f"{obj_prefix}_lifetime",
    )

    for pos in pos_names:
        dataset[f"{obj_prefix}_average_{pos}"] = _da(
            weighted_average_groupby(
                _v(dataset[f"{step_prefix}_{pos}"]), step_area, groups, index=objs
            ),
            dim,
            f"{obj_prefix}_average_{pos}",
        )
    dataset[f"{obj_prefix}_average_area"] = _da(
        groupby_apply(np.mean, groups, step_area, index=objs), dim,
        f"{obj_prefix}_average_area",
    )
    dataset[f"{obj_prefix}_total_area"] = _da(
        groupby_apply(np.sum, groups, step_area, index=objs), dim,
        f"{obj_prefix}_total_area",
    )
    dataset[f"{obj_prefix}_max_area"] = _da(
        groupby_apply(np.max, groups, step_area, index=objs), dim,
        f"{obj_prefix}_max_area",
    )
    dataset[f"{obj_prefix}_max_area_t"] = _da(
        argmax_groupby(step_t, step_area, groups, index=objs), dim,
        f"{obj_prefix}_max_area_t",
    )
    dataset[f"{obj_prefix}_max_area_{step_prefix}_index"] = _da(
        argmax_groupby(step_vals, step_area, groups, index=objs), dim,
        f"{obj_prefix}_max_area_{step_prefix}_index",
    )

    # per-field extrema and (core-only) rate statistics, conditional on which
    # per-step statistics were computed (reference postprocess.py:400-642:
    # bt/ctt/ctt_corrected take min + cooling rates, cth/cth_corrected take
    # max + growth rates)
    rates = obj_prefix == "core"
    for field, kind in (
        ("bt", "min"),
        ("ctt", "min"),
        ("ctt_corrected", "min"),
        ("cth", "max"),
        ("cth_corrected", "max"),
    ):
        var = f"{step_prefix}_{field}_mean"
        if var not in dataset:
            continue
        vals = _v(dataset[var])
        pick_t = argmin_groupby if kind == "min" else argmax_groupby
        pick_i = idxmin_groupby if kind == "min" else idxmax_groupby
        dataset[f"{obj_prefix}_{kind}_{field}_t"] = _da(
            pick_t(step_t, vals, groups, index=objs), dim,
            f"{obj_prefix}_{kind}_{field}_t",
        )
        dataset[f"{obj_prefix}_{kind}_{field}_{step_prefix}_index"] = _da(
            pick_i(vals, np.asarray(step_vals), groups, index=objs), dim,
            f"{obj_prefix}_{kind}_{field}_{step_prefix}_index",
        )
        if not rates:
            continue
        if field == "bt":
            rate_name = f"{obj_prefix}_max_cooling_rate"
        elif kind == "min":
            rate_name = f"{obj_prefix}_{field}_cooling_rate"
        else:
            rate_name = f"{obj_prefix}_{field}_growth_rate"
        rate_fn = cooling_rate_groupby if kind == "min" else growth_rate_groupby
        idx_fn = (
            idxmax_cooling_rate_groupby if kind == "min" else idxmax_growth_rate_groupby
        )
        dataset[rate_name] = _da(
            rate_fn(vals, step_t, groups, index=objs), dim, rate_name
        )
        dataset[f"{rate_name}_{step_prefix}_index"] = _da(
            idx_fn(vals, step_t, np.asarray(step_vals), groups, index=objs), dim,
            f"{rate_name}_{step_prefix}_index",
        )

    if has_latlon and propagation_prefix is not None:
        azi_speed = apply_func_to_labels(
            groups,
            _v(dataset[f"{step_prefix}_lon"]),
            _v(dataset[f"{step_prefix}_lat"]),
            step_t,
            func=get_mean_object_azimuth_and_speed,
            index=objs,
            default=[np.nan, np.nan],
        )
        azi_speed = np.asarray(azi_speed, dtype=float)
        if azi_speed.ndim == 1:
            azi_speed = azi_speed.reshape(2, -1)
        dataset[f"{propagation_prefix}_propagation_direction"] = _da(
            azi_speed[0], dim, f"{propagation_prefix}_propagation_direction"
        )
        dataset[f"{propagation_prefix}_propagation_speed"] = _da(
            azi_speed[1], dim, f"{propagation_prefix}_propagation_speed"
        )

    # aggregate any per-step statistics up to the object level
    strip = len(step_prefix) + 1
    for var in list(dataset.data_vars):
        if dataset[var].dims != (step_prefix,):
            continue
        new_var = f"{obj_prefix}_{var[strip:]}"
        vals = _v(dataset[var])
        if var.endswith("_mean") and not var.endswith("_area_mean"):
            dataset[new_var] = _da(
                groupby_apply(calc_combined_mean, groups, vals, step_area, index=objs),
                dim, new_var,
            )
        elif var.endswith("_std"):
            mean_var = var[:-3] + "mean"
            if mean_var in dataset:
                dataset[new_var] = _da(
                    groupby_apply(
                        calc_combined_std, groups, vals, _v(dataset[mean_var]),
                        step_area, index=objs,
                    ),
                    dim, new_var,
                )
        elif var.endswith("_min") and new_var not in dataset:
            dataset[new_var] = _da(
                groupby_apply(np.min, groups, vals, index=objs), dim, new_var
            )
        elif var.endswith("_max") and new_var not in dataset:
            dataset[new_var] = _da(
                groupby_apply(np.max, groups, vals, index=objs), dim, new_var
            )
        elif var.endswith("_mean_uncertainty"):
            dataset[new_var] = _da(
                weighted_average_uncertainty_groupby(vals, step_area, groups, index=objs),
                dim, new_var,
            )
    return dataset


def process_core_properties(dataset, time_steps=3):
    return _process_object(
        dataset, "core", "core", "core_step", "core_step_core_index", time_steps,
        propagation_prefix="core",
    )


def process_thick_anvil_properties(dataset):
    return _process_object(
        dataset, "anvil", "thick_anvil", "thick_anvil_step",
        "thick_anvil_step_anvil_index", propagation_prefix="anvil",
    )


def process_thin_anvil_properties(dataset):
    return _process_object(
        dataset, "anvil", "thin_anvil", "thin_anvil_step",
        "thin_anvil_step_anvil_index",
    )


# -- validity flags -----------------------------------------------------------


def add_validity_flags(dataset):
    """core_has_anvil / anvil_no_growth / anvil_no_initial_core and the
    combined *_is_valid flags (reference postprocess.py:1173-1314)."""
    cores = dataset.coords["core"]
    anvils = dataset.coords["anvil"]
    core_anvil_index = _v(dataset["core_anvil_index"]).copy()

    has_anvil = np.isin(core_anvil_index, anvils)
    dataset["core_has_anvil_flag"] = _da(has_anvil, "core", "core_has_anvil_flag")
    dataset["core_anvil_removed"] = _da(
        np.logical_and(~has_anvil, core_anvil_index != 0), "core",
        "core_anvil_removed",
    )
    core_anvil_index[~has_anvil] = 0
    dataset["core_anvil_index"].values[...] = core_anvil_index

    dataset["anvil_core_count"] = _da(
        counts_groupby(core_anvil_index[has_anvil], index=anvils), "anvil",
        "anvil_core_count",
    )
    initial_core = argmin_groupby(
        np.asarray(cores)[has_anvil],
        _v(dataset["core_start_t"])[has_anvil],
        core_anvil_index[has_anvil],
        index=anvils,
    )
    # anvils with no surviving core get index 0
    initial_core = np.where(np.isnan(initial_core.astype(float)), 0, initial_core)
    dataset["anvil_initial_core_index"] = _da(
        initial_core.astype(np.int32), "anvil", "anvil_initial_core_index"
    )

    init_core_end_t = _lookup(
        _v(dataset["core_end_t"]), cores, initial_core,
        default=np.datetime64("NaT"),
    )
    init_core_start_t = _lookup(
        _v(dataset["core_start_t"]), cores, initial_core,
        default=np.datetime64("NaT"),
    )
    dataset["anvil_no_growth_flag"] = _da(
        _v(dataset["thick_anvil_max_area_t"]) <= init_core_end_t, "anvil",
        "anvil_no_growth_flag",
    )
    dataset["anvil_no_initial_core_flag"] = _da(
        _v(dataset["thick_anvil_start_t"]) < init_core_start_t, "anvil",
        "anvil_no_initial_core_flag",
    )

    core_flags = [
        _v(dataset["core_edge_label_flag"]),
        _v(dataset["core_start_label_flag"]),
        _v(dataset["core_end_label_flag"]),
    ]
    if "core_nan_flag" in dataset:
        core_flags.append(_v(dataset["core_nan_flag"]))
    core_is_valid = ~np.logical_or.reduce(core_flags)
    dataset["core_is_valid"] = _da(core_is_valid, "core", "core_is_valid")

    anvil_all_valid = groupby_apply(
        np.all, core_anvil_index, core_is_valid, index=anvils, default=True
    )
    anvil_has_invalid = ~np.asarray(anvil_all_valid, dtype=bool)
    dataset["anvil_invalid_core_flag"] = _da(
        anvil_has_invalid, "anvil", "anvil_invalid_core_flag"
    )

    for prefix in ("thick_anvil", "thin_anvil"):
        flags = [
            anvil_has_invalid,
            _v(dataset["anvil_no_growth_flag"]),
            _v(dataset["anvil_no_initial_core_flag"]),
            _v(dataset[f"{prefix}_edge_label_flag"]),
            _v(dataset[f"{prefix}_start_label_flag"]),
            _v(dataset[f"{prefix}_end_label_flag"]),
        ]
        if f"{prefix}_nan_flag" in dataset:
            flags.append(_v(dataset[f"{prefix}_nan_flag"]))
        dataset[f"{prefix}_is_valid"] = _da(
            ~np.logical_or.reduce(flags), "anvil", f"{prefix}_is_valid"
        )
    return dataset
