"""Output-dataset schema: label coordinates, linking indices, flags and
per-object properties.

Behavioural parity with reference ``tobac_flow/dataset.py``: the same
variable names, dims and semantics (``add_step_labels`` 189-227,
``add_label_coords`` 230-297, ``link_cores_and_anvils`` 307-367,
``link_step_labels`` 370-457, ``find_edge_labels``/``flag_edge_labels``
460-640, ``flag_nan_adjacent_labels`` 643-702, ``calculate_label_properties``
705-1594), built on this framework's Dataset/DataArray containers.
"""

from __future__ import annotations

from functools import partial

import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray, Dataset
from tobac_flow_tpu.ops.morphology import binary_dilation
from tobac_flow_tpu.utils.datetime_utils import get_datetime_from_coord
from tobac_flow_tpu.utils.labels import (
    apply_func_to_labels,
    labeled_comprehension,
    remap_labels,
    slice_labels,
    unique_labels,
)
from tobac_flow_tpu.utils.stats import find_overlap_mode

__all__ = [
    "add_step_labels",
    "add_label_coords",
    "link_cores_and_anvils",
    "link_step_labels",
    "find_edge_labels",
    "flag_edge_labels",
    "flag_nan_adjacent_labels",
    "calculate_label_properties",
    "get_bulk_stats",
    "get_spatial_stats",
    "get_temporal_stats",
]


def _v(a):
    return np.asarray(getattr(a, "values", a))


def _add(ds, name, data, dims, long_name="", units="", dtype=None):
    data = np.asarray(data)
    if dtype is not None:
        data = data.astype(dtype)
    ds[name] = DataArray(
        data, dims=dims, name=name, attrs={"long_name": long_name, "units": units}
    )


# -- bulk/spatial/temporal statistics (reference dataset.py:19-148) ----------


def _stat_block(ds, da, reducers, dims, suffix_fmt):
    long_name = da.attrs.get("long_name", da.name)
    units = da.attrs.get("units", "")
    for stat, func in reducers:
        _add(
            ds,
            suffix_fmt.format(name=da.name, stat=stat),
            func(da.values),
            dims,
            long_name=f"{stat} of {long_name}",
            units=units,
            dtype=da.dtype,
        )


def get_bulk_stats(ds, da):
    _stat_block(
        ds,
        da,
        [
            ("mean", np.nanmean),
            ("std", np.nanstd),
            ("median", np.median),
            ("max", np.nanmax),
            ("min", np.nanmin),
        ],
        (),
        "{name}_{stat}",
    )


def get_spatial_stats(ds, da):
    _stat_block(
        ds,
        da,
        [
            ("mean", lambda v: np.nanmean(v, (1, 2))),
            ("std", lambda v: np.nanstd(v, (1, 2))),
            ("median", lambda v: np.nanmedian(v, (1, 2))),
            ("max", lambda v: np.nanmax(v, (1, 2))),
            ("min", lambda v: np.nanmin(v, (1, 2))),
        ],
        ("t",),
        "{name}_spatial_{stat}",
    )


def get_temporal_stats(ds, da):
    _stat_block(
        ds,
        da,
        [
            ("mean", lambda v: np.nanmean(v, 0)),
            ("std", lambda v: np.nanstd(v, 0)),
            ("median", lambda v: np.nanmedian(v, 0)),
            ("max", lambda v: np.nanmax(v, 0)),
            ("min", lambda v: np.nanmin(v, 0)),
        ],
        ("y", "x"),
        "{name}_temporal_{stat}",
    )


def create_new_goes_ds(goes_ds):
    """Fresh output dataset carrying the source grid's coords, projection and
    derived lat/lon/pixel-area fields (reference dataset.py:151-186)."""
    new_ds = Dataset(
        coords={
            k: goes_ds.coords[k]
            for k in ("t", "y", "x", "y_image", "x_image")
            if k in goes_ds.coords
        }
    )
    if "goes_imager_projection" in goes_ds:
        new_ds["goes_imager_projection"] = goes_ds["goes_imager_projection"]
        from tobac_flow_tpu.data.abi import get_abi_lat_lon, get_abi_pixel_area

        lat, lon = get_abi_lat_lon(new_ds)
        _add(new_ds, "lat", lat, ("y", "x"), long_name="latitude", dtype=np.float32)
        _add(new_ds, "lon", lon, ("y", "x"), long_name="longitude", dtype=np.float32)
        _add(
            new_ds, "area", get_abi_pixel_area(new_ds), ("y", "x"),
            long_name="pixel area", units="km^2", dtype=np.float32,
        )
    return new_ds


# -- step labels / label coords ----------------------------------------------


def add_step_labels(dataset: Dataset) -> None:
    """Per-step labels for cores and anvils (reference dataset.py:189-227)."""
    for src, name, long_name in [
        ("core_label", "core_step_label", "labels for detected cores at each time step"),
        (
            "thick_anvil_label",
            "thick_anvil_step_label",
            "labels for detected thick anvil regions at each time step",
        ),
        (
            "thin_anvil_label",
            "thin_anvil_step_label",
            "labels for detected thin anvil regions at each time step",
        ),
    ]:
        _add(
            dataset,
            name,
            slice_labels(_v(dataset[src])),
            ("t", "y", "x"),
            long_name=long_name,
            dtype=np.int32,
        )


def add_label_coords(dataset: Dataset) -> Dataset:
    """Add unique label values as coordinates (reference dataset.py:230-297)."""

    def uniq(*names):
        vals = set()
        for n in names:
            if n in dataset:
                vals |= set(unique_labels(_v(dataset[n])).astype(np.int64).tolist())
        vals -= {0}
        return np.asarray(sorted(vals), dtype=np.int32)

    dataset.coords["core"] = uniq("core_label")
    dataset.coords["anvil"] = uniq("thick_anvil_label", "thin_anvil_label")
    if "core_step_label" in dataset:
        dataset.coords["core_step"] = uniq("core_step_label")
    if "thick_anvil_step_label" in dataset:
        dataset.coords["thick_anvil_step"] = uniq("thick_anvil_step_label")
    if "thin_anvil_step_label" in dataset:
        dataset.coords["thin_anvil_step"] = uniq("thin_anvil_step_label")
    return dataset


# -- core <-> anvil linking ---------------------------------------------------


def _find_max_overlap(x, atol, max_label):
    counts = np.bincount(x.astype(np.int64), minlength=max_label + 1)
    counts[0] = 0
    wh = int(np.argmax(counts))
    return wh if counts[wh] >= atol else 0


def link_cores_and_anvils(
    dataset: Dataset, atol: int = 5, add_cores_to_anvils: bool = True
) -> None:
    """Max-overlap core -> anvil index; optionally paint cores into the anvil
    label rasters (reference dataset.py:307-367)."""
    cores = dataset.coords["core"]
    max_core = int(cores.max()) if cores.size else 0
    comp = partial(_find_max_overlap, atol=atol, max_label=max_core)
    core_anvil_index = labeled_comprehension(
        _v(dataset["thick_anvil_label"]).ravel(),
        _v(dataset["core_label"]).ravel(),
        comp,
        index=cores,
        dtype=np.int64,
        default=0,
    )
    core_anvil_index = np.atleast_1d(core_anvil_index)
    _add(
        dataset,
        "core_anvil_index",
        core_anvil_index,
        ("core",),
        long_name="anvil index for each core",
        dtype=np.int32,
    )

    if add_cores_to_anvils and cores.size:
        remapped = remap_labels(
            _v(dataset["core_label"]), locations=cores, new_labels=core_anvil_index
        )
        wh = remapped != 0
        dataset["thick_anvil_label"].values[wh] = remapped[wh]
        dataset["thin_anvil_label"].values[wh] = remapped[wh]

    anvils = dataset.coords["anvil"]
    pos = core_anvil_index[core_anvil_index > 0].astype(np.int64)
    counts = np.bincount(
        pos, minlength=(int(anvils.max()) + 1 if anvils.size else 1)
    )
    anvil_core_count = counts[np.asarray(anvils, dtype=np.int64)]
    _add(
        dataset,
        "anvil_core_count",
        anvil_core_count,
        ("anvil",),
        long_name="number of cores associated with anvil",
        dtype=np.int32,
    )


def link_step_labels(dataset: Dataset) -> None:
    """Mode-overlap step -> object index (reference dataset.py:370-457)."""
    for step_label, label, step_dim, name, long_name in [
        (
            "core_step_label",
            "core_label",
            "core_step",
            "core_step_core_index",
            "core index for each core time step",
        ),
        (
            "thick_anvil_step_label",
            "thick_anvil_label",
            "thick_anvil_step",
            "thick_anvil_step_anvil_index",
            "anvil index for each thick anvil time step",
        ),
        (
            "thin_anvil_step_label",
            "thin_anvil_label",
            "thin_anvil_step",
            "thin_anvil_step_anvil_index",
            "anvil index for each thin anvil time step",
        ),
    ]:
        idx = apply_func_to_labels(
            _v(dataset[step_label]),
            _v(dataset[label]),
            func=find_overlap_mode,
            index=dataset.coords[step_dim],
            default=0,
        )
        _add(
            dataset,
            name,
            np.atleast_1d(idx),
            (step_dim,),
            long_name=long_name,
            dtype=np.int32,
        )


# -- edge / NaN flags ---------------------------------------------------------


def find_edge_labels(
    labels, label_values, t_coord, start_date=None, end_date=None, max_time_gap=900
):
    """Edge/start/end flags per label value (reference dataset.py:460-516)."""
    vals = _v(labels)
    label_values = np.asarray(label_values)
    edge_labels = np.unique(
        np.concatenate(
            [
                np.unique(vals[:, 0]),
                np.unique(vals[:, -1]),
                np.unique(vals[:, :, 0]),
                np.unique(vals[:, :, -1]),
            ]
        )
    )
    edge_flag = np.isin(label_values, edge_labels[edge_labels != 0])

    times = np.asarray(getattr(t_coord, "values", t_coord))
    pytimes = get_datetime_from_coord(times)
    if start_date is not None and pytimes[0] < start_date:
        n_start = int(np.searchsorted(times, np.datetime64(start_date), side="right"))
        start_labels = np.unique(vals[:n_start])
    else:
        start_labels = np.unique(vals[0])
    if end_date is not None and pytimes[-1] > end_date:
        n_end = int(np.searchsorted(times, np.datetime64(end_date), side="left"))
        end_labels = np.unique(vals[n_end:])
    else:
        end_labels = np.unique(vals[-1])

    gaps = np.where(np.diff(times).astype("timedelta64[s]").astype(int) > max_time_gap)[0]
    if gaps.size:
        start_labels = np.unique(np.concatenate([start_labels, np.unique(vals[gaps])]))
        end_labels = np.unique(np.concatenate([end_labels, np.unique(vals[gaps + 1])]))

    start_flag = np.isin(label_values, start_labels[start_labels != 0])
    end_flag = np.isin(label_values, end_labels[end_labels != 0])
    return edge_flag, start_flag, end_flag


def flag_edge_labels(dataset: Dataset, start_date=None, end_date=None, max_time_gap=900):
    """Domain-edge / start / end / time-gap flags for cores and anvils
    (reference dataset.py:519-640)."""
    t = dataset.coords["t"]
    for label_name, dim, prefix in [
        ("core_label", "core", "core"),
        ("thick_anvil_label", "anvil", "thick_anvil"),
        ("thin_anvil_label", "anvil", "thin_anvil"),
    ]:
        edge, start, end = find_edge_labels(
            dataset[label_name], dataset.coords[dim], t, start_date, end_date,
            max_time_gap,
        )
        what = prefix.replace("_", " ") + "s"
        _add(
            dataset, f"{prefix}_edge_label_flag", edge, (dim,),
            long_name=f"flag for {what} intersecting the domain edge", dtype=bool,
        )
        _add(
            dataset, f"{prefix}_start_label_flag", start, (dim,),
            long_name=f"flag for {what} intersecting the domain start time", dtype=bool,
        )
        _add(
            dataset, f"{prefix}_end_label_flag", end, (dim,),
            long_name=f"flag for {what} intersecting the domain end time", dtype=bool,
        )


def flag_nan_adjacent_labels(dataset: Dataset, da) -> None:
    """Flag labels adjacent to missing data (reference dataset.py:643-702)."""
    vals = _v(da)
    flags = {
        "core_nan_flag": np.zeros(dataset.coords["core"].size, bool),
        "thick_anvil_nan_flag": np.zeros(dataset.coords["anvil"].size, bool),
        "thin_anvil_nan_flag": np.zeros(dataset.coords["anvil"].size, bool),
    }
    if np.any(np.isnan(vals)):
        wh_nan = np.asarray(
            binary_dilation(np.isnan(vals), structure=np.ones((3, 3, 3)))
        )
        for flag_name, label_name, dim in [
            ("core_nan_flag", "core_label", "core"),
            ("thick_anvil_nan_flag", "thick_anvil_label", "anvil"),
            ("thin_anvil_nan_flag", "thin_anvil_label", "anvil"),
        ]:
            nan_labels = np.unique(_v(dataset[label_name])[wh_nan])
            flags[flag_name] = np.isin(
                dataset.coords[dim], nan_labels[nan_labels != 0]
            )
    for flag_name, dim, what in [
        ("core_nan_flag", "core", "cores"),
        ("thick_anvil_nan_flag", "anvil", "thick anvils"),
        ("thin_anvil_nan_flag", "anvil", "thin anvils"),
    ]:
        _add(
            dataset, flag_name, flags[flag_name], (dim,),
            long_name=f"flag for {what} intersecting missing values", dtype=bool,
        )


# -- per-object properties ----------------------------------------------------


def _object_properties(dataset, label_name, dim, prefix, areas, t_coord, lat, lon):
    labels = _v(dataset[label_name])
    index = dataset.coords[dim]
    counts = np.bincount(labels.ravel(), minlength=int(index.max()) + 1 if index.size else 1)
    _add(
        dataset, f"{prefix}_pixel_count", counts[index], (dim,),
        long_name=f"total number of pixels for {prefix}", dtype=np.int64,
    )
    total_area = apply_func_to_labels(
        labels, areas, func=np.nansum, index=index, default=0.0
    )
    _add(
        dataset, f"{prefix}_total_area", np.atleast_1d(total_area), (dim,),
        long_name=f"total area of {prefix}", units="km^2", dtype=np.float64,
    )
    times = np.asarray(getattr(t_coord, "values", t_coord))
    t3 = np.broadcast_to(times[:, None, None], labels.shape)
    start_t = apply_func_to_labels(
        labels, t3, func=np.min, index=index, default=np.datetime64("NaT")
    )
    end_t = apply_func_to_labels(
        labels, t3, func=np.max, index=index, default=np.datetime64("NaT")
    )
    _add(
        dataset, f"{prefix}_start_t", np.atleast_1d(start_t), (dim,),
        long_name=f"initial detection time of {prefix}",
    )
    _add(
        dataset, f"{prefix}_end_t", np.atleast_1d(end_t), (dim,),
        long_name=f"final detection time of {prefix}",
    )
    _add(
        dataset, f"{prefix}_lifetime",
        np.atleast_1d(end_t) - np.atleast_1d(start_t), (dim,),
        long_name=f"total lifetime of {prefix}",
    )


def _step_properties(dataset, step_label_name, step_dim, prefix, areas, t_coord, lat, lon):
    labels = _v(dataset[step_label_name])
    index = dataset.coords[step_dim]
    counts = np.bincount(
        labels.ravel(), minlength=int(index.max()) + 1 if index.size else 1
    )
    _add(
        dataset, f"{prefix}_pixel_count", counts[index], (step_dim,),
        long_name=f"number of pixels for {prefix}", dtype=np.int64,
    )
    area = apply_func_to_labels(labels, areas, func=np.nansum, index=index, default=0.0)
    _add(
        dataset, f"{prefix}_area", np.atleast_1d(area), (step_dim,),
        long_name=f"area of {prefix}", units="km^2", dtype=np.float64,
    )
    times = np.asarray(getattr(t_coord, "values", t_coord))
    t3 = np.broadcast_to(times[:, None, None], labels.shape)
    step_t = apply_func_to_labels(
        labels, t3, func=np.min, index=index, default=np.datetime64("NaT")
    )
    _add(
        dataset, f"{prefix}_t", np.atleast_1d(step_t), (step_dim,),
        long_name=f"time of {prefix}",
    )
    shape = labels.shape
    yy, xx = np.meshgrid(np.arange(shape[1]), np.arange(shape[2]), indexing="ij")
    for field, name, units in [
        (np.broadcast_to(xx, shape), "x", ""),
        (np.broadcast_to(yy, shape), "y", ""),
    ]:
        mean = apply_func_to_labels(
            labels, field, areas, func=lambda v, w: np.average(v, weights=w)
            if np.sum(w) > 0 else np.nan, index=index, default=np.nan,
        )
        _add(
            dataset, f"{prefix}_{name}", np.atleast_1d(mean), (step_dim,),
            long_name=f"{name} location of {prefix}", units=units, dtype=np.float64,
        )
    if lat is not None and lon is not None:
        for field, name in [(lat, "lat"), (lon, "lon")]:
            f3 = np.broadcast_to(field, shape)
            mean = apply_func_to_labels(
                labels, f3, areas, func=lambda v, w: np.average(v, weights=w)
                if np.sum(w) > 0 else np.nan, index=index, default=np.nan,
            )
            _add(
                dataset, f"{prefix}_{name}", np.atleast_1d(mean), (step_dim,),
                long_name=f"{name} location of {prefix}", dtype=np.float64,
            )


def calculate_label_properties(dataset: Dataset) -> None:
    """Pixel counts, areas, times, lifetimes and per-step positions for cores
    and anvils (reference dataset.py:705-1594)."""
    shape = _v(dataset["core_label"]).shape
    if "area" in dataset:
        areas = np.broadcast_to(_v(dataset["area"]), shape)
    else:
        areas = np.broadcast_to(np.ones((), np.float64), shape)
    lat = _v(dataset["lat"]) if "lat" in dataset else None
    lon = _v(dataset["lon"]) if "lon" in dataset else None
    t_coord = dataset.coords["t"]

    for label_name, dim, prefix in [
        ("core_label", "core", "core"),
        ("thick_anvil_label", "anvil", "thick_anvil"),
        ("thin_anvil_label", "anvil", "thin_anvil"),
    ]:
        if dataset.coords[dim].size:
            _object_properties(
                dataset, label_name, dim, prefix, areas, t_coord, lat, lon
            )
    for step_name, step_dim, prefix in [
        ("core_step_label", "core_step", "core_step"),
        ("thick_anvil_step_label", "thick_anvil_step", "thick_anvil_step"),
        ("thin_anvil_step_label", "thin_anvil_step", "thin_anvil_step"),
    ]:
        if step_name in dataset and dataset.coords[step_dim].size:
            _step_properties(
                dataset, step_name, step_dim, prefix, areas, t_coord, lat, lon
            )

    # max-area step per object (core_max_area, core_max_area_t, ...)
    for prefix, step_prefix, dim, link in [
        ("core", "core_step", "core", "core_step_core_index"),
        ("thick_anvil", "thick_anvil_step", "anvil", "thick_anvil_step_anvil_index"),
        ("thin_anvil", "thin_anvil_step", "anvil", "thin_anvil_step_anvil_index"),
    ]:
        if f"{step_prefix}_area" not in dataset or link not in dataset:
            continue
        step_area = _v(dataset[f"{step_prefix}_area"])
        step_t = _v(dataset[f"{step_prefix}_t"])
        step_obj = _v(dataset[link])
        objs = dataset.coords[dim]
        max_area = np.zeros(objs.size)
        max_area_t = np.full(objs.size, np.datetime64("NaT"), dtype=step_t.dtype)
        for i, obj in enumerate(objs):
            wh = step_obj == obj
            if np.any(wh):
                j = np.argmax(step_area[wh])
                max_area[i] = step_area[wh][j]
                max_area_t[i] = step_t[wh][j]
        _add(
            dataset, f"{prefix}_max_area", max_area, (dim,),
            long_name=f"maximum area of {prefix}", units="km^2", dtype=np.float64,
        )
        _add(
            dataset, f"{prefix}_max_area_t", max_area_t, (dim,),
            long_name=f"time of maximum area of {prefix}",
        )
        # start positions: location of the earliest step of each object
        pos_names = ["x", "y"] + (
            ["lat", "lon"] if f"{step_prefix}_lat" in dataset else []
        )
        start_prefix = "anvil" if prefix == "thick_anvil" else prefix
        if prefix != "thin_anvil":  # reference: core_start_* and anvil_start_*
            for pos in pos_names:
                step_pos = _v(dataset[f"{step_prefix}_{pos}"])
                start_pos = np.full(objs.size, np.nan)
                for i, obj in enumerate(objs):
                    wh = step_obj == obj
                    if np.any(wh):
                        start_pos[i] = step_pos[wh][np.argmin(step_t[wh])]
                _add(
                    dataset, f"{start_prefix}_start_{pos}", start_pos, (dim,),
                    long_name=f"initial {pos} location of {start_prefix}",
                    dtype=np.float64,
                )
