"""Validation of detected objects against GLM lightning flashes.

Parity target: reference ``tobac_flow/validation.py``: per-frame Euclidean
distance to markers with a cylindrical time window
(``get_marker_distance_cylinder`` 52-104), POD/FAR metrics
(``validate_markers`` 107-170; POD = flashes within ``margin`` of an object /
all flashes, FAR = objects farther than ``margin`` from any flash), the
domain/time-gap edge filter (173-219) and the core/anvil entry points that
write per-object distances and flags into the dataset (222-785)."""

from __future__ import annotations

import numpy as np

from tobac_flow_tpu.data.ncdataset import DataArray
from tobac_flow_tpu.ops.morphology import distance_transform_edt
from tobac_flow_tpu.utils.labels import apply_func_to_labels

__all__ = [
    "get_marker_distance",
    "get_marker_distance_cylinder",
    "validate_markers",
    "get_edge_filter",
    "validate_cores",
    "validate_anvils",
]


def _v(a):
    return np.asarray(getattr(a, "values", a))


def get_marker_distance(labels, time_range=1):
    """Distance of each pixel to the nearest marker within ±time_range
    frames (reference ``validation.py:24-49``)."""
    labels = _v(labels)
    t = labels.shape[0]
    dist = np.full(labels.shape, np.inf)
    frame_dist = [
        distance_transform_edt(labels[i] == 0) if np.any(labels[i]) else None
        for i in range(t)
    ]
    for i in range(t):
        for j in range(max(0, i - time_range), min(t, i + time_range + 1)):
            if frame_dist[j] is not None:
                dist[i] = np.minimum(dist[i], frame_dist[j])
    return dist


def get_marker_distance_cylinder(markers, time_margin=3):
    """Cylindrical marker distance: per-frame 2D EDT, minimum over frames
    within the time margin (reference ``validation.py:52-104``)."""
    return get_marker_distance(markers, time_range=time_margin)


def validate_markers(
    labels,
    glm_grid,
    glm_distance,
    edge_filter,
    n_glm_in_margin=None,
    margin=10,
    time_margin=3,
):
    """POD / FAR of detected objects vs flashes
    (reference ``validation.py:107-170``).

    Returns (marker_distance, glm_distance_to_marker, pod, far,
    n_marker_in_margin, n_glm_in_margin).
    """
    labels = _v(labels)
    glm_grid = _v(glm_grid)
    marker_distance = get_marker_distance_cylinder(labels, time_margin)
    if n_glm_in_margin is None:
        n_glm_in_margin = int(np.nansum(glm_grid[edge_filter]))

    # distance from each flash to the nearest object
    wh_flash = (glm_grid > 0) & edge_filter
    flash_distances = marker_distance[wh_flash]
    flash_weights = glm_grid[wh_flash]
    if n_glm_in_margin > 0:
        hits = np.nansum(flash_weights * (flash_distances <= margin))
        pod = float(hits / n_glm_in_margin)
    else:
        pod = np.nan

    # distance from each object to the nearest flash
    flash_dist_grid = get_marker_distance_cylinder(glm_grid, time_margin)
    obj_ids = np.unique(labels[labels != 0])
    if obj_ids.size:
        obj_min_dist = apply_func_to_labels(
            labels, flash_dist_grid, func=np.nanmin, index=obj_ids, default=np.inf
        )
        obj_in_margin = apply_func_to_labels(
            labels, edge_filter, func=np.any, index=obj_ids, default=False
        )
        obj_min_dist = np.atleast_1d(obj_min_dist)
        obj_in_margin = np.atleast_1d(obj_in_margin).astype(bool)
        n_marker_in_margin = int(obj_in_margin.sum())
        if n_marker_in_margin:
            far = float(
                np.sum((obj_min_dist > margin) & obj_in_margin) / n_marker_in_margin
            )
        else:
            far = np.nan
    else:
        obj_min_dist = np.empty(0)
        n_marker_in_margin = 0
        far = np.nan
    return (
        marker_distance,
        flash_dist_grid,
        pod,
        far,
        n_marker_in_margin,
        n_glm_in_margin,
    )


def get_edge_filter(ds_or_shape, t_coord=None, margin=10, max_time_gap=900, glm_cover=None):
    """Mask excluding the spatial margin, window start/end frames and frames
    adjacent to time gaps (reference ``validation.py:173-219``)."""
    if hasattr(ds_or_shape, "coords"):
        shape = _v(ds_or_shape["core_label"]).shape
        t_coord = ds_or_shape.coords["t"]
    else:
        shape = tuple(ds_or_shape)
    filt = np.ones(shape, dtype=bool)
    m = int(margin)
    filt[:, :m] = False
    filt[:, -m:] = False
    filt[:, :, :m] = False
    filt[:, :, -m:] = False
    filt[0] = False
    filt[-1] = False
    if t_coord is not None:
        times = np.asarray(getattr(t_coord, "values", t_coord))
        gaps = np.where(
            np.diff(times).astype("timedelta64[s]").astype(int) > max_time_gap
        )[0]
        for g in gaps:
            filt[g] = False
            filt[min(g + 1, shape[0] - 1)] = False
    if glm_cover is not None:
        filt &= _v(glm_cover).astype(bool)
    return filt


def _validate_objects(dataset, label_name, dim, prefix, glm_grid, margin, time_margin):
    edge_filter = get_edge_filter(
        _v(dataset[label_name]).shape, dataset.coords["t"], margin=margin
    )
    (
        marker_dist,
        flash_dist,
        pod,
        far,
        n_markers,
        n_glm,
    ) = validate_markers(
        dataset[label_name],
        glm_grid,
        None,
        edge_filter,
        margin=margin,
        time_margin=time_margin,
    )
    labels = _v(dataset[label_name])
    index = dataset.coords[dim]
    obj_dist = apply_func_to_labels(
        labels, flash_dist, func=np.nanmin, index=index, default=np.inf
    )
    dataset[f"{prefix}_glm_distance"] = DataArray(
        np.atleast_1d(obj_dist), dims=(dim,), name=f"{prefix}_glm_distance",
        attrs={"long_name": f"distance from {prefix} to nearest GLM flash"},
    )
    dataset.attrs[f"{prefix}_pod"] = pod
    dataset.attrs[f"{prefix}_far"] = far
    dataset.attrs[f"{prefix}_n_in_margin"] = n_markers
    dataset.attrs["n_glm_in_margin"] = n_glm
    return pod, far


def validate_cores(dataset, glm_grid, margin=10, time_margin=3):
    """POD/FAR for cores + per-core flash distances
    (reference ``validation.py:222-…``)."""
    return _validate_objects(
        dataset, "core_label", "core", "core", glm_grid, margin, time_margin
    )


def validate_anvils(dataset, glm_grid, margin=10, time_margin=3, thick=True):
    """POD/FAR for anvils + per-anvil flash distances."""
    name = "thick_anvil_label" if thick else "thin_anvil_label"
    prefix = "thick_anvil" if thick else "thin_anvil"
    return _validate_objects(
        dataset, name, "anvil", prefix, glm_grid, margin, time_margin
    )


def get_min_dist_for_objects(distance_grid, labels, index=None):
    """Minimum distance-grid value within each labelled object
    (reference ``validation.py:12-21``)."""
    labels = _v(labels)
    if index is None:
        index = np.unique(labels[labels != 0])
    out = apply_func_to_labels(
        labels, _v(distance_grid), func=np.nanmin, index=index, default=np.inf
    )
    return np.atleast_1d(out), np.asarray(index)


def get_marker_distance_ellipse(markers, time_margin=3, aspect=1.0):
    """Marker distance with an ellipsoidal space/time metric: the spatial EDT
    is computed per frame and grown across frames with a per-step penalty
    (reference ``validation.py:24-49`` ellipse variant)."""
    markers = _v(markers)
    t = markers.shape[0]
    frame_dist = [
        distance_transform_edt(markers[i] == 0) if np.any(markers[i]) else None
        for i in range(t)
    ]
    dist = np.full(markers.shape, np.inf)
    for i in range(t):
        for j in range(max(0, i - time_margin), min(t, i + time_margin + 1)):
            if frame_dist[j] is not None:
                penalty = abs(i - j) * aspect
                dist[i] = np.minimum(dist[i], frame_dist[j] + penalty)
    return dist


def validate_cores_with_anvils(dataset, glm_grid, margin=10, time_margin=3):
    """Core POD/FAR where only flashes inside detected anvils count
    (reference ``validation.py`` *_with_anvils variants): the anvil mask
    restricts the valid flash region, separating core placement skill from
    anvil detection skill."""
    anvil_mask = _v(dataset["thick_anvil_label"]) != 0
    edge = get_edge_filter(
        _v(dataset["core_label"]).shape, dataset.coords["t"], margin=margin
    )
    edge = edge & anvil_mask
    out = validate_markers(
        dataset["core_label"], glm_grid, None, edge, margin=margin,
        time_margin=time_margin,
    )
    dataset.attrs["core_with_anvil_pod"] = out[2]
    dataset.attrs["core_with_anvil_far"] = out[3]
    return out[2], out[3]


def validate_anvils_with_cores(dataset, glm_grid, margin=10, time_margin=3):
    """Anvil POD/FAR restricted to anvils that have linked cores."""
    anvils = np.asarray(dataset.coords["anvil"])
    labels = _v(dataset["thick_anvil_label"])
    if "core_anvil_index" in dataset:
        with_core = np.unique(_v(dataset["core_anvil_index"]))
        keep = np.isin(labels, with_core[with_core != 0])
        labels = np.where(keep, labels, 0)
    edge = get_edge_filter(labels.shape, dataset.coords["t"], margin=margin)
    out = validate_markers(
        labels, glm_grid, None, edge, margin=margin, time_margin=time_margin
    )
    dataset.attrs["anvil_with_core_pod"] = out[2]
    dataset.attrs["anvil_with_core_far"] = out[3]
    return out[2], out[3]


def validate_anvil_markers(dataset, glm_grid, margin=10, time_margin=3):
    """POD/FAR of the anvil marker stage (pre-watershed seeds)."""
    if "anvil_marker_label" not in dataset:
        raise KeyError("dataset has no anvil_marker_label (save_anvil_markers)")
    edge = get_edge_filter(
        _v(dataset["anvil_marker_label"]).shape, dataset.coords["t"], margin=margin
    )
    out = validate_markers(
        dataset["anvil_marker_label"], glm_grid, None, edge, margin=margin,
        time_margin=time_margin,
    )
    return out[2], out[3]
