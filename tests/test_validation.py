"""Validation (POD/FAR) tests on synthetic flashes."""

import numpy as np

from tobac_flow_tpu.validate.validation import (
    get_edge_filter,
    get_marker_distance_cylinder,
    validate_markers,
)


def test_marker_distance_cylinder():
    labels = np.zeros((5, 30, 30), np.int32)
    labels[2, 15, 15] = 1
    dist = get_marker_distance_cylinder(labels, time_margin=1)
    assert dist[2, 15, 15] == 0
    assert dist[2, 15, 20] == 5
    assert dist[1, 15, 15] == 0  # within the time cylinder
    assert np.isinf(dist[0, 15, 15])  # outside it


def test_edge_filter():
    filt = get_edge_filter((6, 40, 40), margin=5)
    assert not filt[0].any() and not filt[-1].any()
    assert not filt[2, :5].any()
    assert filt[2, 10, 10]


def test_validate_markers_pod_far():
    t, h, w = 6, 60, 60
    labels = np.zeros((t, h, w), np.int32)
    labels[1:5, 20:30, 20:30] = 1  # detected object
    labels[1:5, 45:50, 45:50] = 2  # false-alarm object, far from flashes
    glm = np.zeros((t, h, w), np.int32)
    glm[2, 25, 25] = 3  # flashes inside the object
    glm[3, 25, 31] = 1  # flash within margin of the object
    edge = get_edge_filter((t, h, w), margin=5)
    dist, flash_dist, pod, far, n_obj, n_glm = validate_markers(
        labels, glm, None, edge, margin=10
    )
    assert n_glm == 4
    assert pod == 1.0  # all flashes within margin of object 1
    assert n_obj == 2
    assert far == 0.5  # object 2 is far from all flashes


def test_validate_markers_no_flashes():
    labels = np.zeros((4, 30, 30), np.int32)
    labels[1:3, 10:15, 10:15] = 1
    glm = np.zeros((4, 30, 30), np.int32)
    edge = get_edge_filter((4, 30, 30), margin=3)
    _, _, pod, far, n_obj, n_glm = validate_markers(labels, glm, None, edge)
    assert np.isnan(pod)
    assert far == 1.0  # the object has no flash anywhere near


def _make_ds():
    from tobac_flow_tpu.data.ncdataset import DataArray, Dataset

    t, h, w = 6, 48, 48
    times = np.datetime64("2018-06-19T12:00") + np.arange(t) * np.timedelta64(
        300, "s"
    )
    cores = np.zeros((t, h, w), np.int32)
    cores[1:5, 22:26, 22:26] = 1
    anvils = np.zeros((t, h, w), np.int32)
    anvils[1:5, 16:32, 16:32] = 1
    glm = np.zeros((t, h, w), np.float32)
    glm[2, 24, 24] = 3.0  # flashes on the core
    ds = Dataset(coords={"t": times, "core": [1], "anvil": [1]})
    ds["core_label"] = DataArray(cores, dims=("t", "y", "x"))
    ds["thick_anvil_label"] = DataArray(anvils, dims=("t", "y", "x"))
    return ds, glm


def test_validate_cores_and_anvils_dataset_entry():
    from tobac_flow_tpu.validate.validation import validate_anvils, validate_cores

    ds, glm = _make_ds()
    pod, far = validate_cores(ds, glm, margin=5, time_margin=2)
    assert pod == 1.0 and far == 0.0
    assert ds["core_glm_distance"].values.shape == (1,)
    assert ds["core_glm_distance"].values[0] == 0.0
    pod_a, far_a = validate_anvils(ds, glm, margin=5, time_margin=2)
    assert pod_a == 1.0 and far_a == 0.0


def test_validate_cores_with_anvils_restricts_flashes():
    from tobac_flow_tpu.validate.validation import validate_cores_with_anvils

    ds, glm = _make_ds()
    # an extra flash outside any anvil must not count
    glm2 = glm.copy()
    glm2[2, 40, 5] = 5.0
    pod, far = validate_cores_with_anvils(ds, glm2, margin=5, time_margin=2)
    assert pod == 1.0 and far == 0.0
    assert ds.attrs["core_with_anvil_pod"] == 1.0


def test_marker_distance_ellipse_time_penalty():
    from tobac_flow_tpu.validate.validation import get_marker_distance_ellipse

    markers = np.zeros((3, 8, 8), np.int32)
    markers[1, 4, 4] = 1
    d = get_marker_distance_ellipse(markers, time_margin=2, aspect=2.0)
    assert d[1, 4, 4] == 0.0
    # one frame away costs the aspect penalty on top of the spatial distance
    assert d[0, 4, 4] == 2.0
    assert d[2, 4, 5] == 3.0


def test_get_min_dist_for_objects():
    from tobac_flow_tpu.validate.validation import get_min_dist_for_objects

    labels = np.zeros((1, 6, 6), np.int32)
    labels[0, 1:3, 1:3] = 1
    labels[0, 4:6, 4:6] = 2
    grid = np.arange(36, dtype=float).reshape(1, 6, 6)
    dists, idx = get_min_dist_for_objects(grid, labels)
    assert list(idx) == [1, 2]
    assert dists[0] == 7.0 and dists[1] == 28.0
