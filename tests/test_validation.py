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
