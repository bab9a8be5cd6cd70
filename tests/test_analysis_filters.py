"""Analysis-layer tests (mirrors reference tests/test_analysis.py edge cases
plus the label filters)."""

import numpy as np

from tobac_flow_tpu.detect.analysis import (
    filter_labels_by_length,
    filter_labels_by_length_and_mask,
    filter_labels_by_mask,
    filter_labels_by_multimask,
    find_object_lengths,
    mask_labels,
    n_unique_along_axis,
)


def _labels():
    labels = np.zeros((5, 6, 6), np.int32)
    labels[0:4, 1:3, 1:3] = 1  # 4 steps long
    labels[2:3, 4:6, 4:6] = 2  # 1 step long
    labels[0:5, 0:1, 4:5] = 3  # 5 steps long
    return labels


def test_find_object_lengths():
    lengths = find_object_lengths(_labels())
    assert np.array_equal(lengths, [4, 1, 5])


def test_find_object_lengths_spatial_axis():
    lengths = find_object_lengths(_labels(), axis=1)
    assert np.array_equal(lengths, [2, 2, 1])


def test_mask_labels():
    labels = _labels()
    mask = np.zeros_like(labels, bool)
    mask[2, 4:6, 4:6] = True  # overlaps only label 2
    out = mask_labels(labels, mask)
    assert np.array_equal(out, [False, True, False])


def test_mask_labels_empty_mask():
    labels = _labels()
    out = mask_labels(labels, np.zeros_like(labels, bool))
    assert not out.any()


def test_filter_labels_by_length_renumbers():
    out = filter_labels_by_length(_labels(), 4)
    # labels 1 (len 4) and 3 (len 5) survive and become 1, 2
    assert set(np.unique(out)) == {0, 1, 2}
    assert (out[0:4, 1:3, 1:3] == 1).all()
    assert (out[:, 0:1, 4:5] == 2).all()


def test_filter_labels_by_mask():
    labels = _labels()
    mask = np.zeros_like(labels, bool)
    mask[0, 1, 1] = True
    out = filter_labels_by_mask(labels, mask)
    assert set(np.unique(out)) == {0, 1}
    assert (out[0:4, 1:3, 1:3] == 1).all()


def test_filter_labels_by_length_and_mask():
    labels = _labels()
    mask = np.ones_like(labels, bool)
    out = filter_labels_by_length_and_mask(labels, mask, 5)
    assert set(np.unique(out)) == {0, 1}  # only label 3 survives, renamed 1


def test_filter_labels_by_multimask():
    labels = _labels()
    m1 = np.zeros_like(labels, bool)
    m1[0:4, 1:3, 1:3] = True  # label 1
    m2 = np.ones_like(labels, bool)
    out = filter_labels_by_multimask(labels, [m1, m2])
    assert set(np.unique(out)) == {0, 1}


def test_n_unique_along_axis():
    a = np.array([[0, 1, 1], [2, 1, 0], [3, 1, 0]])
    # per column over axis 0: {2,3}=2, {1}=1, {1}=1
    assert np.array_equal(n_unique_along_axis(a, 0), [2, 1, 1])
