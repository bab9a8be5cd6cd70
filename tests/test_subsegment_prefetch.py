"""Subsegmentation and host-prefetch tests."""

import numpy as np

from tobac_flow_tpu.data.prefetch import WindowPrefetcher
from tobac_flow_tpu.segment.subsegment import subsegment_labels


def test_subsegment_splits_touching_blobs():
    # two discs joined by a thin bridge: one flat label, two subsegments
    h, w = 40, 80
    yy, xx = np.mgrid[0:h, 0:w]
    mask = ((xx - 20) ** 2 + (yy - 20) ** 2 < 100) | (
        (xx - 60) ** 2 + (yy - 20) ** 2 < 100
    )
    mask |= (np.abs(yy - 20) <= 1) & (xx >= 20) & (xx <= 60)
    mask3 = mask[None]

    out = subsegment_labels(mask3, shrink_factor=0.2)
    assert out.shape == mask3.shape
    labels_left = np.unique(out[0][(xx < 35) & mask])
    labels_right = np.unique(out[0][(xx > 45) & mask])
    labels_left = labels_left[labels_left > 0]
    labels_right = labels_right[labels_right > 0]
    assert labels_left.size >= 1 and labels_right.size >= 1
    # the two disc cores carry different subsegment labels
    assert not np.intersect1d(labels_left, labels_right).size


def test_subsegment_preserves_mask():
    mask = np.zeros((2, 20, 20), bool)
    mask[:, 5:15, 5:15] = True
    out = subsegment_labels(mask, shrink_factor=0.1)
    assert ((out != 0) == mask).all()


def test_window_prefetcher_order_and_content():
    def loader(spec):
        return {"x": np.full((4, 4), spec, dtype=np.float32)}

    items = list(WindowPrefetcher(loader, [1, 2, 3], device_put=False))
    assert [s for s, _ in items] == [1, 2, 3]
    assert all(np.all(np.asarray(d["x"]) == s) for s, d in items)


def test_window_prefetcher_propagates_errors():
    def loader(spec):
        if spec == 2:
            raise ValueError("boom")
        return spec

    import pytest

    with pytest.raises(ValueError):
        list(WindowPrefetcher(loader, [1, 2, 3], device_put=False))
