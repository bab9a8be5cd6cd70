"""Morphology ops vs scipy.ndimage oracles."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from tobac_flow_tpu.ops import morphology as m


@pytest.fixture
def mask3d():
    rng = np.random.default_rng(0)
    return rng.random((3, 20, 24)) > 0.5


def s_struct_2d_in_3d():
    s = ndi.generate_binary_structure(3, 1)
    s[0] = 0
    s[2] = 0
    return s


def test_binary_erosion_matches_scipy(mask3d):
    for structure in [None, s_struct_2d_in_3d(), np.ones((3, 3, 3))]:
        ours = np.asarray(m.binary_erosion(mask3d, structure=structure))
        oracle = ndi.binary_erosion(mask3d, structure=structure)
        assert np.array_equal(ours, oracle)


def test_binary_erosion_iterations_border(mask3d):
    ours = np.asarray(
        m.binary_erosion(mask3d, structure=np.ones((1, 3, 3)), iterations=3, border_value=1)
    )
    oracle = ndi.binary_erosion(
        mask3d, structure=np.ones((1, 3, 3)), iterations=3, border_value=1
    )
    assert np.array_equal(ours, oracle)


def test_binary_dilation_matches_scipy(mask3d):
    # use an asymmetric structure to catch offset sign errors
    s = np.zeros((3, 3, 3), bool)
    s[1, 1, 1] = s[1, 1, 2] = s[1, 0, 1] = True
    ours = np.asarray(m.binary_dilation(mask3d, structure=s))
    oracle = ndi.binary_dilation(mask3d, structure=s)
    assert np.array_equal(ours, oracle)


def test_binary_opening_matches_scipy(mask3d):
    s = s_struct_2d_in_3d()
    ours = np.asarray(m.binary_opening(mask3d, structure=s))
    oracle = ndi.binary_opening(mask3d, structure=s)
    assert np.array_equal(ours, oracle)


def test_fill_holes_matches_scipy():
    mask = np.zeros((2, 12, 12), bool)
    mask[:, 2:10, 2:10] = True
    mask[:, 4:8, 4:8] = False  # hole
    mask[1, 0:4, 0] = True  # touching border
    s = s_struct_2d_in_3d()
    ours = np.asarray(m.binary_fill_holes(mask, structure=s))
    oracle = ndi.binary_fill_holes(mask, structure=s)
    assert np.array_equal(ours, oracle)


def test_grey_opening_matches_scipy():
    rng = np.random.default_rng(1)
    data = rng.random((3, 16, 16)).astype(np.float32)
    foot = ndi.generate_binary_structure(2, 1)[np.newaxis, ...]
    ours = np.asarray(m.grey_opening(data, footprint=foot))
    oracle = ndi.grey_opening(data, footprint=foot)
    assert np.allclose(ours, oracle)


def test_maximum_filter_matches_scipy():
    rng = np.random.default_rng(2)
    data = rng.random((10, 12)).astype(np.float32)
    ours = np.asarray(m.maximum_filter(data, 5))
    oracle = ndi.maximum_filter(data, 5)
    # scipy uses reflect border for max filter; ours uses -inf fill: compare interior
    assert np.allclose(ours[2:-2, 2:-2], oracle[2:-2, 2:-2])


def test_gaussian_filter_matches_scipy():
    rng = np.random.default_rng(3)
    data = rng.random((4, 24, 24)).astype(np.float32)
    ours = np.asarray(m.gaussian_filter(data, (0, 2, 2)))
    oracle = ndi.gaussian_filter(data, (0, 2, 2))
    assert np.allclose(ours, oracle, atol=2e-5)


def test_nan_gaussian_filter():
    rng = np.random.default_rng(4)
    data = rng.random((20, 20)).astype(np.float32)
    data[5:8, 5:8] = np.nan
    out = np.asarray(m.nan_gaussian_filter(data, 2))
    assert np.all(np.isnan(out[5:8, 5:8]))
    far = np.asarray(m.gaussian_filter(np.nan_to_num(data, nan=0), 2))
    # away from the NaN hole the result approaches the plain filter
    assert np.allclose(out[15:, 15:], far[15:, 15:], atol=1e-3)


def test_distance_transform_edt_matches_scipy():
    rng = np.random.default_rng(5)
    mask = rng.random((18, 22)) > 0.3
    ours = m.distance_transform_edt(mask)
    oracle = ndi.distance_transform_edt(mask)
    assert np.allclose(ours, oracle)


def test_distance_transform_edt_sampling():
    mask = np.ones((3, 10, 10), bool)
    mask[:, 5, 5] = False
    ours = m.distance_transform_edt(mask, sampling=(1e9, 1, 1))
    oracle = ndi.distance_transform_edt(mask, sampling=(1e9, 1, 1))
    # per-frame 2D distances, no temporal leakage
    assert np.allclose(ours, oracle)


def test_peak_local_max_mask():
    frame = np.zeros((20, 20), np.float32)
    frame[5, 5] = 2.0
    frame[14, 15] = 3.0
    frame[6, 6] = 1.0  # suppressed by (5,5) within min_distance
    peaks = np.asarray(m.peak_local_max_mask(frame, min_distance=3, threshold_abs=0.5))
    assert peaks[5, 5] and peaks[14, 15]
    assert not peaks[6, 6]
    # border exclusion
    frame2 = np.zeros((20, 20), np.float32)
    frame2[1, 1] = 5.0
    assert not np.asarray(
        m.peak_local_max_mask(frame2, min_distance=3, threshold_abs=0.5)
    ).any()


def test_fill_holes_multigrid_sizes_match_scipy():
    """Sizes that trigger the multigrid flood seeding (h, w >= 16) must stay
    bit-identical to scipy — the coarse reach only seeds provably-reachable
    pixels, never changing the fixed point."""
    rng = np.random.default_rng(5)
    grid = np.abs(np.indices((3, 3, 3)) - 1).sum(axis=0) <= 1
    for shape, p in [((6, 80, 96), 0.35), ((4, 64, 64), 0.25),
                     ((3, 33, 47), 0.45), ((2, 128, 200), 0.55)]:
        mask = rng.random(shape) < p
        mask[:, 10:30, 10:40] = True
        mask[:, 15:25, 18:32] = False
        ours = np.asarray(m.binary_fill_holes(mask, structure=grid))
        assert np.array_equal(ours, ndi.binary_fill_holes(mask, structure=grid))
    s2d = np.zeros((3, 3, 3), bool)
    s2d[1, 1, :] = True
    s2d[1, :, 1] = True
    mask = rng.random((5, 96, 96)) < 0.4
    ours = np.asarray(m.binary_fill_holes(mask, structure=s2d))
    assert np.array_equal(ours, ndi.binary_fill_holes(mask, structure=s2d))
