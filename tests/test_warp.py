"""Warp semantics contract tests, mirroring the reference suite
(/root/reference/tests/test_flow.py:94-161): zero flow is identity, unit flow
shifts by one pixel, half flow linearly interpolates. Extended with a cv2
oracle comparison on random flows."""

import numpy as np
import pytest

from tobac_flow_tpu.ops.warp import warp_flow, warp_plane, shift_plane


def test_warp_flow_zero_flow():
    test_arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    flow_arr = np.zeros(test_arr.shape + (2,), dtype=np.float32)
    warp_arr = np.asarray(warp_flow(test_arr, flow_arr))
    wh_nan = np.isnan(warp_arr)
    assert np.all(warp_arr[~wh_nan] == test_arr[~wh_nan])


def test_warp_flow_one_x_flow():
    test_arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    flow_arr = np.zeros(test_arr.shape + (2,), dtype=np.float32)
    flow_arr[..., 0] = 1
    warp_arr = np.asarray(warp_flow(test_arr, flow_arr))[:, :-1]
    wh_nan = np.isnan(warp_arr)
    assert np.all(warp_arr[~wh_nan] == test_arr[:, 1:][~wh_nan])


def test_warp_flow_one_y_flow():
    test_arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    flow_arr = np.zeros(test_arr.shape + (2,), dtype=np.float32)
    flow_arr[..., 1] = 1
    warp_arr = np.asarray(warp_flow(test_arr, flow_arr))[:-1]
    wh_nan = np.isnan(warp_arr)
    assert np.all(warp_arr[~wh_nan] == test_arr[1:][~wh_nan])


def test_warp_flow_one_xy_flow():
    test_arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    flow_arr = np.ones(test_arr.shape + (2,), dtype=np.float32)
    warp_arr = np.asarray(warp_flow(test_arr, flow_arr))[:-1, :-1]
    wh_nan = np.isnan(warp_arr)
    assert np.all(warp_arr[~wh_nan] == test_arr[1:, 1:][~wh_nan])


def test_warp_flow_half_x_flow():
    test_arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    flow_arr = np.zeros(test_arr.shape + (2,), dtype=np.float32)
    flow_arr[..., 0] = 0.5
    warp_arr = np.asarray(warp_flow(test_arr, flow_arr))[:, :-1]
    wh_nan = np.isnan(warp_arr)
    expected = (test_arr[:, 1:] + test_arr[:, :-1]) * 0.5
    assert np.allclose(warp_arr[~wh_nan], expected[~wh_nan])


def test_warp_flow_out_of_frame_nan():
    test_arr = np.arange(15, dtype=np.float32).reshape(3, 5)
    flow_arr = np.full(test_arr.shape + (2,), 10.0, dtype=np.float32)
    warp_arr = np.asarray(warp_flow(test_arr, flow_arr))
    assert np.all(np.isnan(warp_arr))


def test_warp_flow_nearest_int_labels():
    labels = np.arange(12, dtype=np.int32).reshape(3, 4)
    flow_arr = np.zeros(labels.shape + (2,), dtype=np.float32)
    flow_arr[..., 0] = 1.2  # rounds to 1
    out = np.asarray(warp_flow(labels, flow_arr, method="nearest", fill_value=0))
    assert out.dtype == labels.dtype
    assert np.all(out[:, :-1] == labels[:, 1:])
    assert np.all(out[:, -1] == 0)


@pytest.mark.parametrize("method", ["linear", "cubic", "lanczos"])
def test_warp_flow_against_cv2(method):
    cv2 = pytest.importorskip("cv2")
    interp = {
        "linear": cv2.INTER_LINEAR,
        "cubic": cv2.INTER_CUBIC,
        "lanczos": cv2.INTER_LANCZOS4,
    }[method]
    rng = np.random.default_rng(42)
    img = rng.random((24, 31)).astype(np.float32) * 100
    flow = (rng.random((24, 31, 2)).astype(np.float32) - 0.5) * 3

    h, w = img.shape
    locs = flow.copy()
    locs[..., 0] += np.arange(w)
    locs[..., 1] += np.arange(h)[:, None]
    oracle = cv2.remap(
        img, locs, None, interp, None, cv2.BORDER_CONSTANT, np.nan
    )
    ours = np.asarray(warp_flow(img, flow, method=method))
    both = np.isfinite(oracle) & np.isfinite(ours)
    # cv2 NaNs a wider border ring for wide stencils; require agreement on the
    # mutual-finite interior and that cv2's finite set is covered by ours.
    # cv2 LANCZOS4 quantises fractional coordinates to 1/32 (fixed-point
    # interpolation tables); we interpolate at exact fractions, so allow the
    # corresponding bound there.
    atol = 3.0 if method == "lanczos" else 1e-3
    assert both.sum() > 200
    assert (np.isfinite(oracle) & ~np.isfinite(ours)).mean() < 0.02
    assert np.allclose(ours[both], oracle[both], atol=atol)


def test_shift_plane_matches_indexing():
    img = np.arange(20, dtype=np.float32).reshape(4, 5)
    out = np.asarray(shift_plane(img, [(1, 0), (0, -1), (-1, 1)], fill_value=np.nan))
    # out[k, y, x] = img[y + oy, x + ox]
    assert np.all(out[0][:, :-1] == img[:, 1:])
    assert np.all(np.isnan(out[0][:, -1]))
    assert np.all(out[1][1:] == img[:-1])
    assert np.all(np.isnan(out[1][0]))
    assert np.all(out[2][:-1, 1:] == img[1:, :-1])


def test_warp_plane_offsets_match_single_warps():
    rng = np.random.default_rng(0)
    img = rng.random((10, 12)).astype(np.float32)
    flow = (rng.random((10, 12, 2)).astype(np.float32) - 0.5) * 2
    offsets = [(-1, 0), (0, 0), (1, 1)]
    multi = np.asarray(warp_plane(img, flow, offsets, method="linear"))
    for k, (ox, oy) in enumerate(offsets):
        single = np.asarray(
            warp_plane(img, flow + np.array([ox, oy], np.float32), [(0, 0)])
        )[0]
        both = np.isfinite(multi[k]) & np.isfinite(single)
        assert np.allclose(multi[k][both], single[both], atol=1e-5)
