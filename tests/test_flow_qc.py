"""Flow QC helpers: pairwise flow, magnitude-weighted merge, warp residuals."""

import numpy as np

from tobac_flow_tpu.core.flow import (
    Flow,
    calculate_flow_2,
    calculate_flow_frame,
    combine_flow,
    create_flow,
    flow_diff_mse_estimate,
    get_forward_warp,
)


def _moving_blob(t, h, w, sx):
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.stack(
        [
            200.0 * np.exp(-((xx - 20 - sx * i) ** 2 + (yy - 16) ** 2) / 30.0)
            for i in range(t)
        ]
    )


def test_calculate_flow_frame_recovers_shift():
    frames = _moving_blob(2, 32, 64, 2.0)
    fwd, bwd = calculate_flow_frame(frames[0], frames[1])
    m = frames[0] > 30
    assert np.allclose(np.median(np.asarray(fwd)[m][:, 0]), 2.0, atol=0.3)
    assert np.allclose(np.median(np.asarray(bwd)[m][:, 0]), -2.0, atol=0.3)


def test_calculate_flow_2_between_two_stacks():
    a = _moving_blob(3, 32, 64, 2.0)
    b = _moving_blob(3, 32, 64, 2.0) * 0 + np.roll(a, 3, axis=2)
    # returns (forward, backward) arrays (reference ``flow.py:431-496``)
    fwd, bwd = calculate_flow_2(a, b)
    m = a > 30
    assert np.allclose(np.median(np.asarray(fwd)[m][:, 0]), 3.0, atol=0.4)


def test_combine_flow_magnitude_weighted():
    shape = (2, 8, 8, 2)
    small = Flow(np.full(shape, 0.1, np.float32), np.full(shape, -0.1, np.float32))
    big = Flow(np.full(shape, 3.0, np.float32), np.full(shape, -3.0, np.float32))
    merged = combine_flow(small, big)
    # the larger-magnitude field dominates the weighted average
    val = np.asarray(merged.forward_flow)[0, 0, 0, 0]
    assert 1.5 < val < 3.0


def test_forward_warp_and_mse():
    frames = _moving_blob(4, 32, 64, 2.0)
    flow = create_flow(frames, model="Farneback")
    warp = get_forward_warp(frames, flow)
    # warp[i] is frame i+1 sampled back along the forward flow, i.e. aligned
    # to frame i's coordinates — the residual vs frame i must beat the static
    # frame-to-frame difference
    err_flow = np.nanmean((warp[:-1] - frames[:-1]) ** 2)
    err_static = np.nanmean((frames[1:] - frames[:-1]) ** 2)
    assert err_flow < 0.5 * err_static

    all_sky, cold = flow_diff_mse_estimate(frames, flow, cold_threshold=100.0)
    assert np.isfinite(all_sky)
    assert all_sky >= 0
