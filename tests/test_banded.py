"""Banded-shift gather vs the exact gather path."""

import numpy as np
import pytest

from tobac_flow_tpu.ops.banded import (
    banded_gather_axis,
    banded_warp_axis,
    warp_banded,
    warp_banded_exact,
)
from tobac_flow_tpu.ops.warp import warp_plane


def test_banded_integer_gather_axis():
    rng = np.random.default_rng(0)
    img = rng.random((3, 12, 16)).astype(np.float32)
    disp = rng.integers(-4, 5, img.shape).astype(np.int32)
    out = np.asarray(banded_gather_axis(img, disp, -1, 4, fill_value=np.nan))
    for t in range(3):
        for y in range(12):
            for x in range(16):
                sx = x + disp[t, y, x]
                if 0 <= sx < 16:
                    assert out[t, y, x] == img[t, y, sx]
                else:
                    assert np.isnan(out[t, y, x])


def test_banded_warp_axis_linear():
    img = np.arange(20, dtype=np.float32).reshape(4, 5)
    disp = np.full((4, 5), 0.5, np.float32)
    out = np.asarray(banded_warp_axis(img, disp, -1, 2))
    assert np.allclose(out[:, :4], img[:, :4] + 0.5)
    assert np.all(np.isnan(out[:, 4]))


def test_warp_banded_matches_exact_constant_flow():
    rng = np.random.default_rng(1)
    img = rng.random((24, 32)).astype(np.float32)
    flow = np.zeros((24, 32, 2), np.float32)
    flow[..., 0] = 2.25
    flow[..., 1] = -1.5
    exact = np.asarray(warp_plane(img, flow, [(0, 0)], method="linear"))[0]
    band = np.asarray(warp_banded(img, flow, radius=4, method="linear"))
    both = np.isfinite(exact) & np.isfinite(band)
    assert np.allclose(exact[both], band[both], atol=1e-5)
    # fill regions agree
    assert np.array_equal(np.isfinite(exact), np.isfinite(band))


def test_warp_banded_smooth_flow_close_to_exact():
    # the two-pass approximation's value error is bounded by
    # |∂dy/∂x|·|dx| · |∇img| — meaningful only for smooth images and smooth
    # flow, which is exactly the regime the pipeline warps in (BT fields +
    # box-filtered Farneback flow)
    h, w = 40, 48
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    img = (np.sin(xx / 5) * np.cos(yy / 7) * 10).astype(np.float32)
    flow = np.stack(
        [2 * np.sin(yy / 15) + 1.0, np.cos(xx / 20) - 0.5], axis=-1
    ).astype(np.float32)
    exact = np.asarray(warp_plane(img, flow, [(0, 0)], method="linear"))[0]
    band = np.asarray(warp_banded(img, flow, radius=4, method="linear"))
    both = np.isfinite(exact) & np.isfinite(band)
    close = np.isclose(exact[both], band[both], atol=0.3)
    assert close.mean() > 0.98


@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_warp_banded_exact_matches_gather_on_rough_flow(method):
    # ROUGH per-pixel random flow — the regime where the separable two-pass
    # warp diverges (dy evaluated at the x-shifted column).  The exact banded
    # form must match the per-pixel gather path bit-for-bit up to fp
    # accumulation order.
    rng = np.random.default_rng(7)
    img = rng.normal(0, 10, (33, 47)).astype(np.float32)
    flow = rng.uniform(-3.7, 3.7, (33, 47, 2)).astype(np.float32)
    # sprinkle exact-integer displacements to exercise the zero-weight masking
    mask = rng.random((33, 47)) < 0.2
    flow[mask] = np.round(flow[mask])
    exact = np.asarray(warp_plane(img, flow, [(0, 0)], method=method))[0]
    band = np.asarray(
        warp_banded_exact(img, flow, method=method, radius_y=5, radius_x=5)
    )
    assert np.array_equal(np.isnan(exact), np.isnan(band))
    ok = np.isfinite(exact)
    assert np.allclose(exact[ok], band[ok], atol=1e-4)


def test_warp_banded_exact_beats_separable_on_rough_flow():
    # sanity that the test above is actually exercising the failure mode
    rng = np.random.default_rng(3)
    img = rng.normal(0, 10, (40, 40)).astype(np.float32)
    flow = rng.uniform(-3.0, 3.0, (40, 40, 2)).astype(np.float32)
    oracle = np.asarray(warp_plane(img, flow, [(0, 0)], method="linear"))[0]
    sep = np.asarray(warp_banded(img, flow, radius=4, method="linear"))
    ex = np.asarray(warp_banded_exact(img, flow, radius_y=4, radius_x=4))
    ok = np.isfinite(oracle) & np.isfinite(sep) & np.isfinite(ex)
    err_sep = np.abs(sep[ok] - oracle[ok]).max()
    err_ex = np.abs(ex[ok] - oracle[ok]).max()
    assert err_ex < 1e-4 < err_sep


def test_warp_banded_exact_batched_and_edge_mode():
    rng = np.random.default_rng(11)
    img = rng.normal(0, 5, (3, 17, 21)).astype(np.float32)
    flow = rng.uniform(-2.5, 2.5, (3, 17, 21, 2)).astype(np.float32)
    out = np.asarray(
        warp_banded_exact(img, flow, radius_y=4, radius_x=4, pad_mode="edge")
    )
    # edge padding: no NaNs anywhere, and interior matches the gather oracle
    assert np.isfinite(out).all()
    for t in range(3):
        oracle = np.asarray(warp_plane(img[t], flow[t], [(0, 0)], method="linear"))[0]
        ok = np.isfinite(oracle)
        ok[:4] = ok[-4:] = False
        ok[:, :4] = ok[:, -4:] = False
        assert np.allclose(oracle[ok], out[t][ok], atol=1e-4)


@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_warp_banded_exact_multi_matches_per_offset(method):
    from tobac_flow_tpu.ops.banded import warp_banded_exact_multi

    rng = np.random.default_rng(21)
    img = rng.normal(0, 10, (29, 37)).astype(np.float32)
    flow = rng.uniform(-2.8, 2.8, (29, 37, 2)).astype(np.float32)
    offsets = [(0, 0), (1, 0), (-1, 0), (0, 1), (0, -1), (1, -1)]
    multi = np.asarray(
        warp_banded_exact_multi(
            img, flow, offsets, radius_y=4, radius_x=4, method=method
        )
    )
    for i, (ox, oy) in enumerate(offsets):
        off = np.asarray([ox, oy], np.float32)
        single = np.asarray(
            warp_banded_exact(
                img, flow + off, method=method, radius_y=5, radius_x=5
            )
        )
        assert np.array_equal(np.isnan(single), np.isnan(multi[i])), (ox, oy)
        ok = np.isfinite(single)
        assert np.allclose(single[ok], multi[i][ok], atol=1e-4), (ox, oy)


def test_warp_banded_nearest_int_labels():
    labels = np.arange(30, dtype=np.int32).reshape(5, 6)
    flow = np.zeros((5, 6, 2), np.float32)
    flow[..., 0] = 1.0
    out = np.asarray(
        warp_banded(labels, flow, radius=2, method="nearest", fill_value=0)
    )
    assert out.dtype == labels.dtype
    assert np.array_equal(out[:, :5], labels[:, 1:])
    assert np.all(out[:, 5] == 0)


@pytest.mark.parametrize("method", ["linear", "cubic", "nearest"])
def test_warp_banded_exact_multi_dyn_bounds_bit_exact(method):
    """Traced dynamic sweep bounds skip strips no displacement touches —
    results must be BIT-identical to the full static sweep."""
    import jax.numpy as jnp
    from tobac_flow_tpu.ops.banded import warp_banded_exact_multi

    rng = np.random.default_rng(77)
    img = rng.normal(0, 10, (31, 43)).astype(np.float32)
    offsets = [(-1, -1), (0, -1), (1, 0), (0, 1), (1, 1)]
    for lo_y, hi_y, lo_x, hi_x in [(-3.0, 2.0, -1.0, 4.0), (0.0, 0.0, 0.0, 0.0)]:
        dy = rng.uniform(lo_y, hi_y, (31, 43)).astype(np.float32)
        dx = rng.uniform(lo_x, hi_x, (31, 43)).astype(np.float32)
        flow = np.stack([dx, dy], -1)
        full = np.asarray(
            warp_banded_exact_multi(img, flow, offsets, 21, 21, method=method)
        )
        db = (
            jnp.floor(jnp.min(dy)).astype(jnp.int32),
            jnp.ceil(jnp.max(dy)).astype(jnp.int32),
            jnp.floor(jnp.min(dx)).astype(jnp.int32),
            jnp.ceil(jnp.max(dx)).astype(jnp.int32),
        )
        dyn = np.asarray(
            warp_banded_exact_multi(
                img, flow, offsets, 21, 21, method=method, dyn_bounds=db
            )
        )
        assert np.array_equal(full, dyn, equal_nan=True), (method, lo_y, hi_y)


@pytest.mark.parametrize("method", ["nearest", "linear", "cubic"])
def test_outlier_plan_convolve_matches_exact_gather(method):
    """Per-frame plan + point_warp_fix: smooth flow with ±19 px noise spikes
    must match the per-pixel exact gather path bit-for-bit (the spikes land
    outside the planned per-frame sweep bounds and ride the sparse repair)."""
    import sys

    import jax.numpy as jnp

    conv_mod = sys.modules["tobac_flow_tpu.ops.convolve"]
    rng = np.random.default_rng(7)
    t, h, w = 4, 40, 48
    data = rng.random((t, h, w)).astype(np.float32) * 50
    fwd = rng.normal(0, 0.6, (t, h, w, 2)).astype(np.float32)
    bwd = rng.normal(0, 0.6, (t, h, w, 2)).astype(np.float32)
    # scatter hard outliers into every frame of both flows
    for arr in (fwd, bwd):
        for i in range(t):
            ys = rng.integers(0, h, 17)
            xs = rng.integers(0, w, 17)
            arr[i, ys, xs, 0] = rng.uniform(-19, 19, 17)
            arr[i, ys, xs, 1] = rng.uniform(-19, 19, 17)

    # the traced per-frame plan must bound the sweep below the outliers and
    # carry their positions in the repair tail
    bounds, pos = conv_mod._flow_frame_plan(jnp.asarray(fwd[0]), 64)
    assert int(bounds[1]) <= 8, "outliers must not inflate the sweep bounds"
    assert int((np.asarray(pos) >= 0).sum()) >= 17

    structure = np.ones((3, 3, 3), bool)
    prev_k = conv_mod.set_plan_frame_k(64)
    try:
        banded = np.asarray(
            conv_mod.convolve(data, fwd, bwd, structure=structure, method=method)
        )
    finally:
        conv_mod.set_plan_frame_k(prev_k)
    prev = conv_mod.set_fast_warp(False)
    try:
        exact = np.asarray(
            conv_mod.convolve(data, fwd, bwd, structure=structure, method=method)
        )
    finally:
        conv_mod.set_fast_warp(prev)
    both = np.isfinite(exact) & np.isfinite(banded)
    assert np.array_equal(np.isfinite(exact), np.isfinite(banded))
    # fp accumulation order differs between the banded and gather paths
    # (precedent: test_warp_banded_exact_matches_gather_on_rough_flow)
    np.testing.assert_allclose(banded[both], exact[both], rtol=0, atol=3e-4)

    # vs the plan-disabled banded path (per-frame signed min/max bounds =
    # every displacement swept): BIT-exact — in-bounds pixels share the
    # accumulation order, outliers reproduce it in the point fix
    prev_k = conv_mod.set_plan_frame_k(0)
    try:
        full = np.asarray(
            conv_mod.convolve(data, fwd, bwd, structure=structure, method=method)
        )
    finally:
        conv_mod.set_plan_frame_k(prev_k)
    np.testing.assert_array_equal(banded, full)
