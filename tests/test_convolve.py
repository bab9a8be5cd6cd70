"""Semi-Lagrangian convolve contract tests.

Checks tap ordering (backward plane first, row-major per plane — reference
convolve.py:205-243), boundary-frame fill, NaN propagation under reductions,
and diff/sobel semantics on analytically-known fields."""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.ndimage as ndi

from tobac_flow_tpu.core.flow import Flow
from tobac_flow_tpu.ops.convolve import convolve


def zero_flow(shape):
    return np.zeros(shape + (2,), dtype=np.float32)


def const_flow(shape, fx, fy):
    f = np.zeros(shape + (2,), dtype=np.float32)
    f[..., 0] = fx
    f[..., 1] = fy
    return f


def test_convolve_zero_flow_identity_centre_tap():
    rng = np.random.default_rng(1)
    data = rng.random((4, 6, 7)).astype(np.float32)
    struct = np.zeros((3, 3, 3))
    struct[1, 1, 1] = 1
    out = np.asarray(
        convolve(data, zero_flow(data.shape), zero_flow(data.shape), structure=struct)
    )
    assert out.shape == (1, 4, 6, 7)
    assert np.allclose(out[0], data)


def test_convolve_temporal_taps_zero_flow():
    rng = np.random.default_rng(2)
    data = rng.random((5, 4, 4)).astype(np.float32)
    struct = np.zeros((3, 3, 3))
    struct[:, 1, 1] = 1
    out = np.asarray(
        convolve(data, zero_flow(data.shape), zero_flow(data.shape), structure=struct)
    )
    # taps: [prev, same, next]
    assert np.allclose(out[1], data)
    assert np.allclose(out[0][1:], data[:-1])  # prev plane
    assert np.all(np.isnan(out[0][0]))  # first frame has no prev
    assert np.allclose(out[2][:-1], data[1:])  # next plane
    assert np.all(np.isnan(out[2][-1]))


def test_convolve_flow_displaces_temporal_taps():
    # next frame content is shifted +2 in x; forward flow +2 should recover
    # the current frame content from the next frame.
    t, h, w = 3, 8, 10
    base = np.arange(h * w, dtype=np.float32).reshape(h, w)
    data = np.stack([np.roll(base, i * 2, axis=1) for i in range(t)], axis=0)
    struct = np.zeros((3, 3, 3))
    struct[2, 1, 1] = 1  # forward tap only
    fwd = const_flow(data.shape, 2.0, 0.0)
    out = np.asarray(
        convolve(data, fwd, zero_flow(data.shape), structure=struct)
    )[0]
    # interior: warped next frame equals current frame
    interior = np.s_[:-1, :, :-2]
    got = out[interior]
    want = data[interior]
    fin = np.isfinite(got)
    assert np.allclose(got[fin], want[fin])


def test_convolve_tap_ordering_matches_reference_layout():
    # distinct constants per frame let us identify which plane each tap reads
    data = np.stack(
        [np.full((3, 3), v, dtype=np.float32) for v in (1.0, 2.0, 3.0)], axis=0
    )
    struct = np.ones((3, 3, 3))
    out = np.asarray(
        convolve(data, zero_flow(data.shape), zero_flow(data.shape), structure=struct)
    )
    assert out.shape == (27, 3, 3, 3)
    centre = (1, 1, 1)  # t=1, middle pixel: all taps in frame
    assert np.allclose(out[:9][(slice(None),) + centre], 1.0)  # backward plane
    assert np.allclose(out[9:18][(slice(None),) + centre], 2.0)  # same plane
    assert np.allclose(out[18:][(slice(None),) + centre], 3.0)  # forward plane


def _np_nanmean0(x):
    return jnp.nanmean(x, axis=0)


def test_convolve_func_nan_propagation():
    data = np.ones((3, 4, 4), dtype=np.float32)
    data[1, 2, 2] = np.nan
    struct = np.zeros((3, 3, 3))
    struct[:, 1, 1] = 1
    out = np.asarray(
        convolve(
            data,
            zero_flow(data.shape),
            zero_flow(data.shape),
            structure=struct,
            func=_np_nanmean0,
        )
    )
    # NaN input locations are forced back to fill (reference convolve.py:347)
    assert np.isnan(out[1, 2, 2])
    assert np.allclose(out[1, 0, 0], 1.0)


def test_flow_diff_linear_ramp_in_time():
    # data[t] = t * 10 everywhere: diff = 10 at every step incl. boundaries
    data = np.stack([np.full((5, 5), 10.0 * i, np.float32) for i in range(4)])
    flow = Flow(zero_flow(data.shape), zero_flow(data.shape))
    d = np.asarray(flow.diff(data))
    assert np.allclose(d, 10.0, atol=1e-5)


def test_flow_diff_matches_reference_formula():
    rng = np.random.default_rng(3)
    data = rng.random((5, 6, 6)).astype(np.float32)
    flow = Flow(zero_flow(data.shape), zero_flow(data.shape))
    d = np.asarray(flow.diff(data))
    # interior reference: mean of one-sided diffs
    expected = 0.5 * (data[2:] - data[:-2])
    assert np.allclose(d[1:-1], expected, atol=1e-5)
    assert np.allclose(d[0], data[1] - data[0], atol=1e-5)
    assert np.allclose(d[-1], data[-1] - data[-2], atol=1e-5)


def test_sobel_flat_field_is_zero():
    data = np.full((3, 8, 8), 5.0, dtype=np.float32)
    flow = Flow(zero_flow(data.shape), zero_flow(data.shape))
    s = np.asarray(flow.sobel(data))
    assert np.allclose(s[np.isfinite(s)], 0.0, atol=1e-5)


def test_sobel_step_edge_detected():
    data = np.zeros((3, 8, 8), dtype=np.float32)
    data[:, :, 4:] = 10.0
    flow = Flow(zero_flow(data.shape), zero_flow(data.shape))
    s = np.asarray(flow.sobel(data))
    mid = s[1, 4, 1:-1]
    assert mid[2] > 0 and mid[3] > 0  # edge columns respond
    assert np.allclose(s[1, 4, 1], 0.0, atol=1e-4)  # far from the edge


def test_sobel_uphill_downhill_split():
    data = np.zeros((3, 9, 9), dtype=np.float32)
    data[:, 4, 4] = 10.0  # single peak
    flow = Flow(zero_flow(data.shape), zero_flow(data.shape))
    up = np.asarray(flow.sobel(data, direction="uphill"))
    down = np.asarray(flow.sobel(data, direction="downhill"))
    # at the peak every neighbour is below the centre, but the symmetric
    # contributions cancel in the signed sums: both variants give 0 there
    assert np.isclose(up[1, 4, 4], 0.0, atol=1e-5)
    # next to the peak, the peak is above the centre: only uphill responds
    assert up[1, 4, 3] > 0
    assert np.isclose(down[1, 4, 3], 0.0, atol=1e-5)


def test_convolve_nearest_labels_warp():
    labels = np.zeros((3, 6, 6), dtype=np.int32)
    labels[1, 2, 2] = 7
    struct = np.zeros((3, 3, 3))
    struct[0, 1, 1] = 1
    struct[2, 1, 1] = 1
    fwd = zero_flow(labels.shape)
    bwd = zero_flow(labels.shape)
    out = np.asarray(
        convolve(
            labels, fwd, bwd, structure=struct, method="nearest", fill_value=0,
            dtype=np.int32,
        )
    )
    back, forward = out[0], out[1]
    assert back.dtype == np.int32
    assert back[2, 2, 2] == 7  # frame 2 sees frame 1's label at the same spot
    assert forward[0, 2, 2] == 7  # frame 0 sees frame 1's label
    assert forward[1, 2, 2] == 0


def test_time_chunked_convolve_matches_whole_volume(monkeypatch):
    """Above the tap-pixel budget, convolve processes halo-overlapped time
    chunks — stitched output must equal the whole-volume form exactly, and
    halo-sized sub-windows must not recurse (regression: chunk_t + 2-frame
    windows previously re-chunked forever)."""
    import sys

    import jax.numpy as jnp

    conv = sys.modules["tobac_flow_tpu.ops.convolve"]
    rng = np.random.default_rng(3)
    t, h, w = 30, 24, 32
    data = rng.normal(290, 5, (t, h, w)).astype(np.float32)
    fwd = rng.uniform(-2, 2, (t, h, w, 2)).astype(np.float32)
    bwd = rng.uniform(-2, 2, (t, h, w, 2)).astype(np.float32)
    structure = np.ones((3, 3, 3))

    def mean0(x):
        return jnp.nanmean(x, axis=0)

    full = np.asarray(
        conv.convolve(data, fwd, bwd, structure=structure, func=mean0)
    )
    # budget small enough that chunk_t = 4 -> 6-frame sub-windows
    monkeypatch.setattr(conv, "BUDGET_TAP_PX", 27 * 4 * h * w)
    chunked = np.asarray(
        conv.convolve(data, fwd, bwd, structure=structure, func=mean0)
    )
    np.testing.assert_array_equal(full, chunked)


def test_set_fast_warp_switches_path():
    """set_fast_warp must flip the module global the warp dispatch reads
    (direct attribute assignment through `tobac_flow_tpu.ops.convolve` hits
    the re-exported *function*, not the module — the reason this API
    exists)."""
    import sys

    conv = sys.modules["tobac_flow_tpu.ops.convolve"]
    assert conv.FAST_WARP is True
    prev = conv.set_fast_warp(False)
    try:
        assert prev is True
        assert conv.FAST_WARP is False
        # banded vs exact genuinely differ on rough flow
        rng = np.random.default_rng(7)
        h, w = 48, 64
        data = rng.normal(0, 1, (3, h, w)).astype(np.float32)
        flow = rng.uniform(-15, 15, (3, h, w, 2)).astype(np.float32)
        import jax.numpy as jnp

        def mean0(x):
            return jnp.nanmean(x, axis=0)

        exact = np.asarray(conv.convolve(data, flow, flow, func=mean0))
        conv.set_fast_warp(True)
        banded = np.asarray(conv.convolve(data, flow, flow, func=mean0))
        both = np.isfinite(exact) & np.isfinite(banded)
        # the production banded path is now the exact 2D factorisation: it
        # must MATCH the per-pixel gather path even on rough flow
        assert np.abs(exact[both] - banded[both]).max() < 1e-3
        # ... while the separable two-pass variant genuinely differs there
        conv.set_banded_exact(False)
        sep = np.asarray(conv.convolve(data, flow, flow, func=mean0))
        both = np.isfinite(exact) & np.isfinite(sep)
        assert np.abs(exact[both] - sep[both]).max() > 0.01
    finally:
        conv.set_fast_warp(True)
        conv.set_banded_exact(True)
