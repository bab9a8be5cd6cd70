"""Legacy flow-engine compatibility layer (reference legacy_flow.py)."""

import numpy as np


def test_flow_func_parabolic_interpolation():
    """FlowFunc(t): t=1 -> forward, t=-1 -> backward, t=0 -> zero, and the
    parabolic blend in between (reference legacy_flow.py:9-35)."""
    from tobac_flow_tpu.legacy import Flow_Func, FlowFunc

    rng = np.random.default_rng(0)
    fx_for, fx_back, fy_for, fy_back = rng.normal(0, 2, (4, 3, 8, 10))
    ff = FlowFunc(fx_for, fx_back, fy_for, fy_back)
    assert Flow_Func is FlowFunc
    assert ff.shape == (3, 8, 10)

    dx, dy = ff(1.0)
    np.testing.assert_allclose(dx, fx_for)
    np.testing.assert_allclose(dy, fy_for)
    dx, dy = ff(-1.0)
    np.testing.assert_allclose(dx, fx_back)
    np.testing.assert_allclose(dy, fy_back)
    dx, dy = ff(0.0)
    assert not dx.any() and not dy.any()
    # half-step: 0.375*for - 0.125*back
    dx, dy = ff(0.5)
    np.testing.assert_allclose(dx, 0.375 * fx_for - 0.125 * fx_back)
    np.testing.assert_allclose(dy, 0.375 * fy_for - 0.125 * fy_back)

    # slicing subsets all four fields consistently
    sub = ff[1:]
    assert sub.shape == (2, 8, 10)
    np.testing.assert_allclose(sub(1.0)[0], fx_for[1:])


def test_flow_func_from_flow():
    from tobac_flow_tpu.core.flow import Flow
    from tobac_flow_tpu.legacy import FlowFunc

    fwd = np.zeros((2, 4, 5, 2), np.float32)
    bwd = np.zeros((2, 4, 5, 2), np.float32)
    fwd[..., 0] = 2.0
    bwd[..., 1] = -1.0
    ff = FlowFunc.from_flow(Flow(fwd, bwd))
    dx, dy = ff(1.0)
    assert (dx == 2.0).all() and (dy == 0.0).all()
    dx, dy = ff(-1.0)
    assert (dx == 0.0).all() and (dy == -1.0).all()
