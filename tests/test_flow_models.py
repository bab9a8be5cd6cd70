"""Optical-flow estimation tests (reference tests/test_flow.py:198-360
translated to the TPU-native model zoo): synthetic-blob shift recovery,
model registry behaviour, Flow object construction, smoothing fixed points."""

import numpy as np
import pytest

from tobac_flow_tpu import models
from tobac_flow_tpu.core import flow as flow_mod
from tobac_flow_tpu.utils import to_8bit


def make_blob(w=32, h=24):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    cx, cy = (w - 1) / 2, (h - 1) / 2
    blob = (cx**2 - (xx - cx) ** 2) * (cy**2 - (yy - cy) ** 2)
    return to_8bit(blob).astype(np.float32)


def blob_mask(blob, frac=0.2):
    return blob > blob.max() * frac


# --- registry ---------------------------------------------------------------


def test_select_of_model_farneback():
    assert callable(models.select_of_model("Farneback"))


def test_select_of_model_dis():
    assert callable(models.select_of_model("DIS"))


def test_select_of_model_dense_rlof_not_implemented():
    with pytest.raises(NotImplementedError):
        models.select_of_model("DenseRLOF")


def test_select_of_model_invalid():
    with pytest.raises(ValueError):
        models.select_of_model("not_an_of_model")


# --- blob shift recovery ----------------------------------------------------


@pytest.mark.parametrize("shift", [(1, 0), (0, 1), (-1, -1)])
def test_calculate_flow_recovers_shift(shift):
    sx, sy = shift
    blob = make_blob()
    stack = np.stack(
        [np.roll(blob, (-sy, -sx), (0, 1)), blob, np.roll(blob, (sy, sx), (0, 1))]
    )
    fwd, bwd = models.batch_flow(stack, model="Farneback")
    m = blob_mask(blob)
    # flow in the blob interior must recover the shift to ~0.25 px
    assert np.allclose(np.median(fwd[0][m][:, 0]), sx, atol=0.25)
    assert np.allclose(np.median(fwd[0][m][:, 1]), sy, atol=0.25)
    assert np.allclose(np.median(bwd[1][m][:, 0]), -sx, atol=0.25)
    assert np.allclose(np.median(bwd[1][m][:, 1]), -sy, atol=0.25)


def test_calculate_flow_zero():
    blob = make_blob()
    stack = np.stack([blob] * 3)
    fwd, bwd = models.batch_flow(stack)
    assert np.allclose(fwd, 0, atol=0.05)
    assert np.allclose(bwd, 0, atol=0.05)


def test_calculate_flow_boundary_negation():
    blob = make_blob()
    stack = np.stack([np.roll(blob, (-1, -1), (0, 1)), blob, np.roll(blob, (1, 1), (0, 1))])
    fwd, bwd = models.batch_flow(stack)
    assert np.allclose(fwd[-1], -bwd[-1])
    assert np.allclose(bwd[0], -fwd[0])


def test_calculate_flow_vr_steps():
    blob = make_blob()
    stack = np.stack([np.roll(blob, (-1, -1), (0, 1)), blob, np.roll(blob, (1, 1), (0, 1))])
    fwd, _ = models.batch_flow(stack, vr_steps=1)
    m = blob_mask(blob)
    assert np.allclose(np.median(fwd[0][m][:, 0]), 1, atol=0.3)


def test_calculate_flow_smoothing_passes():
    blob = make_blob()
    stack = np.stack([np.roll(blob, (-1, -1), (0, 1)), blob, np.roll(blob, (1, 1), (0, 1))])
    fwd, _ = models.batch_flow(stack, smoothing_passes=1)
    m = blob_mask(blob)
    assert np.allclose(np.median(fwd[0][m][:, 0]), 1, atol=0.3)


@pytest.mark.parametrize("shift", [(1, 0), (0, 1), (-2, -1)])
def test_dis_recovers_shift(shift):
    sx, sy = shift
    blob = make_blob(64, 48)
    stack = np.stack(
        [np.roll(blob, (-sy, -sx), (0, 1)), blob, np.roll(blob, (sy, sx), (0, 1))]
    )
    fwd, bwd = models.batch_flow(stack, model="DIS")
    m = blob_mask(blob)
    assert np.allclose(np.median(fwd[0][m][:, 0]), sx, atol=0.3)
    assert np.allclose(np.median(fwd[0][m][:, 1]), sy, atol=0.3)


# --- create_flow / Flow object ---------------------------------------------


def test_create_flow_clips_and_wraps():
    blob = make_blob()
    stack = np.stack([blob] * 3)
    f = flow_mod.create_flow(stack, max_value=0.01)
    assert isinstance(f, flow_mod.Flow)
    assert np.all(np.abs(f.forward_flow) <= 0.01)
    assert f.shape == stack.shape


def test_flow_init():
    zeros = np.zeros([3, 5, 2])
    f = flow_mod.Flow(zeros, zeros)
    assert f.shape == (3, 5)


def test_flow_init_shape_mismatch():
    with pytest.raises(ValueError):
        flow_mod.Flow(np.zeros([3, 5, 2]), np.zeros([2, 4, 2]))


def test_flow_init_trailing_dim():
    zeros = np.zeros([3, 5, 1])
    with pytest.raises(ValueError):
        flow_mod.Flow(zeros, zeros)


def test_flow_property_and_getitem():
    zeros = np.zeros([3, 5, 2])
    f = flow_mod.Flow(zeros, zeros)
    ff, bf = f.flow
    assert np.all(ff == f.forward_flow)
    assert f[:2, :4].shape == (2, 4)


# --- smoothing --------------------------------------------------------------


def test_smooth_flow_step_zero():
    zero = np.zeros([3, 5, 2], dtype=np.float32)
    out = flow_mod.smooth_flow_step(zero, zero)
    assert np.all(np.asarray(out[0]) == 0)
    assert np.all(np.asarray(out[1]) == 0)


def test_smooth_flow_step_consistent_one():
    one = np.ones([6, 8, 2], dtype=np.float32)
    f, b = flow_mod.smooth_flow_step(one, -one)
    assert np.allclose(np.asarray(f), 1)
    assert np.allclose(np.asarray(b), -1)


def test_smooth_flow_one_zero():
    zero = np.zeros([6, 8, 2], dtype=np.float32)
    one = np.ones([6, 8, 2], dtype=np.float32)
    f, b = flow_mod.smooth_flow_step(one, zero)
    assert np.allclose(np.asarray(f)[:5, :7], 0.5)
    assert np.allclose(np.asarray(b)[:5, :7], -0.5)


@pytest.mark.parametrize("shift", [(1, 0), (-2, -1)])
def test_tvl1_recovers_shift(shift):
    sx, sy = shift
    blob = make_blob(64, 48)
    stack = np.stack(
        [np.roll(blob, (-sy, -sx), (0, 1)), blob, np.roll(blob, (sy, sx), (0, 1))]
    )
    fwd, _ = models.batch_flow(stack, model="DualTVL1")
    m = blob_mask(blob)
    assert np.allclose(np.median(fwd[0][m][:, 0]), sx, atol=0.3)
    assert np.allclose(np.median(fwd[0][m][:, 1]), sy, atol=0.3)


@pytest.mark.parametrize("model", ["SimpleFlow", "SparseToDense", "PCA", "DeepFlow"])
@pytest.mark.parametrize("shift", [(1, 0), (-1, -1)])
def test_new_models_recover_shift(model, shift):
    """Every model in the zoo recovers a synthetic blob shift (reference
    utils/flow_utils.py:37-77 implements all of these through cv2)."""
    sx, sy = shift
    blob = make_blob(48, 40)
    stack = np.stack(
        [np.roll(blob, (-sy, -sx), (0, 1)), blob, np.roll(blob, (sy, sx), (0, 1))]
    )
    fwd, bwd = models.batch_flow(stack, model=model)
    m = blob_mask(blob)
    tol = 0.5
    assert np.allclose(np.median(fwd[0][m][:, 0]), sx, atol=tol), model
    assert np.allclose(np.median(fwd[0][m][:, 1]), sy, atol=tol), model
    assert np.allclose(np.median(bwd[1][m][:, 0]), -sx, atol=tol), model
    assert np.allclose(np.median(bwd[1][m][:, 1]), -sy, atol=tol), model


def test_all_reference_models_selectable():
    """Registry parity: every reference model except DenseRLOF resolves to a
    callable (reference utils/flow_utils.py:37-77)."""
    for name in (
        "Farneback", "DeepFlow", "PCA", "SimpleFlow", "SparseToDense",
        "DIS", "DualTVL1",
    ):
        assert callable(models.select_of_model(name)), name


def test_batch_flow_host_streamed_matches_device_resident():
    """The host-streamed branch (chunk readbacks into preallocated outputs,
    used above FLOW_RESIDENCY_BUDGET_BYTES) must reproduce the device
    accumulation exactly, including the negated-opposite boundary frames."""
    import tobac_flow_tpu.models as M

    rng = np.random.default_rng(3)
    data = np.cumsum(rng.normal(0, 1, (7, 48, 64)).astype(np.float32), 0) + 50
    f1, b1 = M.batch_flow(data, model="Farneback", vr_steps=1,
                          smoothing_passes=1, interp_method="cubic")
    f1, b1 = np.asarray(f1), np.asarray(b1)
    old = M.FLOW_RESIDENCY_BUDGET_BYTES
    M.FLOW_RESIDENCY_BUDGET_BYTES = 0
    try:
        f2, b2 = M.batch_flow(data, model="Farneback", vr_steps=1,
                              smoothing_passes=1, interp_method="cubic")
    finally:
        M.FLOW_RESIDENCY_BUDGET_BYTES = old
    assert isinstance(f2, np.ndarray)
    assert np.allclose(f1, np.asarray(f2), atol=1e-6)
    assert np.allclose(b1, np.asarray(b2), atol=1e-6)
