"""Normalisation helper tests (parity: reference normalisation_utils)."""

import numpy as np
import pytest

from tobac_flow_tpu.utils.normalisation import (
    inverse_log_norm,
    linear_norm,
    linearise_field,
    local_linear_norm,
    log_norm,
    select_normalisation_method,
    to_8bit,
    uniform_norm,
    z_norm,
)


def test_to_8bit_range_and_quantisation():
    a = np.array([[0.0, 5.0, 10.0]])
    out = to_8bit(a)
    assert out.dtype == np.uint8
    np.testing.assert_array_equal(out, [[0, 127, 255]])


def test_to_8bit_nan_holes_filled_from_other_frame():
    a = np.array(
        [[[0.0, np.nan], [4.0, 8.0]], [[0.0, 8.0], [np.nan, 8.0]]]
    )
    out = to_8bit(a)
    # frame 0's hole takes frame 1's value, and vice versa
    assert out[0, 0, 1] == out[1, 0, 1]
    assert out[1, 1, 0] == out[0, 1, 0]


def test_to_8bit_constant_input():
    out = to_8bit(np.full((2, 3), 7.0))
    np.testing.assert_array_equal(out, 0)


def test_linearise_field_forward_and_inverted():
    f = np.array([-10.0, -5.0, 0.0, 5.0])
    fwd = linearise_field(f, -5.0, 5.0)
    np.testing.assert_allclose(fwd, [0.0, 0.0, 0.5, 1.0])
    inv = linearise_field(f, 5.0, -5.0)
    np.testing.assert_allclose(inv, [1.0, 1.0, 0.5, 0.0])
    with pytest.raises(ValueError):
        linearise_field(f, 1.0, 1.0)


def test_linear_norm_bounds():
    out = linear_norm(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(out, [0.0, 0.5, 1.0])


def test_monotone_norms_preserve_order():
    a = np.array([1.0, 3.0, 9.0, 27.0])
    for fn in (log_norm, z_norm, uniform_norm):
        out = fn(a)
        assert np.all(np.diff(out) >= 0), fn.__name__
        assert np.nanmin(out) >= 0 and np.nanmax(out) <= 1.0 + 1e-9, fn.__name__
    # inverse_log maps high values to low (reference
    # normalisation_utils.py:83-88: log(vmax - array + 1))
    out = inverse_log_norm(a)
    assert np.all(np.diff(out) <= 0)
    assert np.nanmin(out) >= 0 and np.nanmax(out) <= 1.0 + 1e-9


def test_local_linear_norm_flat_regions():
    data = np.full((8, 8), 2.5)
    out = local_linear_norm(data, size=3)
    np.testing.assert_array_equal(out, 0.0)


def test_select_normalisation_method():
    assert select_normalisation_method("linear") is linear_norm
    with pytest.raises((KeyError, ValueError)):
        select_normalisation_method("nope")
