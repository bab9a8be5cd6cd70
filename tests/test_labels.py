"""Label utilities + device CCL + flow_label tests.

Mirrors /root/reference/tests/test_label_utils.py invariants and adds
scipy.ndimage oracles: per-frame CCL must match scipy exactly (partition and
numbering), and zero-flow flow_label must equal scipy's 3D labelling."""

import numpy as np
import pytest
import scipy.ndimage as ndi

from tobac_flow_tpu.core.flow import Flow
from tobac_flow_tpu.ops.ccl import flat_label
from tobac_flow_tpu.segment.label import flow_label, flow_link_overlap
from tobac_flow_tpu.utils.labels import (
    apply_func_to_labels,
    labeled_comprehension,
    make_step_labels,
    relabel_objects,
    remap_labels,
    slice_labels,
)


def zero_flow_obj(shape):
    z = np.zeros(shape + (2,), dtype=np.float32)
    return Flow(z, z)


def ref_flat_struct():
    s = ndi.generate_binary_structure(3, 1)
    s[0] = 0
    s[-1] = 0
    return s


# --- device CCL vs scipy oracle --------------------------------------------


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_flat_label_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    mask = rng.random((4, 20, 25)) > 0.6
    ours = flat_label(mask)
    oracle = ndi.label(mask, structure=ref_flat_struct())[0]
    assert np.array_equal(ours, oracle)


def test_flat_label_device_input_dispatch_policy(monkeypatch):
    """Device-resident input stays on device by default — doubling-scan CCL
    + rank renumber, identical labels, device-resident result; clearing
    CCL_DEVICE routes through the host — still the same partition."""
    import jax.numpy as jnp

    from tobac_flow_tpu.ops import ccl as ccl_mod

    rng = np.random.default_rng(5)
    mask = rng.random((3, 18, 22)) > 0.6
    host = flat_label(mask)
    via_policy = flat_label(jnp.asarray(mask))
    assert not isinstance(via_policy, np.ndarray)  # stays device-resident
    assert np.array_equal(np.asarray(via_policy), host)
    monkeypatch.setattr(ccl_mod, "CCL_DEVICE", False)
    via_host = np.asarray(flat_label(jnp.asarray(mask)))
    assert np.array_equal(via_host, host)


def test_relabel_sequential_device_matches_host():
    """Device rank-based renumbering reproduces the host (scipy-order)
    renumber exactly, with no component-count cap (the dense speckle below
    produces several hundred components — well past the 4096-cap regime the
    old saturation-loop implementation fell over on)."""
    import jax.numpy as jnp

    from tobac_flow_tpu.ops import ccl as ccl_mod

    rng = np.random.default_rng(11)
    mask = rng.random((4, 48, 64)) > 0.55
    raw = ccl_mod.label_components_device(jnp.asarray(mask))
    host = ccl_mod.relabel_sequential(np.asarray(raw))
    dev = ccl_mod.relabel_sequential_device(raw)
    assert dev is not None
    assert np.array_equal(np.asarray(dev), host)


def test_flat_label_full_connectivity():
    rng = np.random.default_rng(3)
    mask = rng.random((3, 15, 15)) > 0.7
    struct8 = np.ones((3, 3, 3), dtype=bool)
    ours = flat_label(mask, structure=struct8)
    oracle_struct = np.ones((3, 3, 3), dtype=bool)
    oracle_struct[0] = 0
    oracle_struct[-1] = 0
    oracle = ndi.label(mask, structure=oracle_struct)[0]
    assert np.array_equal(ours, oracle)


def test_flat_label_empty():
    mask = np.zeros((2, 5, 5), dtype=bool)
    assert np.all(flat_label(mask) == 0)


# --- flow_label --------------------------------------------------------------


def test_flow_label_zero_flow_equals_3d_label():
    rng = np.random.default_rng(4)
    mask = rng.random((5, 18, 22)) > 0.65
    flow = zero_flow_obj(mask.shape)
    ours = flow_label(flow, mask)
    oracle = ndi.label(mask, structure=ndi.generate_binary_structure(3, 1))[0]
    assert np.array_equal(ours, oracle)


def test_flow_label_tracks_moving_object():
    # object moving +2 px/frame in x; with matching flow it is ONE label
    t, h, w = 5, 12, 30
    mask = np.zeros((t, h, w), dtype=bool)
    for i in range(t):
        mask[i, 4:8, 2 + 2 * i : 6 + 2 * i]
        mask[i, 4:8, 2 + 2 * i : 6 + 2 * i] = True
    fwd = np.zeros((t, h, w, 2), np.float32)
    fwd[..., 0] = 2.0
    bwd = np.zeros((t, h, w, 2), np.float32)
    bwd[..., 0] = -2.0
    flow = Flow(fwd, bwd)
    labels = flow_label(flow, mask)
    assert labels.max() == 1
    assert np.array_equal(labels != 0, mask)
    # without flow, consecutive boxes still overlap by 2px -> still one label;
    # but with an overlap fraction requirement above 0.5 the chain must break
    labels_strict = flow_label(zero_flow_obj(mask.shape), mask, overlap=0.9)
    assert labels_strict.max() == t


def test_flow_label_absolute_overlap_threshold():
    # two frames overlapping in exactly 2 pixels
    mask = np.zeros((2, 6, 6), dtype=bool)
    mask[0, 2, 1:3] = True
    mask[1, 2, 1:3] = True
    flow = zero_flow_obj(mask.shape)
    assert flow_label(flow, mask).max() == 1  # default: any overlap links
    assert flow_label(flow, mask, absolute_overlap=1).max() == 1  # 2 > 1
    assert flow_label(flow, mask, absolute_overlap=2).max() == 2  # 2 > 2 fails


def test_flow_link_overlap_relinks_steps():
    mask = np.zeros((3, 8, 8), dtype=bool)
    mask[:, 2:5, 2:5] = True
    flow = zero_flow_obj(mask.shape)
    step_labels = flat_label(mask)
    assert step_labels.max() == 3
    linked = flow_link_overlap(flow, step_labels)
    assert linked.max() == 1


# --- host label utilities ----------------------------------------------------


def _ref_labels_2d():
    test_labels = np.zeros([4, 6], dtype=int)
    test_labels[1:3, 1:3] = 1
    test_labels[2:3, 3:6] = 3
    return test_labels


def test_apply_func_to_labels_matrix():
    labels = _ref_labels_2d()
    data1 = np.arange(24).reshape([4, 6]).astype(float)
    data2 = np.array([1, 2, 3, 3, 2, 1], dtype=float)

    out = apply_func_to_labels(labels, data1, func=np.mean)
    # index defaults to 1..max: labels 1, 2 (absent), 3
    assert out.shape == (3,)
    assert np.isclose(out[0], np.mean(data1[labels == 1]))
    assert out[1] is None or (isinstance(out[1], float) and np.isnan(out[1])) or out[1] == None  # noqa: E711
    assert np.isclose(out[2], np.mean(data1[labels == 3]))

    out = apply_func_to_labels(labels, data1, func=np.mean, index=[1, 3])
    assert np.allclose(
        out, [np.mean(data1[labels == 1]), np.mean(data1[labels == 3])]
    )

    wmean = lambda a, w: np.average(a, weights=w)
    out = apply_func_to_labels(labels, data1, data2, func=wmean, index=[1, 3])
    w_b = np.broadcast_to(data2, labels.shape)
    assert np.isclose(out[0], np.average(data1[labels == 1], weights=w_b[labels == 1]))

    mean_std = lambda a: (np.mean(a), np.std(a))
    out = apply_func_to_labels(labels, data1, func=mean_std, index=[1, 3])
    assert out.shape == (2, 2)

    out = apply_func_to_labels(
        labels, data1, data2, func=lambda a, w: (np.average(a, weights=w), np.std(a)),
        default=np.nan, index=[1, 2, 3],
    )
    assert out.shape == (2, 3)
    assert np.all(np.isnan(out[:, 1]))


def test_labeled_comprehension_defaults():
    labels = _ref_labels_2d()
    data = np.arange(24).reshape([4, 6]).astype(float)
    out = labeled_comprehension(data, labels, np.mean, index=[1, 2, 3], default=-1.0)
    assert np.isclose(out[0], np.mean(data[labels == 1]))
    assert out[1] == -1.0
    assert np.isclose(out[2], np.mean(data[labels == 3]))


def test_labeled_comprehension_pass_positions():
    labels = _ref_labels_2d()
    data = np.arange(24).reshape([4, 6]).astype(float)
    got = labeled_comprehension(
        data, labels, lambda v, pos: pos.min(), index=[1, 3], default=0,
        pass_positions=True,
    )
    assert got[0] == np.flatnonzero(labels.ravel() == 1).min()
    assert got[1] == np.flatnonzero(labels.ravel() == 3).min()


def test_slice_labels_invariants():
    labels = np.zeros([5, 10, 15], dtype=np.int32)
    labels[:, 3:6, 4:8] = 1
    sliced = slice_labels(labels)
    assert np.all(np.unique(sliced) == np.arange(6))

    labels[:, 5:8, 10:13] = 1
    sliced = slice_labels(labels)
    assert np.all(np.unique(sliced) == np.arange(6))
    for i in range(5):
        assert np.all(np.unique(sliced[i]) == np.array([0, i + 1]))

    labels[:, 5:8, 10:13] = 2
    sliced = slice_labels(labels)
    assert np.all(np.unique(sliced) == np.arange(11))
    for i in range(5):
        assert np.all(np.unique(sliced[i]) == np.array([0, 2 * i + 1, 2 * i + 2]))

    labels[1:3, 7:9, 2:5] = 3
    result = slice_labels(labels)
    sets = [np.unique(result[labels == v]) for v in (1, 2, 3)]
    assert not len(np.intersect1d(sets[0], sets[1]))
    assert not len(np.intersect1d(sets[0], sets[2]))
    assert not len(np.intersect1d(sets[1], sets[2]))
    for i in np.unique(result):
        if i > 0:
            steps = np.where(result == i)[0]
            assert np.all(steps == steps[0])


def test_make_step_labels_exact():
    test_labels = np.array(
        [
            [[0, 0, 0, 1], [0, 2, 1, 0], [0, 2, 0, 3]],
            [[0, 0, 0, 0], [0, 2, 2, 0], [0, 2, 0, 4]],
        ]
    )
    expected = np.array(
        [
            [[0, 0, 0, 1], [0, 3, 2, 0], [0, 3, 0, 4]],
            [[0, 0, 0, 0], [0, 5, 5, 0], [0, 5, 0, 6]],
        ]
    )
    assert np.array_equal(make_step_labels(test_labels), expected)


def test_relabel_objects():
    labels = np.array([[0, 5, 5], [9, 0, 2]])
    out = relabel_objects(labels)
    assert np.array_equal(out, [[0, 2, 2], [3, 0, 1]])


def test_remap_labels_bool_locations():
    labels = np.array([[1, 2, 0], [3, 2, 1]])
    out = remap_labels(labels, np.array([True, False, True]))
    assert np.array_equal(out, [[1, 0, 0], [2, 0, 1]])


def test_flat_label_spiral_worst_case():
    """A spiral component exercises the segmented-scan propagation's worst
    case (many bends); partition and numbering must still match scipy."""
    from scipy import ndimage as ndi

    from tobac_flow_tpu.ops.ccl import flat_label

    h = w = 33
    mask = np.zeros((1, h, w), bool)
    # square spiral inwards
    top, bot, left, right = 0, h - 1, 0, w - 1
    while left <= right and top <= bot:
        mask[0, top, left : right + 1] = True
        mask[0, top : bot + 1, right] = True
        mask[0, bot, left : right + 1] = True
        mask[0, top : bot + 1, left] = True
        top += 2
        bot -= 2
        left += 2
        right -= 2
    out = np.asarray(flat_label(mask))
    s = np.zeros((3, 3, 3), bool)
    s[1] = ndi.generate_binary_structure(2, 1)
    ref, _ = ndi.label(mask, structure=s)
    np.testing.assert_array_equal(out, ref)
