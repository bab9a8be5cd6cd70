"""Reference-style flat module imports resolve to this package's modules."""

import pytest


def test_reference_style_imports():
    from tobac_flow_tpu import abi, detection, flow, io, label, validation

    assert callable(detection.detect_cores)
    assert callable(flow.create_flow)
    assert callable(label.flow_label)
    assert callable(validation.validate_markers)
    assert callable(io.get_goes_date)
    assert callable(abi.get_abi_bt)


def test_unknown_attribute_raises():
    import tobac_flow_tpu as tft

    with pytest.raises(AttributeError):
        tft.not_a_module


def test_dir_lists_aliases():
    import tobac_flow_tpu as tft

    listing = dir(tft)
    for name in ("watershed", "dataloader", "postprocess", "linking"):
        assert name in listing
