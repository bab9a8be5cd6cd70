"""PipelineConfig round-trip and DetectionOptions wiring tests."""

from tobac_flow_tpu.config import PipelineConfig


def test_json_roundtrip(tmp_path):
    cfg = PipelineConfig(wvd_threshold=0.4, erode_distance=3, use_wvd=True)
    p = tmp_path / "cfg.json"
    cfg.to_json(p)
    back = PipelineConfig.from_json(p)
    assert back == cfg


def test_from_json_ignores_unknown_keys(tmp_path):
    p = tmp_path / "cfg.json"
    p.write_text('{"wvd_threshold": 0.3, "not_a_field": 1}')
    cfg = PipelineConfig.from_json(p)
    assert cfg.wvd_threshold == 0.3


def test_detection_options_carries_thresholds():
    cfg = PipelineConfig(bt_threshold=0.75, thick_lower=-10.0)
    opts = cfg.detection_options()
    assert opts.bt_threshold == 0.75
    assert opts.thick_lower == -10.0
    assert opts.flow_model == "Farneback"


def test_defaults_match_reference_scripts():
    cfg = PipelineConfig()
    # reference dcc_detect_goes.py:169-291 hard-coded values
    assert (cfg.wvd_threshold, cfg.bt_threshold) == (0.25, 0.5)
    assert (cfg.overlap, cfg.absolute_overlap) == (0.5, 4)
    assert (cfg.thick_upper, cfg.thick_lower) == (-5.0, -12.5)
    assert (cfg.thin_upper, cfg.thin_lower) == (0.0, -7.5)
    assert cfg.erode_distance == 2
