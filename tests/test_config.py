"""Config tree tests (reference surface: configuration/__init__.py:23-34,
config_constructs.py:24-83)."""

import json

from layoutdit_tpu.config import (
    BackboneType,
    LayoutDitConfig,
    get_layout_dit_config,
    read_config_from_path,
    set_layout_dit_config,
)


def test_defaults_match_reference():
    cfg = LayoutDitConfig()
    # reference config_constructs.py:30-44
    assert cfg.train_config.num_epochs == 25
    assert cfg.train_config.learning_rate == 1e-4
    assert cfg.train_config.weight_decay == 0
    assert cfg.train_config.step_size == 10
    assert cfg.train_config.gamma == 0.1
    assert cfg.train_config.checkpoint_interval == 10
    assert cfg.train_config.train_base_path == "gs://layoutdit/data"
    assert cfg.train_config.train_input == "single"
    # reference config_constructs.py:24-27
    assert cfg.data_loader_config.batch_size == 16
    assert cfg.data_loader_config.shuffle is True
    # reference config_constructs.py:47-59
    assert cfg.eval_config.eval_input == "samples"
    assert cfg.eval_config.score_thresh == 0.0
    assert cfg.eval_config.max_per_image == 10
    assert cfg.eval_config.num_images == 20
    # reference model_config.py:6-13
    m = cfg.detection_model_config
    assert m.backbone_type == BackboneType.DIT
    assert m.num_classes == 5
    assert m.anchor_sizes == [(32,), (64,), (128,), (256,), (512,)]
    assert m.aspect_ratios == [(0.5, 1.0, 2.0)] * 5
    assert cfg.run_name == "test"


def test_singleton_and_override(tmp_path, monkeypatch):
    set_layout_dit_config(None)
    path = tmp_path / "cfg.json"
    path.write_text(json.dumps({"run_name": "from_file"}))
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(path))
    cfg = get_layout_dit_config()
    assert cfg.run_name == "from_file"
    assert get_layout_dit_config() is cfg  # singleton
    set_layout_dit_config(None)


def test_read_config_missing_path(tmp_path):
    assert read_config_from_path(str(tmp_path / "nope.json")) is None


def test_config_json_roundtrip():
    cfg = LayoutDitConfig(run_name="rt")
    cfg2 = LayoutDitConfig(**json.loads(cfg.model_dump_json()))
    assert cfg2 == cfg


def test_shipped_example_configs_parse():
    """configs/*.json presets must stay loadable as partial configs."""
    import glob
    import os

    root = os.path.join(os.path.dirname(__file__), os.pardir, "configs")
    paths = sorted(glob.glob(os.path.join(root, "*.json")))
    assert paths, "no shipped example configs found"
    for p in paths:
        cfg = LayoutDitConfig(**json.load(open(p)))
        assert cfg.run_name
    serving = LayoutDitConfig(
        **json.load(open(os.path.join(root, "serving_1024.json")))
    )
    assert serving.detection_model_config.image_size == 1024
    assert (
        serving.detection_model_config.detection_budget.rpn_post_nms_top_n_test
        == 512
    )
    tp_sp = LayoutDitConfig(
        **json.load(open(os.path.join(root, "train_tp_sp.json")))
    )
    assert tp_sp.mesh_config.sequence_parallel
    assert tp_sp.detection_model_config.backbone_type.value == "dit-large"


def test_yaml_config(tmp_path):
    """LAYOUTDIT_CONFIG may point at YAML (the reference's own TODO:
    README.md:75) — same pydantic merge, same fields; non-mapping and
    malformed files fall back to None like unreadable JSON."""
    from layoutdit_tpu.config import read_config_from_path

    p = tmp_path / "cfg.yaml"
    p.write_text(
        "train_config:\n"
        "  learning_rate: 0.001\n"
        "data_loader_config:\n"
        "  batch_size: 6\n"
        "detection_model_config:\n"
        "  num_classes: 11\n"
    )
    cfg = read_config_from_path(str(p))
    assert cfg.train_config.learning_rate == 0.001
    assert cfg.data_loader_config.batch_size == 6
    assert cfg.detection_model_config.num_classes == 11

    bad = tmp_path / "list.yml"
    bad.write_text("- just\n- a list\n")
    assert read_config_from_path(str(bad)) is None


def test_explicit_env_config_fails_loud(tmp_path, monkeypatch):
    """An explicit LAYOUTDIT_CONFIG that is missing or malformed must
    RAISE, never silently train on pydantic defaults (the lenient
    fallback is only for the best-effort gs:// probe)."""
    import pytest

    set_layout_dit_config(None)
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(tmp_path / "nope.json"))
    with pytest.raises(FileNotFoundError):
        get_layout_dit_config()

    bad = tmp_path / "bad.json"
    bad.write_text("{not json")
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(bad))
    set_layout_dit_config(None)
    with pytest.raises(Exception):
        get_layout_dit_config()

    lst = tmp_path / "list.yaml"
    lst.write_text("- a\n- b\n")
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(lst))
    set_layout_dit_config(None)
    with pytest.raises(ValueError):
        get_layout_dit_config()
    set_layout_dit_config(None)
