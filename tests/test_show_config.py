"""show_config tool: merged-config dump and --diff vs defaults."""

import json
import os


def test_show_config_diff(tmp_path, capsys, monkeypatch):
    from layoutdit_tpu.config import set_layout_dit_config
    from layoutdit_tpu.tools.show_config import main

    cfg_path = tmp_path / "c.json"
    cfg_path.write_text(json.dumps(
        {"train_config": {"num_epochs": 3},
         "data_loader_config": {"batch_size": 7}}
    ))
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(cfg_path))
    set_layout_dit_config(None)  # force re-resolve from env
    try:
        main(["--diff"])
        diff = json.loads(capsys.readouterr().out)
        assert diff == {"data_loader_config.batch_size": 7,
                        "train_config.num_epochs": 3}
        main([])
        full = json.loads(capsys.readouterr().out)
        assert full["data_loader_config"]["batch_size"] == 7
        assert "detection_model_config" in full
    finally:
        set_layout_dit_config(None)


def test_shipped_presets_validate():
    """Every configs/*.json must merge cleanly over the defaults."""
    from layoutdit_tpu.config.constructs import LayoutDitConfig

    root = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "configs")
    presets = [f for f in os.listdir(root) if f.endswith(".json")]
    assert len(presets) >= 4
    for f in presets:
        data = json.load(open(os.path.join(root, f)))
        data.pop("_comment", None)
        cfg = LayoutDitConfig(**data)
        assert cfg.data_loader_config.batch_size > 0
