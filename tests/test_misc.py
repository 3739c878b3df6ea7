"""Misc coverage: retry wrapper, dit-large config, logger, fetch tool."""

import numpy as np
import pytest


def test_retry_io_retries_then_succeeds(monkeypatch):
    import layoutdit_tpu.utils.retry as retry_mod

    monkeypatch.setattr(retry_mod.time, "sleep", lambda s: None)
    calls = {"n": 0}

    @retry_mod.retry_io
    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise OSError("transient")
        return "ok"

    assert flaky() == "ok"
    assert calls["n"] == 3


def test_retry_io_gives_up(monkeypatch):
    import layoutdit_tpu.utils.retry as retry_mod

    monkeypatch.setattr(retry_mod.time, "sleep", lambda s: None)

    @retry_mod.retry_io
    def always_fails():
        raise OSError("down")

    with pytest.raises(OSError):
        always_fails()


def test_retry_io_passes_non_io_errors():
    from layoutdit_tpu.utils.retry import retry_io

    calls = {"n": 0}

    @retry_io
    def bad():
        calls["n"] += 1
        raise ValueError("logic bug")

    with pytest.raises(ValueError):
        bad()
    assert calls["n"] == 1  # no retry on non-IO errors


def test_dit_large_config():
    from layoutdit_tpu.config.constructs import BackboneType, ModelConfig
    from layoutdit_tpu.models.detection.detector import DetectorConfig

    mc = ModelConfig(backbone_type=BackboneType.DIT_LARGE)
    cfg = DetectorConfig.from_model_config(mc)
    vit = cfg.backbone.vit
    assert (vit.hidden_size, vit.num_hidden_layers, vit.num_attention_heads,
            vit.intermediate_size) == (1024, 24, 16, 4096)
    # backbone taps [d//3, d//2, 2d//3, d]
    assert cfg.backbone.taps == (8, 12, 16, 24)
    assert cfg.grid_sizes == ((56, 56), (28, 28), (14, 14), (7, 7), (4, 4))


def test_per_module_loggers_are_distinct():
    from layoutdit_tpu.log import get_logger

    a = get_logger("module_a")
    b = get_logger("module_b")
    assert a is not b  # the reference's singleton quirk is fixed
    assert a.name.endswith("module_a") and b.name.endswith("module_b")


def test_fetch_samples_synthetic(tmp_path):
    import subprocess
    import sys

    r = subprocess.run(
        [sys.executable, "-m", "layoutdit_tpu.tools.fetch_samples",
         "--synthetic", "--out", str(tmp_path), "--n", "2"],
        capture_output=True, text=True, timeout=120,
    )
    assert r.returncode == 0, r.stderr
    assert (tmp_path / "samples.json").exists()


def test_join_path_url_and_local():
    from layoutdit_tpu.utils.paths import join_path

    assert join_path("gs://bucket/data", "imgs", "a.jpg") == "gs://bucket/data/imgs/a.jpg"
    assert join_path("gs://bucket/data/", "/imgs/", "a.jpg") == "gs://bucket/data/imgs/a.jpg"
    assert join_path("s3://b", "x.json") == "s3://b/x.json"
    import os

    assert join_path("/tmp/root", "f.jpg") == os.path.join("/tmp/root", "f.jpg")
