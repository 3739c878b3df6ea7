"""layoutdit-doctor preflight diagnostics (ops tooling the reference
lacks entirely — its README walks GCP setup by hand, README.md:16-57)."""

import json

import pytest

from layoutdit_tpu.config import set_layout_dit_config
from layoutdit_tpu.tools.doctor import main as doctor_main


@pytest.fixture(autouse=True)
def _fresh_config_singleton():
    set_layout_dit_config(None)
    yield
    set_layout_dit_config(None)


def test_doctor_green_on_fixture(tmp_path, monkeypatch, capsys):
    cfg = {
        "run_name": "doctor_test",
        "train_config": {"train_base_path": str(tmp_path)},
        "eval_config": {"eval_base_path": str(tmp_path)},
        "data_loader_config": {"batch_size": 8},
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))

    rc = doctor_main(["--json"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}

    assert rc == 0, results
    assert by["config"]["status"] == "OK"
    assert "doctor_test" in by["config"]["detail"]
    # CPU test host: backend reports WARN (not TPU), never FAIL
    assert by["backend"]["status"] == "WARN"
    # batch 8 over the virtual 8-device mesh factors exactly
    assert by["mesh"]["status"] == "OK"
    assert by["native"]["status"] in ("OK", "WARN")
    assert by["compile-cache"]["status"] == "OK"
    assert by["io:train-data"]["status"] == "OK"
    assert by["checkpoints"]["status"] == "OK"
    assert "fresh run" in by["checkpoints"]["detail"]


def test_doctor_warns_on_clamped_mesh(tmp_path, monkeypatch, capsys):
    cfg = {
        "run_name": "doctor_clamp",
        "data_loader_config": {"batch_size": 6},  # 8 devices don't divide 6
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))

    rc = doctor_main(["--json"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}
    assert by["mesh"]["status"] == "WARN"
    assert "6" in by["mesh"]["detail"]
    assert rc == 0  # WARNs don't fail the preflight


def test_doctor_fails_on_bad_config(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(tmp_path / "nope.json"))
    rc = doctor_main(["--json", "--skip-backend"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}
    assert by["config"]["status"] == "FAIL"
    assert rc == 1


def test_doctor_human_output(tmp_path, monkeypatch, capsys):
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps({"run_name": "doctor_h"}))
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))
    rc = doctor_main(["--skip-backend"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "config" in out and "OK" in out
