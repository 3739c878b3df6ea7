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


def _local_cfg(tmp_path, **extra):
    """Config JSON whose IO paths are all local — doctor tests must
    never probe the default gs:// paths (live network calls in a unit
    test, gcsfs retry stalls on offline CI)."""
    cfg = {
        "train_config": {"train_base_path": str(tmp_path)},
        "eval_config": {"eval_base_path": str(tmp_path)},
        **extra,
    }
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(cfg))
    return p


def test_doctor_warns_on_clamped_mesh(tmp_path, monkeypatch, capsys):
    p = _local_cfg(
        tmp_path, run_name="doctor_clamp",
        data_loader_config={"batch_size": 6},  # 8 devices don't divide 6
    )
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))

    rc = doctor_main(["--json"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}
    assert by["mesh"]["status"] == "WARN"
    assert "batch_size=6" in by["mesh"]["detail"]
    assert rc == 0  # WARNs don't fail the preflight


def test_doctor_explains_explicit_subtotal_mesh(tmp_path, monkeypatch, capsys):
    """used < total because the CONFIG asked for fewer devices: the WARN
    must blame mesh_config, not invent a batch-divisibility problem."""
    p = _local_cfg(
        tmp_path, run_name="doctor_sub",
        mesh_config={"data_parallel": 4},
        data_loader_config={"batch_size": 16},  # divides everything
    )
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))
    rc = doctor_main(["--json"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}
    assert by["mesh"]["status"] == "WARN"
    assert "mesh_config" in by["mesh"]["detail"]
    assert "batch" not in by["mesh"]["detail"].split("mesh_config")[1]
    assert rc == 0


def test_doctor_skips_mesh_when_backend_fails(tmp_path, monkeypatch, capsys):
    """A wedged backend must not hang the doctor in check_mesh's
    unwatchdogged jax calls — mesh is reported as skipped instead."""
    import layoutdit_tpu.tools.doctor as doctor_mod

    p = _local_cfg(tmp_path, run_name="doctor_wedge")
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))
    monkeypatch.setattr(
        doctor_mod, "check_backend",
        lambda t: {"check": "backend", "status": "FAIL", "detail": "wedged"},
    )
    called = []
    monkeypatch.setattr(
        doctor_mod, "check_mesh", lambda *a: called.append(1)
    )
    rc = doctor_main(["--json"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}
    assert not called
    assert by["mesh"]["status"] == "WARN"
    assert "skipped" in by["mesh"]["detail"]
    assert rc == 1  # the backend FAIL itself still fails the preflight


def test_doctor_fails_on_bad_config(tmp_path, monkeypatch, capsys):
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(tmp_path / "nope.json"))
    rc = doctor_main(["--json", "--skip-backend"])
    results = json.loads(capsys.readouterr().out)
    by = {r["check"]: r for r in results}
    assert by["config"]["status"] == "FAIL"
    assert rc == 1


def test_doctor_human_output(tmp_path, monkeypatch, capsys):
    p = _local_cfg(tmp_path, run_name="doctor_h")
    monkeypatch.setenv("LAYOUTDIT_CONFIG", str(p))
    rc = doctor_main(["--skip-backend"])
    out = capsys.readouterr().out
    assert rc == 0
    assert "config" in out and "OK" in out
