"""``layoutdit-doctor`` — preflight diagnostics for a training/serving host.

The reference has no operational tooling at all (its README walks users
through GCP setup by hand, README.md:16-57); on a TPU pod the common
failure modes are environmental and surface minutes into a run: a mesh
that doesn't factor the device count, a wedged device tunnel, missing
GCS credentials, an unwritable compile cache, a native pipeline that
silently fell back to PIL. This tool checks each one in seconds, before
the run burns a compile.

Every check is independent and crash-proof; output is one line per
check (OK / WARN / FAIL) plus an optional ``--json`` dump. Exit code 1
iff any check FAILs. Backend init runs under the same watchdog pattern
as bench.py (a dead tunnel hangs ``jax.devices()`` forever rather than
raising).
"""

from __future__ import annotations

import argparse
import json
import os
import sys

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")


def _result(name: str, status: str, detail: str) -> dict:
    return {"check": name, "status": status, "detail": detail}


def check_config() -> dict:
    env_path = os.getenv("LAYOUTDIT_CONFIG")
    try:
        from layoutdit_tpu.config import get_layout_dit_config

        cfg = get_layout_dit_config()
    except Exception as e:
        return _result("config", "FAIL", f"{type(e).__name__}: {e}")
    src = env_path or "pydantic defaults (no LAYOUTDIT_CONFIG)"
    return _result(
        "config", "OK",
        f"run_name={cfg.run_name} source={src} "
        f"bs={cfg.data_loader_config.batch_size} "
        f"epochs={cfg.train_config.num_epochs} "
        f"image_size={cfg.detection_model_config.image_size}",
    )


def check_backend(timeout_s: float) -> dict:
    import threading

    done = threading.Event()
    # the axon-style failure mode is a device enumeration that hangs
    # with no error; a daemon watchdog lets the doctor report it
    out: dict = {}

    def probe():
        try:
            import jax
            import jax.numpy as jnp

            devs = jax.devices()
            x = jnp.ones((64, 64))
            float((x @ x).sum())  # one real dispatch, not just enumeration
            out["platform"] = devs[0].platform
            out["n"] = len(devs)
            out["kind"] = getattr(devs[0], "device_kind", "?")
        except Exception as e:  # pragma: no cover - backend specific
            out["error"] = f"{type(e).__name__}: {e}"
        finally:
            done.set()

    t = threading.Thread(target=probe, daemon=True)
    t.start()
    if not done.wait(timeout_s):
        return _result(
            "backend", "FAIL",
            f"device init + 1 dispatch did not finish in {timeout_s:.0f}s "
            "(tunnel/runtime wedged?)",
        )
    if "error" in out:
        return _result("backend", "FAIL", out["error"])
    status = "OK" if out["platform"] == "tpu" else "WARN"
    return _result(
        "backend", status,
        f"{out['n']} x {out['kind']} ({out['platform']})"
        + ("" if status == "OK" else " — not TPU"),
    )


def check_mesh() -> dict:
    try:
        from layoutdit_tpu.config import get_layout_dit_config
        from layoutdit_tpu.parallel.mesh import build_mesh_for_batch

        cfg = get_layout_dit_config()
        bs = cfg.data_loader_config.batch_size
        mesh = build_mesh_for_batch(cfg.mesh_config, bs)
    except Exception as e:
        return _result("mesh", "FAIL", f"{type(e).__name__}: {e}")
    import jax

    used = mesh.devices.size
    total = len(jax.devices())
    shape = dict(mesh.shape)
    if used < total:
        return _result(
            "mesh", "WARN",
            f"{shape} uses {used}/{total} devices (batch_size={bs} clamps "
            "the data axis — pick a batch divisible by the device count)",
        )
    return _result("mesh", "OK", f"{shape} over {used} devices, batch={bs}")


def check_native() -> dict:
    try:
        from layoutdit_tpu import native
        from layoutdit_tpu.native import cocojson

        loader = native.available()
        coco = cocojson.available()
    except Exception as e:
        return _result("native", "FAIL", f"{type(e).__name__}: {e}")
    if loader and coco:
        return _result("native", "OK", "C++ jpeg/resize loader + COCO parser")
    missing = [n for n, up in
               (("loader", loader), ("coco-parser", coco)) if not up]
    return _result(
        "native", "WARN",
        f"{'+'.join(missing)} unavailable — PIL/json fallbacks work but are "
        "slower (needs g++; see layoutdit_tpu/native/)",
    )


def check_compile_cache() -> dict:
    cache = os.environ.get("LAYOUTDIT_JAX_CACHE")
    if cache == "0":
        return _result("compile-cache", "WARN", "disabled (LAYOUTDIT_JAX_CACHE=0)")
    if not cache:
        import layoutdit_tpu

        cache = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(layoutdit_tpu.__file__))),
            ".jax_cache",
        )
    try:
        os.makedirs(cache, exist_ok=True)
        probe = os.path.join(cache, ".doctor_probe")
        with open(probe, "w") as f:
            f.write("x")
        os.remove(probe)
        n = sum(1 for e in os.listdir(cache) if not e.startswith("."))
    except OSError as e:
        return _result("compile-cache", "FAIL", f"{cache}: {e}")
    return _result("compile-cache", "OK", f"{cache} writable, {n} entries")


def _probe_path(kind: str, path: str | None) -> dict:
    if not path:
        return _result(f"io:{kind}", "WARN", "not configured")
    try:
        import fsspec

        fs, _, paths = fsspec.get_fs_token_paths(path)
        exists = fs.exists(paths[0])
    except Exception as e:
        return _result(
            f"io:{kind}", "WARN",
            f"{path}: {type(e).__name__}: {e} (credentials/egress?)",
        )
    if not exists:
        return _result(f"io:{kind}", "WARN", f"{path} does not exist (yet)")
    return _result(f"io:{kind}", "OK", path)


def check_io() -> list[dict]:
    try:
        from layoutdit_tpu.config import get_layout_dit_config

        cfg = get_layout_dit_config()
    except Exception:
        return []  # config check already FAILed
    return [
        _probe_path("train-data", cfg.train_config.train_base_path),
        _probe_path("eval-base", cfg.eval_config.eval_base_path),
    ]


def check_checkpoints() -> dict:
    try:
        from layoutdit_tpu.config import get_layout_dit_config
        from layoutdit_tpu.train.checkpoint import list_resume_candidates

        cfg = get_layout_dit_config()
        base = cfg.eval_config.eval_base_path
        if not base:
            return _result("checkpoints", "WARN", "eval_base_path not set")
        root = f"{base.rstrip('/')}/{cfg.run_name}/model_checkpoints"
        cands = list_resume_candidates(root)
    except Exception as e:
        return _result("checkpoints", "WARN", f"{type(e).__name__}: {e}")
    if not cands:
        return _result("checkpoints", "OK", "none yet (fresh run)")
    newest = max(cands)
    return _result(
        "checkpoints", "OK",
        f"{len(cands)} resumable, newest epoch {newest[0]} at {newest[2]}",
    )


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(
        prog="layoutdit-doctor", description=__doc__.splitlines()[0]
    )
    parser.add_argument(
        "--backend-timeout", type=float, default=120.0,
        help="seconds before declaring device init wedged",
    )
    parser.add_argument(
        "--skip-backend", action="store_true",
        help="don't touch the accelerator (config/io/native checks only)",
    )
    parser.add_argument("--json", action="store_true", help="machine output")
    args = parser.parse_args(argv)

    results = [check_config()]
    if not args.skip_backend:
        results.append(check_backend(args.backend_timeout))
        results.append(check_mesh())  # needs an initialised backend
    results.append(check_native())
    results.append(check_compile_cache())
    results.extend(check_io())
    results.append(check_checkpoints())

    if args.json:
        print(json.dumps(results))
    else:
        for r in results:
            print(f"{r['status']:<4} {r['check']:<14} {r['detail']}")
    failed = [r for r in results if r["status"] == "FAIL"]
    if failed and not args.json:
        print(f"\n{len(failed)} check(s) FAILED")
    return 1 if failed else 0


if __name__ == "__main__":
    sys.exit(main())
