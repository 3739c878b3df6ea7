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


def _result(name: str, status: str, detail: str) -> dict:
    return {"check": name, "status": status, "detail": detail}


def _with_timeout(fn, timeout_s: float):
    """(finished, value_or_exception) for ``fn()`` run on a daemon thread.

    Every doctor check that can block on a dead external dependency — a
    wedged device tunnel, a blackholed GCS endpoint, gcsfs retry
    backoff — runs through here so the doctor itself always terminates."""
    import threading

    done = threading.Event()
    box: dict = {}

    def run():
        try:
            box["value"] = fn()
        except BaseException as e:  # report, never propagate from the thread
            box["error"] = e
        finally:
            done.set()

    threading.Thread(target=run, daemon=True).start()
    if not done.wait(timeout_s):
        return False, None
    if "error" in box:
        raise box["error"]
    return True, box.get("value")


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
    # the axon-style failure mode is a device enumeration that hangs
    # with no error; the watchdog lets the doctor report it
    def probe():
        import jax
        import jax.numpy as jnp

        devs = jax.devices()
        x = jnp.ones((64, 64))
        float((x @ x).sum())  # one real dispatch, not just enumeration
        return {
            "platform": devs[0].platform,
            "n": len(devs),
            "kind": getattr(devs[0], "device_kind", "?"),
        }

    try:
        finished, out = _with_timeout(probe, timeout_s)
    except Exception as e:  # pragma: no cover - backend specific
        return _result("backend", "FAIL", f"{type(e).__name__}: {e}")
    if not finished:
        return _result(
            "backend", "FAIL",
            f"device init + 1 dispatch did not finish in {timeout_s:.0f}s "
            "(tunnel/runtime wedged?)",
        )
    status = "OK" if out["platform"] == "tpu" else "WARN"
    return _result(
        "backend", status,
        f"{out['n']} x {out['kind']} ({out['platform']})"
        + ("" if status == "OK" else " — not TPU"),
    )


def check_mesh(timeout_s: float = 60.0) -> dict:
    # only called after check_backend succeeded, but jax.devices() is
    # still watchdogged: a tunnel can wedge between the two checks
    def probe():
        import jax

        from layoutdit_tpu.config import get_layout_dit_config
        from layoutdit_tpu.parallel.mesh import build_mesh_for_batch

        cfg = get_layout_dit_config()
        bs = cfg.data_loader_config.batch_size
        mesh = build_mesh_for_batch(cfg.mesh_config, bs)
        return cfg, bs, mesh, len(jax.devices())

    try:
        finished, out = _with_timeout(probe, timeout_s)
    except Exception as e:
        return _result("mesh", "FAIL", f"{type(e).__name__}: {e}")
    if not finished:
        return _result(
            "mesh", "FAIL", f"mesh build did not finish in {timeout_s:.0f}s"
        )
    cfg, bs, mesh, total = out
    used = mesh.devices.size
    shape = dict(mesh.shape)
    if used < total:
        # distinguish WHY devices idle: an explicit sub-total topology in
        # the config is a choice; a data axis clamped below the device
        # budget by an indivisible batch is a fixable mistake
        mc = cfg.mesh_config
        mp = max(1, mc.model_parallel) * max(1, mc.pipeline_parallel)
        dp_max = mc.data_parallel if mc.data_parallel > 0 else total // mp
        if mesh.shape[mesh.axis_names[0]] < dp_max:
            return _result(
                "mesh", "WARN",
                f"{shape} uses {used}/{total} devices: batch_size={bs} "
                f"clamps the data axis below {dp_max} — pick a batch "
                f"divisible by it",
            )
        return _result(
            "mesh", "WARN",
            f"{shape} uses {used}/{total} devices (explicit mesh_config "
            "topology — raise data_parallel to use the rest)",
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


def check_pretrained() -> dict:
    """Are the real microsoft/dit-base bytes available for warm start?

    The reference's core recipe is fine-tuning a *pretrained* DiT
    (reference dit_backbone.py:25-31); in a zero-egress environment the
    bytes must be dropped in by hand. Everything downstream of the
    download is automatic — this check prints the exact instruction.
    """
    try:
        from layoutdit_tpu.tools.convert_hf_checkpoint import (
            CKPT_ENV,
            local_checkpoint,
        )
    except Exception as e:  # pragma: no cover - import failure
        return _result("pretrained", "FAIL", f"{type(e).__name__}: {e}")
    found = {p: local_checkpoint(p) for p in CKPT_ENV}
    if any(found.values()):
        have = ", ".join(f"{p}={path}" for p, path in found.items() if path)
        return _result("pretrained", "OK", have)
    return _result(
        "pretrained", "WARN",
        "no pretrained DiT bytes — training starts from random init. To "
        "warm-start: download microsoft/dit-base's pytorch_model.bin "
        "(huggingface.co/microsoft/dit-base), then export "
        f"{CKPT_ENV['dit-base']}=/path/to/pytorch_model.bin; conversion + "
        "warm start are automatic (verify with "
        f"{CKPT_ENV['dit-base']}=... pytest tests/test_convert_checkpoint.py)",
    )


def check_compile_cache() -> dict:
    # EXACTLY the runtime's resolution (main.py) — probing any other
    # directory would vouch for a cache the run never touches
    cache = os.environ.get(
        "LAYOUTDIT_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "layoutdit_jax"),
    )
    if cache == "0":
        return _result("compile-cache", "WARN", "disabled (LAYOUTDIT_JAX_CACHE=0)")
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


def _probe_path(kind: str, path: str | None, timeout_s: float = 15.0) -> dict:
    if not path:
        return _result(f"io:{kind}", "WARN", "not configured")

    def probe():
        import fsspec

        fs, _, paths = fsspec.get_fs_token_paths(path)
        return fs.exists(paths[0])

    try:
        # watchdogged: a blackholed endpoint / gcsfs retry backoff can
        # stall an exists() for minutes — the doctor must not
        finished, exists = _with_timeout(probe, timeout_s)
    except Exception as e:
        return _result(
            f"io:{kind}", "WARN",
            f"{path}: {type(e).__name__}: {e} (credentials/egress?)",
        )
    if not finished:
        return _result(
            f"io:{kind}", "WARN",
            f"{path}: probe still hanging after {timeout_s:.0f}s "
            "(endpoint unreachable?)",
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


def check_checkpoints(timeout_s: float = 15.0) -> dict:
    def probe():
        from layoutdit_tpu.config import get_layout_dit_config
        from layoutdit_tpu.train.checkpoint import list_resume_candidates

        cfg = get_layout_dit_config()
        # the trainer's fallback exactly (Trainer._artifact_base):
        # eval_base_path=None means artifacts land under "."
        base = cfg.eval_config.eval_base_path or "."
        root = f"{base.rstrip('/')}/{cfg.run_name}/model_checkpoints"
        return list_resume_candidates(root)

    try:
        finished, cands = _with_timeout(probe, timeout_s)
    except Exception as e:
        return _result("checkpoints", "WARN", f"{type(e).__name__}: {e}")
    if not finished:
        return _result(
            "checkpoints", "WARN",
            f"listing still hanging after {timeout_s:.0f}s",
        )
    if not cands:
        return _result("checkpoints", "OK", "none yet (fresh run)")
    # cands is best-first — cands[0] is what --resume auto will load
    # (max() would re-derive the rank and can tie-break differently)
    best = cands[0]
    return _result(
        "checkpoints", "OK",
        f"{len(cands)} resumable, --resume auto picks epoch {best[0]} "
        f"at {best[2]}",
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

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

    results = [check_config()]
    if not args.skip_backend:
        backend = check_backend(args.backend_timeout)
        results.append(backend)
        if backend["status"] == "FAIL":
            # a wedged backend would hang the unwatchdogged parts of the
            # mesh build too — report the dependency instead of risking it
            results.append(_result("mesh", "WARN", "skipped: backend FAILed"))
        else:
            results.append(check_mesh())
    results.append(check_native())
    results.append(check_pretrained())
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
