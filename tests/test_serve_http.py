"""HTTP inference server (tools/serve.py): dynamic batching over the
serving engine. New deployment surface — the reference has no online
serving at all (its evaluator.py is offline-only)."""

import json
import os
import threading
import urllib.error
import urllib.request

import pytest

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.models.model import build_model
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
from layoutdit_tpu.tools.serve import DynamicBatcher, make_server


class _EchoEngine:
    """Engine stub recording batch sizes; returns one token per page."""

    batch_size = 4

    def __init__(self):
        self.batches = []
        self.lock = threading.Lock()

    def predict_pages(self, pages):
        with self.lock:
            self.batches.append(len(pages))
        return [f"det:{p.decode()}" for p in pages]


def test_dynamic_batcher_coalesces_concurrent_requests():
    eng = _EchoEngine()
    b = DynamicBatcher(eng, flush_ms=50.0)
    b.start()
    try:
        results = [None] * 6
        threads = [
            threading.Thread(
                target=lambda i=i: results.__setitem__(
                    i, b.submit(f"p{i}".encode())
                )
            )
            for i in range(6)
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        assert results == [f"det:p{i}" for i in range(6)]
        # 6 requests within one 50 ms flush window, max_batch=4 ->
        # strictly fewer device calls than requests (batching happened)
        assert sum(eng.batches) == 6
        assert len(eng.batches) < 6
        assert max(eng.batches) <= 4
    finally:
        b.stop()


def test_dynamic_batcher_error_propagates_to_every_waiter():
    class Boom(_EchoEngine):
        def predict_pages(self, pages):
            raise RuntimeError("device gone")

    b = DynamicBatcher(Boom(), flush_ms=1.0)
    b.start()
    try:
        with pytest.raises(RuntimeError, match="device gone"):
            b.submit(b"x")
    finally:
        b.stop()


@pytest.fixture(scope="module")
def server(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve"))
    make_fixture(root, n_images=4, split="samples", seed=3)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    model = build_model(cfg)
    httpd, batcher = make_server(
        model, "127.0.0.1", 0, image_sizes=(64,), batch_size=4,
        score_thresh=0.0, flush_ms=10.0,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    pages = [
        open(os.path.join(root, "samples", f), "rb").read()
        for f in sorted(os.listdir(os.path.join(root, "samples")))
        if f.endswith(".jpg")
    ]
    try:
        yield url, pages
    finally:
        httpd.shutdown()
        batcher.stop()
        set_layout_dit_config(None)


def _post(url, body, timeout=300):
    req = urllib.request.Request(
        url + "/predict", data=body,
        headers={"Content-Type": "image/jpeg"}, method="POST",
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def test_healthz_and_info(server):
    url, _ = server
    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        assert json.loads(r.read()) == {"status": "ok"}
    with urllib.request.urlopen(url + "/info", timeout=60) as r:
        info = json.loads(r.read())
    assert info["image_sizes"] == [64]
    assert info["num_classes"] == 5
    assert info["label_names"]["1"] == "text"  # JSON keys are strings


def test_predict_single_page(server):
    url, pages = server
    rec = _post(url, pages[0])
    assert len(rec["boxes"]) == len(rec["scores"]) == len(rec["labels"])
    assert rec["boxes"] and len(rec["boxes"][0]) == 4
    assert rec["label_names"][0] in {"text", "title", "list", "table", "figure"}


def test_predict_concurrent_pages_batch(server):
    url, pages = server
    results = [None] * 4
    errs = []

    def go(i):
        try:
            results[i] = _post(url, pages[i % len(pages)])
        except Exception as e:  # noqa: BLE001
            errs.append(e)

    threads = [threading.Thread(target=go, args=(i,)) for i in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=600)
    assert not errs
    assert all(r is not None and r["boxes"] for r in results)


def test_corrupt_page_is_422_and_bad_route_404(server):
    url, _ = server
    req = urllib.request.Request(
        url + "/predict", data=b"not a jpeg", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(req, timeout=300)
    assert exc.value.code == 422

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(url + "/nope", timeout=60)
    assert exc.value.code == 404


def test_metrics_endpoint(server):
    url, pages = server
    _post(url, pages[0])
    with urllib.request.urlopen(url + "/metrics", timeout=60) as r:
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert 'layoutdit_requests_total{method="POST",code="200"}' in text
    assert "layoutdit_pages_total" in text
    assert "layoutdit_batches_total" in text
    assert 'layoutdit_request_seconds_bucket{le="+Inf"}' in text
    # counters are cumulative and consistent
    count = int(text.split("layoutdit_request_seconds_count ")[1].split()[0])
    inf = int(text.split('le="+Inf"} ')[1].split()[0])
    assert count == inf >= 1


def test_sigterm_graceful_shutdown(tmp_path):
    """The real entrypoint in a real process: SIGTERM drains and exits 0
    (the serving counterpart of the trainer's preemption handling)."""
    import signal
    import subprocess
    import sys
    import time

    root = str(tmp_path)
    make_fixture(root, n_images=2, split="samples", seed=4)
    write_fixture_config(root, epochs=1, batch_size=2, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        ckpt = model.save_checkpoint(root, "run", 1)
    finally:
        set_layout_dit_config(None)

    code = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "jax.config.update('jax_compilation_cache_dir',"
        f"{os.path.abspath('.jax_cache')!r});"
        "from layoutdit_tpu.tools.serve import main;"
        f"main(['--checkpoint', {ckpt!r}, '--port', '0',"
        "'--sizes', '64', '--batch-size', '2'])"
    )
    env = {**os.environ, "LAYOUTDIT_CONFIG": os.path.join(root, "cfg.json"),
           "LAYOUTDIT_SKIP_REMOTE_CONFIG": "1"}
    proc = subprocess.Popen(
        [sys.executable, "-c", code], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    import threading as _th

    lines = []
    up = _th.Event()

    def pump():
        for line in proc.stderr:
            lines.append(line)
            if "Serving on" in line:
                up.set()

    reader = _th.Thread(target=pump, daemon=True)
    reader.start()
    try:
        assert up.wait(timeout=180), "".join(lines)[-2000:]
        proc.send_signal(signal.SIGTERM)
        proc.wait(timeout=120)
        reader.join(timeout=30)
        err = "".join(lines)
        assert proc.returncode == 0, err[-2000:]
        assert "SIGTERM: draining" in err
        assert "Server stopped cleanly" in err
    finally:
        if proc.poll() is None:
            proc.kill()


def test_server_over_tensor_parallel_mesh(tmp_path):
    """The HTTP server composes with tensor-parallel serving: a dp x tp
    mesh behind make_server answers /predict with the same detections as
    a mesh-less server (CLI flags --data-parallel/--model-parallel)."""
    import jax
    import numpy as np
    from jax.sharding import Mesh

    root = str(tmp_path)
    make_fixture(root, n_images=2, split="samples", seed=9)
    write_fixture_config(root, epochs=1, batch_size=2, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        page = open(
            sorted(
                os.path.join(root, "samples", f)
                for f in os.listdir(os.path.join(root, "samples"))
                if f.endswith(".jpg")
            )[0],
            "rb",
        ).read()

        mesh = Mesh(np.asarray(jax.devices()).reshape(2, 2, 2)[0],
                    ("data", "model"))
        recs = {}
        for key, m in (("plain", None), ("tp", mesh)):
            httpd, batcher = make_server(
                model, "127.0.0.1", 0, image_sizes=(64,), batch_size=2,
                score_thresh=0.0, flush_ms=5.0, mesh=m,
            )
            thread = threading.Thread(target=httpd.serve_forever, daemon=True)
            thread.start()
            url = f"http://127.0.0.1:{httpd.server_address[1]}"
            try:
                recs[key] = _post(url, page)
            finally:
                httpd.shutdown()
                batcher.stop()
        assert recs["plain"]["labels"] == recs["tp"]["labels"]
        np.testing.assert_allclose(
            recs["plain"]["boxes"], recs["tp"]["boxes"], atol=1e-4
        )
    finally:
        set_layout_dit_config(None)


def test_serve_from_export_artifact(tmp_path):
    """--export-dir serving: the HTTP server runs a frozen StableHLO
    artifact with no live model; /info reflects the manifest (buckets,
    batch size, num_classes) and /predict answers in page coordinates.
    Passing a live model together with export_dir is rejected."""
    import urllib.request

    import jax
    import numpy as np

    from layoutdit_tpu.config.constructs import DetectionBudget
    from layoutdit_tpu.export import export_detector
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        init_detector_params,
    )
    from layoutdit_tpu.models.vit import ViTConfig

    cfg = DetectorConfig(
        backbone=BackboneConfig(
            vit=ViTConfig(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=2, intermediate_size=64,
                          image_size=64),
            fpn_out_channels=32,
        ),
        image_size=64,
        budget=DetectionBudget(
            rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=50,
            box_detections_per_img=10,
        ),
    )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    art = str(tmp_path / "artifact")
    export_detector(params, cfg, art, image_sizes=(64,), batch_size=2)

    with pytest.raises(ValueError, match="frozen artifact"):
        make_server(object(), "127.0.0.1", 0, export_dir=art)

    httpd, batcher = make_server(
        None, "127.0.0.1", 0, score_thresh=0.0, export_dir=art,
    )
    thread = threading.Thread(target=httpd.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{httpd.server_address[1]}"
    try:
        with urllib.request.urlopen(url + "/info", timeout=60) as r:
            info = json.loads(r.read())
        assert info["image_sizes"] == [64]
        assert info["batch_size"] == 2  # manifest, not the default 8
        assert info["num_classes"] == cfg.num_classes

        import io

        from PIL import Image

        buf = io.BytesIO()
        Image.fromarray(
            (np.random.default_rng(5).uniform(0, 255, (60, 40, 3)))
            .astype(np.uint8)
        ).save(buf, format="JPEG")
        got = _post(url, buf.getvalue())
        assert set(got) == {"boxes", "scores", "labels", "label_names"}
        for b in got["boxes"]:  # original page coordinates
            assert 0 <= b[0] <= 40 and 0 <= b[1] <= 60
    finally:
        httpd.shutdown()
        batcher.stop()


def test_export_dir_rejects_sizes_and_batch_flags():
    """--sizes/--batch-size contradict a frozen artifact's manifest —
    rejected loudly (like --int8/--data-parallel/--model-parallel), not
    silently ignored."""
    from layoutdit_tpu.tools.serve import main

    for extra in (["--sizes", "1024"], ["--batch-size", "16"]):
        with pytest.raises(SystemExit, match="artifact manifest"):
            main(["--export-dir", "/nonexistent"] + extra)
