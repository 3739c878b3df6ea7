"""HTTP inference server: a dynamic-batching REST front end over the
bucketed serving engine.

The reference stops at offline eval (evaluator.py — there is no serving
or even inference entry point); this is the online deployment surface.
Stdlib-only (`http.server`): concurrent POSTs land in a queue, a single
dispatcher thread coalesces them into engine-sized batches (up to
``--max-batch`` pages or a ``--flush-ms`` window, whichever first) and
runs ONE bucketed device call per batch — the classic dynamic-batching
pattern that keeps the TPU's static-shape executables full under
ragged request arrival.

Endpoints:
  GET  /healthz   -> {"status": "ok"}
  GET  /info      -> buckets, batch size, class inventory
  POST /predict   -> body = image bytes (JPEG/PNG) ->
                     {"boxes": [[x1,y1,x2,y2]..], "scores": [..],
                      "labels": [..], "label_names": [..]}
                     (boxes in original page coordinates)

Usage:
  python -m layoutdit_tpu.tools.serve --checkpoint ckpt.msgpack \
      --port 8000 --sizes 224 1024 [--batch-size 8] [--flush-ms 5]
"""

from __future__ import annotations

import argparse
import json
import os
import queue
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


class _Waiter:
    """One in-flight request: the handler thread blocks on ``event``
    until the dispatcher fills ``result`` (or ``error``)."""

    __slots__ = ("page", "event", "result", "error", "cancelled")

    def __init__(self, page: bytes):
        self.page = page
        self.event = threading.Event()
        self.result = None
        self.error: Exception | None = None
        self.cancelled = False  # set when the submitter gave up waiting


class DynamicBatcher:
    """Coalesce concurrent single-page requests into engine batches.

    A request thread calls ``submit(page)`` and blocks; the dispatcher
    thread drains the queue up to ``max_batch`` pages — waiting at most
    ``flush_ms`` after the first arrival to let a batch fill — then runs
    ``engine.predict_pages`` once for the whole batch. Per-batch device
    work therefore amortizes dispatch latency and fills the static batch
    the jitted predict executable was compiled for.
    """

    def __init__(self, engine, max_batch: int | None = None,
                 flush_ms: float = 5.0, metrics=None):
        self.engine = engine
        self.metrics = metrics
        self.max_batch = max_batch or engine.batch_size
        self.flush_s = flush_ms / 1000.0
        self._q: queue.Queue[_Waiter | None] = queue.Queue()
        self._thread: threading.Thread | None = None

    def start(self) -> None:
        self._thread = threading.Thread(
            target=self._loop, name="batcher", daemon=True
        )
        self._thread.start()

    def stop(self) -> None:
        if self._thread is not None:
            self._q.put(None)
            self._thread.join(timeout=30)
            self._thread = None

    def submit(self, page: bytes, timeout: float = 300.0):
        """Blocking: returns PageDetections for one page."""
        w = _Waiter(page)
        self._q.put(w)
        if not w.event.wait(timeout):
            # mark dead so the dispatcher skips it instead of burning a
            # device batch slot on a result nobody will read
            w.cancelled = True
            raise TimeoutError("inference timed out")
        if w.error is not None:
            raise w.error
        return w.result

    def _collect(self) -> list[_Waiter] | None:
        """One batch: block for the first request, then fill until
        max_batch or the flush window closes. None = shutdown."""
        import time

        first = self._q.get()
        while first is not None and first.cancelled:
            first = self._q.get()
        if first is None:
            return None
        batch = [first]
        deadline = time.monotonic() + self.flush_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._q.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is None:  # re-queue shutdown for the outer loop
                self._q.put(None)
                break
            if not nxt.cancelled:
                batch.append(nxt)
        return batch

    def _loop(self) -> None:
        while True:
            batch = self._collect()
            if batch is None:
                return
            try:
                dets = self.engine.predict_pages([w.page for w in batch])
                for w, d in zip(batch, dets):
                    w.result = d
                if self.metrics is not None:
                    self.metrics.observe_batch(len(batch))
            except Exception as e:  # noqa: BLE001 — fulfil every waiter
                logger.exception("batch of %d failed", len(batch))
                for w in batch:
                    w.error = e
            finally:
                for w in batch:
                    w.event.set()


class ServerMetrics:
    """Prometheus text-exposition counters/histogram for the server
    (GET /metrics). Stdlib-only, lock-guarded; scrape-friendly names."""

    BUCKETS = (0.025, 0.05, 0.1, 0.25, 0.5, 1.0, 2.5, 5.0, 10.0)

    def __init__(self):
        self._lock = threading.Lock()
        self.requests = {}         # (method, code) -> count
        self.pages = 0
        self.batches = 0
        self.batch_pages = 0
        self.lat_sum = 0.0
        self.lat_count = 0
        self.lat_buckets = [0] * (len(self.BUCKETS) + 1)

    def observe_request(self, method: str, code: int, seconds: float) -> None:
        with self._lock:
            key = (method, code)
            self.requests[key] = self.requests.get(key, 0) + 1
            self.lat_sum += seconds
            self.lat_count += 1
            for i, b in enumerate(self.BUCKETS):
                if seconds <= b:
                    self.lat_buckets[i] += 1
                    break
            else:
                self.lat_buckets[-1] += 1

    def observe_batch(self, n_pages: int) -> None:
        with self._lock:
            self.batches += 1
            self.batch_pages += n_pages
            self.pages += n_pages

    def render(self) -> str:
        with self._lock:
            lines = [
                "# TYPE layoutdit_requests_total counter",
            ]
            for (method, code), n in sorted(self.requests.items()):
                lines.append(
                    f'layoutdit_requests_total{{method="{method}",'
                    f'code="{code}"}} {n}'
                )
            lines += [
                "# TYPE layoutdit_pages_total counter",
                f"layoutdit_pages_total {self.pages}",
                "# TYPE layoutdit_batches_total counter",
                f"layoutdit_batches_total {self.batches}",
                "# TYPE layoutdit_batch_pages_total counter",
                f"layoutdit_batch_pages_total {self.batch_pages}",
                "# TYPE layoutdit_request_seconds histogram",
            ]
            acc = 0
            for b, n in zip(self.BUCKETS, self.lat_buckets):
                acc += n
                lines.append(
                    f'layoutdit_request_seconds_bucket{{le="{b}"}} {acc}'
                )
            acc += self.lat_buckets[-1]
            lines.append(
                f'layoutdit_request_seconds_bucket{{le="+Inf"}} {acc}'
            )
            lines.append(f"layoutdit_request_seconds_sum {self.lat_sum}")
            lines.append(f"layoutdit_request_seconds_count {self.lat_count}")
            return "\n".join(lines) + "\n"


def detections_to_json(dets, names: dict) -> dict:
    out = {
        "boxes": [[round(float(v), 2) for v in b] for b in dets.boxes],
        "scores": [round(float(s), 4) for s in dets.scores],
        "labels": [int(l) for l in dets.labels],
        "label_names": [names.get(int(l), str(int(l))) for l in dets.labels],
    }
    if getattr(dets, "masks", None) is not None:
        # Mask R-CNN models: per-detection instance masks as COCO
        # uncompressed RLE over the detection's local window —
        # {"offset": [x0, y0], "size": [h, w], "counts": [...]}
        from layoutdit_tpu.eval.masks import encode_rle

        out["masks"] = [
            {
                "offset": [int(x0), int(y0)],
                **encode_rle((0, 0, bm), *bm.shape),
            }
            for x0, y0, bm in dets.masks
        ]
    return out


def make_handler(batcher: DynamicBatcher, names: dict, info: dict,
                 metrics: ServerMetrics | None = None):
    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code: int, payload: dict) -> None:
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):  # noqa: N802 — http.server API
            if self.path == "/healthz":
                self._json(200, {"status": "ok"})
            elif self.path == "/info":
                self._json(200, info)
            elif self.path == "/metrics" and metrics is not None:
                body = metrics.render().encode()
                self.send_response(200)
                self.send_header("Content-Type",
                                 "text/plain; version=0.0.4")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):  # noqa: N802
            if self.path != "/predict":
                self._json(404, {"error": f"no route {self.path}"})
                return
            length = int(self.headers.get("Content-Length", 0))
            if length <= 0:
                self._json(400, {"error": "empty body; POST image bytes"})
                return
            page = self.rfile.read(length)
            import time as _time

            t0 = _time.monotonic()

            def done(code, payload):
                if metrics is not None:
                    metrics.observe_request(
                        "POST", code, _time.monotonic() - t0
                    )
                self._json(code, payload)

            try:
                dets = batcher.submit(page)
            except Exception as e:  # noqa: BLE001 — surface as 500
                done(500, {"error": str(e)})
                return
            payload = detections_to_json(dets, names)
            # corrupt/undecodable page: engine zeroes the slot -> no boxes
            if not payload["boxes"] and not _decodable(page):
                done(422, {"error": "page failed to decode"})
                return
            done(200, payload)

        def log_message(self, fmt, *args):  # route through our logger
            logger.info("%s %s", self.address_string(), fmt % args)

    return Handler


def _decodable(page: bytes) -> bool:
    import io

    from PIL import Image

    try:
        with Image.open(io.BytesIO(page)) as im:
            im.size  # header parse only
        return True
    except Exception:
        return False


def make_server(model, host: str, port: int, *, image_sizes=(224,),
                batch_size: int = 8, score_thresh: float = 0.05,
                flush_ms: float = 5.0, max_batch: int | None = None,
                int8: bool = False, dataset: str | None = None,
                mesh=None, export_dir: str | None = None):
    """(ThreadingHTTPServer, DynamicBatcher) — batcher already started.
    Split from main() so tests can run the server in-process. ``mesh``:
    optional jax.sharding.Mesh — dp serving, or tensor-parallel when the
    mesh has a 'model' axis (eval/serving.py). ``export_dir``: serve a
    frozen AOT artifact (export.py) instead of a live model — pass
    ``model=None``; buckets/batch size come from the artifact manifest
    and int8/mesh do not apply (bake quantization or shardings in at
    export time)."""
    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.tools.predict import _label_names

    n_classes = None
    if export_dir is not None:
        if model is not None or int8 or mesh is not None:
            raise ValueError(
                "--export-dir serves a frozen artifact: model/int8/mesh "
                "do not apply (bake them in at export time)"
            )
        from layoutdit_tpu.eval.serving import ExportedInferenceEngine

        engine = ExportedInferenceEngine(
            export_dir, score_thresh=score_thresh
        )
        n_classes = engine.exported.manifest.get("num_classes")
        batch_size = engine.batch_size
    else:
        from layoutdit_tpu.eval.serving import BatchInferenceEngine

        engine = BatchInferenceEngine(
            model, image_sizes=tuple(image_sizes), batch_size=batch_size,
            score_thresh=score_thresh, int8=int8, mesh=mesh,
        )
    if n_classes is None:  # live model, or a pre-num_classes manifest
        config = get_layout_dit_config()
        n_classes = config.detection_model_config.num_classes
    names = _label_names(n_classes, dataset)
    info = {
        "image_sizes": list(engine.image_sizes),
        "batch_size": batch_size,
        "max_batch": max_batch or batch_size,
        "num_classes": n_classes,
        "label_names": names,
    }
    metrics = ServerMetrics()
    batcher = DynamicBatcher(
        engine, max_batch=max_batch, flush_ms=flush_ms, metrics=metrics
    )
    batcher.start()

    class _Server(ThreadingHTTPServer):
        # non-daemon handlers + block_on_close: server_close() joins
        # in-flight request threads, so a SIGTERM drain really does let
        # responses finish before the process exits
        daemon_threads = False

    httpd = _Server((host, port), make_handler(batcher, names, info, metrics))
    httpd.metrics = metrics  # for callers/tests
    httpd.info = info
    return httpd, batcher


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Layout detection HTTP server")
    src = parser.add_mutually_exclusive_group(required=True)
    src.add_argument("--checkpoint", help="live model checkpoint to serve")
    src.add_argument("--export-dir",
                     help="serve a frozen AOT artifact "
                          "(tools/export_model.py); buckets and batch "
                          "size come from its manifest")
    parser.add_argument("--host", default="127.0.0.1")
    parser.add_argument("--port", type=int, default=8000)
    # defaults resolved below: live serving gets 224/8; with --export-dir
    # the artifact manifest is authoritative and passing either is an error
    parser.add_argument("--sizes", type=int, nargs="+", default=None)
    parser.add_argument("--batch-size", type=int, default=None)
    parser.add_argument("--max-batch", type=int, default=None,
                        help="dynamic-batch cap (default: --batch-size)")
    parser.add_argument("--flush-ms", type=float, default=5.0,
                        help="max wait for a batch to fill")
    parser.add_argument("--score-thresh", type=float, default=0.05)
    parser.add_argument("--int8", action="store_true")
    parser.add_argument("--dataset", default=None,
                        choices=["publaynet", "doclaynet", "docbank"])
    parser.add_argument("--data-parallel", type=int, default=0,
                        help="serve over a device mesh: data-parallel "
                             "ways (-1 = all remaining devices; 0 = no "
                             "mesh)")
    parser.add_argument("--model-parallel", type=int, default=1,
                        help="tensor-parallel ways (shards the weights "
                             "over a 'model' mesh axis)")
    args = parser.parse_args(argv)

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

    model = None
    if args.checkpoint is not None:
        from layoutdit_tpu.config import get_layout_dit_config
        from layoutdit_tpu.models.model import build_model

        config = get_layout_dit_config()
        model = build_model(config, warm_start=False)
        model.restore_checkpoint(args.checkpoint)
    elif (args.int8 or args.data_parallel or args.model_parallel > 1
          or args.sizes is not None or args.batch_size is not None):
        raise SystemExit(
            "--export-dir serves a frozen artifact: --int8/--data-parallel/"
            "--model-parallel/--sizes/--batch-size do not apply (bake them "
            "in at export time; buckets and batch size come from the "
            "artifact manifest)"
        )
    if args.sizes is None:
        args.sizes = [224]
    if args.batch_size is None:
        args.batch_size = 8

    mesh = None
    if args.data_parallel or args.model_parallel > 1:
        # strict=True: a requested tensor-parallel topology must never be
        # SILENTLY replaced by build_mesh's Nx1 fallback. The mesh covers
        # a device prefix when dp*mp < devices (serving may deliberately
        # reserve chips).
        import jax

        from layoutdit_tpu.config.constructs import MeshConfig
        from layoutdit_tpu.parallel.mesh import build_mesh

        devices = jax.devices()
        mp = max(1, args.model_parallel)
        dp = (
            args.data_parallel
            if args.data_parallel > 0
            else max(1, len(devices) // mp)
        )
        need = dp * mp
        if need > len(devices):
            raise SystemExit(
                f"requested data_parallel={dp} x model_parallel={mp} = "
                f"{need} devices, but only {len(devices)} available"
            )
        mesh = build_mesh(
            MeshConfig(data_parallel=dp, model_parallel=mp),
            devices=devices[:need],
            strict=True,
        )
        if need < len(devices):
            logger.warning(
                "serving uses %d of %d devices (dp=%d x mp=%d)",
                need, len(devices), dp, mp,
            )
        logger.info("Serving over mesh %s", mesh)

    httpd, batcher = make_server(
        model, args.host, args.port, image_sizes=args.sizes,
        batch_size=args.batch_size, score_thresh=args.score_thresh,
        flush_ms=args.flush_ms, max_batch=args.max_batch, int8=args.int8,
        dataset=args.dataset, mesh=mesh, export_dir=args.export_dir,
    )
    # graceful preemption: SIGTERM (TPU-VM/GKE preemption signal) stops
    # accepting, lets in-flight requests finish, drains the batcher —
    # the serving counterpart of the trainer's preemption checkpoint.
    # shutdown() must run off the serve_forever thread. Installed BEFORE
    # the "Serving on" announcement: orchestrators treat that line as
    # readiness and may preempt any time after it.
    import signal

    def _term(signum, frame):
        logger.warning("SIGTERM: draining and shutting down")
        threading.Thread(target=httpd.shutdown, daemon=True).start()

    try:
        signal.signal(signal.SIGTERM, _term)
    except ValueError:
        # signal handlers are main-thread-only; embedded callers (tests,
        # notebooks) drive httpd.shutdown() themselves
        logger.warning("not in main thread; SIGTERM handler not installed")
    logger.info("Serving on http://%s:%d (buckets %s)",
                args.host, httpd.server_address[1],
                httpd.info["image_sizes"])
    try:
        httpd.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        httpd.shutdown()       # stop accepting
        httpd.server_close()   # join in-flight handler threads
        batcher.stop()         # then drain the dispatcher
        logger.info("Server stopped cleanly")


if __name__ == "__main__":
    main()
