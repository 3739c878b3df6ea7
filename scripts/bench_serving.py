"""Serving-engine throughput: sync vs pipelined dispatch, on chip.

Measures `BatchInferenceEngine.predict_pages` end to end (host decode +
resize + H2D + full detector + D2H) on a synthetic page corpus. The
pipelined engine (decode-ahead workers + async in-flight window) should
hide host decode and the axon tunnel's per-dispatch latency behind
device compute; `--in-flight 1 --workers 1` approximates the synchronous
round-2 engine.

Usage: python scripts/bench_serving.py [--size 224] [--batch 16]
       [--pages 256] [--in-flight 4] [--workers 2] [--int8]
"""

from __future__ import annotations

import argparse
import io
import time

import jax
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from layoutdit_tpu.config.constructs import DetectionBudget  # noqa: E402
from layoutdit_tpu.eval.serving import BatchInferenceEngine  # noqa: E402
from layoutdit_tpu.models.backbone import BackboneConfig  # noqa: E402
from layoutdit_tpu.models.detection.detector import (  # noqa: E402
    DetectorConfig,
    init_detector_params,
)
from layoutdit_tpu.models.vit import DIT_BASE  # noqa: E402


def make_pages(n: int, size: int) -> list[bytes]:
    """JPEG pages near the bucket size (exercises the real decode path)."""
    from PIL import Image

    rng = np.random.default_rng(0)
    pages = []
    for i in range(n):
        h = size + (i % 5) * 8
        w = size - (i % 3) * 8
        buf = io.BytesIO()
        Image.fromarray(rng.integers(0, 255, (h, w, 3), np.uint8)).save(
            buf, format="JPEG", quality=85
        )
        pages.append(buf.getvalue())
    return pages


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=224)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--pages", type=int, default=256)
    ap.add_argument("--in-flight", type=int, default=4)
    ap.add_argument("--workers", type=int, default=2)
    ap.add_argument("--int8", action="store_true")
    ap.add_argument("--post-nms", type=int, default=512,
                    help="serving-recommended rpn_post_nms_top_n_test")
    ap.add_argument("--detector", default="faster_rcnn",
                    choices=["faster_rcnn", "retinanet", "fcos", "detr"],
                    help="family served through the generic "
                    "detector_predict dispatch (VERDICT r4 item 7); the "
                    "post-nms budget knob only affects faster_rcnn — "
                    "single-stage families have no proposal stream and "
                    "DETR has no NMS at all")
    args = ap.parse_args()

    cfg = DetectorConfig(
        backbone=BackboneConfig(vit=DIT_BASE),
        image_size=args.size,
        detector_kind=args.detector,
        budget=DetectionBudget(rpn_post_nms_top_n_test=args.post_nms),
    )

    class M:
        pass

    M.cfg = cfg
    M.params = init_detector_params(jax.random.PRNGKey(0), cfg)

    pages = make_pages(args.pages, args.size)
    engine = BatchInferenceEngine(
        M, image_sizes=(args.size,), batch_size=args.batch,
        score_thresh=0.05, int8=args.int8,
        decode_workers=args.workers, max_in_flight=args.in_flight,
    )
    # Warm-up: compile + axon per-executable program load (2 calls).
    engine.predict_pages(pages[: args.batch])
    engine.predict_pages(pages[: args.batch])

    t0 = time.time()
    results = engine.predict_pages(pages)
    dt = time.time() - t0
    assert len(results) == args.pages
    print(
        f"serving {args.detector} {args.size}px bs{args.batch} "
        f"post_nms={args.post_nms} "
        f"in_flight={args.in_flight} workers={args.workers} "
        f"int8={args.int8}: {args.pages / dt:.1f} pages/s "
        f"({dt * 1e3 / args.pages:.2f} ms/page incl. JPEG decode)"
    )


if __name__ == "__main__":
    main()
