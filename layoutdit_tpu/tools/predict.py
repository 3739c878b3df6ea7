"""Offline prediction CLI: checkpoint + page images -> detections JSON.

The reference has no inference entry point at all — its only CLI trains
then evaluates (main.py:12-43). This tool is the deployment-facing
counterpart: it loads a trained checkpoint, routes pages through the
bucketed ``BatchInferenceEngine`` (eval/serving.py — pipelined decode,
static-shape jitted predict per bucket, optional multi-chip mesh), and
writes one JSON record per page plus optional box-overlay JPEGs.

Usage:
  python -m layoutdit_tpu.tools.predict \
      --checkpoint runs/x/model_checkpoints/best.msgpack \
      --input 'pages/*.jpg' --output detections.json \
      [--sizes 224 512 1024 | --auto-buckets 3] [--batch-size 8]
      [--score-thresh 0.3] [--visualize viz_dir/]
      [--shards shard_dir/]   # read pages from tar shards instead
"""

from __future__ import annotations

import argparse
import glob
import json
import os

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)

def _label_names(n_classes: int, dataset: str | None) -> dict:
    """Class-id -> name map from the dataset-adapter inventories
    (data/adapters.py). Explicit --dataset wins; otherwise matched by
    the model's class count (labels are 1-based, background is 0)."""
    from layoutdit_tpu.data.adapters import SPECS

    if dataset:
        spec = SPECS[dataset]
    else:
        spec = next(
            (s for s in SPECS.values() if s.num_classes == n_classes), None
        )
    if spec is None or spec.num_classes != n_classes:
        return {}
    return {i + 1: n for i, n in enumerate(spec.class_names)}


def collect_inputs(pattern: str) -> list[str]:
    """Directory, glob, or single file -> sorted image paths."""
    if os.path.isdir(pattern):
        paths = [
            os.path.join(pattern, f)
            for f in os.listdir(pattern)
            if f.lower().endswith((".jpg", ".jpeg", ".png"))
        ]
    else:
        paths = glob.glob(pattern)
    if not paths:
        raise FileNotFoundError(f"no input images match {pattern!r}")
    return sorted(paths)


def _page_sizes(paths: list[str], reader=None) -> list[tuple[int, int]]:
    """(h, w) per page — PIL parses only the header, no pixel decode.
    reader: optional name -> bytes (shard mode)."""
    import io

    from PIL import Image

    sizes = []
    for p in paths:
        src = io.BytesIO(reader(p)) if reader is not None else p
        with Image.open(src) as im:
            w, h = im.size
        sizes.append((h, w))
    return sizes


def _visualize(src, dets, out_path: str, names: dict) -> None:
    """src: an image path or raw bytes (shard mode)."""
    import io

    from PIL import Image, ImageDraw

    if isinstance(src, (bytes, bytearray)):
        src = io.BytesIO(src)
    with Image.open(src) as im:
        im = im.convert("RGB")
        if getattr(dets, "masks", None) is not None:
            # instance masks: red at 40% over each detection's window
            import numpy as np

            arr = np.asarray(im).copy()
            for x0, y0, bm in dets.masks:
                h, w = bm.shape
                y1, x1 = min(y0 + h, arr.shape[0]), min(x0 + w, arr.shape[1])
                if y1 <= y0 or x1 <= x0:
                    continue
                win = arr[y0:y1, x0:x1]
                sel = bm[: y1 - y0, : x1 - x0].astype(bool)
                win[sel] = (
                    0.6 * win[sel] + 0.4 * np.array([255.0, 0.0, 0.0])
                ).astype(np.uint8)
            im = Image.fromarray(arr)
        draw = ImageDraw.Draw(im)
        for box, score, label in zip(dets.boxes, dets.scores, dets.labels):
            x1, y1, x2, y2 = [float(v) for v in box]
            draw.rectangle([x1, y1, x2, y2], outline="red", width=2)
            draw.text(
                (x1, max(0.0, y1 - 12)),
                f"{names.get(int(label), int(label))}:{float(score):.2f}",
                fill="red",
            )
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        im.save(out_path, "JPEG")


def run(args) -> list[dict]:
    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.eval.serving import BatchInferenceEngine
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.serve import detections_to_json

    config = get_layout_dit_config()
    model = build_model(config, warm_start=False)
    model.restore_checkpoint(args.checkpoint)
    logger.info("Loaded checkpoint %s", args.checkpoint)

    shard_index = None
    if args.shards:
        from layoutdit_tpu.data.shards import ShardIndex

        shard_index = ShardIndex(args.shards)
        paths = sorted(shard_index.entries)
        if args.input:
            import fnmatch

            paths = [p for p in paths if fnmatch.fnmatch(p, args.input)]
        if not paths:
            raise FileNotFoundError(
                f"no shard members match {args.input!r} in {args.shards}"
            )
    else:
        paths = collect_inputs(args.input)
    logger.info("Predicting %d pages", len(paths))

    kwargs = dict(
        batch_size=args.batch_size,
        score_thresh=args.score_thresh,
        int8=args.int8,
    )
    if args.auto_buckets:
        reader = None
        if shard_index is not None:
            def reader(name):  # noqa: E306
                # header-only ranged read; fall back to the full member
                # for exotic encodings with late size markers
                head = shard_index.read_prefix(name, 1 << 16)
                try:
                    import io

                    from PIL import Image

                    with Image.open(io.BytesIO(head)) as im:
                        im.size
                    return head
                except Exception:  # noqa: BLE001
                    return shard_index.read(name)
        engine = BatchInferenceEngine.from_corpus(
            model, _page_sizes(paths, reader),
            max_buckets=args.auto_buckets, **kwargs
        )
    else:
        engine = BatchInferenceEngine(
            model, image_sizes=tuple(args.sizes), **kwargs
        )
    logger.info("Serving buckets: %s", engine.image_sizes)

    n_classes = config.detection_model_config.num_classes
    names = _label_names(n_classes, args.dataset)
    records = []
    # chunked so a PubLayNet-scale corpus never sits in RAM all at once:
    # only one chunk of raw bytes + detections is live at a time (the
    # engine pipelines decode/compute within each chunk)
    chunk_pages = max(args.batch_size * 32, args.batch_size)
    for start in range(0, len(paths), chunk_pages):
        chunk = paths[start:start + chunk_pages]
        if shard_index is not None:
            pages = [shard_index.read(p) for p in chunk]
        else:
            pages = [open(p, "rb").read() for p in chunk]
        detections = engine.predict_pages(pages)
        for idx_in_chunk, (path, dets) in enumerate(zip(chunk, detections)):
            # same record schema as the HTTP server's /predict (incl.
            # windowed-RLE instance masks for with_mask models)
            records.append({"file": path, **detections_to_json(dets, names)})
            if args.visualize:
                out = os.path.join(
                    args.visualize, os.path.basename(path) + ".pred.jpg"
                )
                # reuse the chunk's in-memory bytes: no second shard read
                src = pages[idx_in_chunk] if shard_index is not None else path
                _visualize(src, dets, out, names)
        del pages
        if len(paths) > chunk_pages:
            logger.info("Predicted %d/%d pages",
                        min(start + chunk_pages, len(paths)), len(paths))

    if args.output:
        import fsspec

        with fsspec.open(args.output, "w", auto_mkdir=True) as f:
            f.write(json.dumps(records, indent=1))
        logger.info("Wrote %d page records to %s", len(records), args.output)
    return records


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Run layout detection on page images"
    )
    parser.add_argument("--checkpoint", required=True,
                        help="framework checkpoint (.msgpack or .orbax dir)")
    parser.add_argument("--input", default=None,
                        help="image file, directory, or glob (with "
                             "--shards: optional member-name filter)")
    parser.add_argument("--shards", default=None,
                        help="read pages from a tar-shard dir built by "
                             "tools/make_shards.py instead of files")
    parser.add_argument("--output", default=None,
                        help="detections JSON path (fsspec: local or gs://)")
    parser.add_argument("--sizes", type=int, nargs="+", default=[224],
                        help="serving bucket resolutions")
    parser.add_argument("--auto-buckets", type=int, default=0,
                        help="plan N cost-optimal buckets from the input "
                             "pages' sizes instead of --sizes")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--score-thresh", type=float, default=0.05)
    parser.add_argument("--int8", action="store_true",
                        help="int8 W8A8 encoder (ops/quant.py)")
    parser.add_argument("--dataset", default=None,
                        choices=["publaynet", "doclaynet", "docbank"],
                        help="label-name inventory (default: inferred "
                             "from the model's class count)")
    parser.add_argument("--visualize", default=None,
                        help="directory for box-overlay JPEGs")
    args = parser.parse_args(argv)
    if not args.input and not args.shards:
        parser.error("one of --input / --shards is required")
    # offline tool: don't probe gs:// for config unless the user set it up
    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
    run(args)


if __name__ == "__main__":
    main()
