"""Pack a page-image corpus into tar shards (data/shards.py).

Usage:
  python -m layoutdit_tpu.tools.make_shards \
      --images gs://bucket/data/train --annotations gs://bucket/train.json \
      --out gs://bucket/shards/train [--shard-mb 256]

Reads the file list from the COCO annotations (so shard order matches
the dataset's image order) and writes shard-*.tar + index.json. Train
against the result with ``data/shards.make_sharded_dataset``.
"""

from __future__ import annotations

import argparse
import json
import os

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description="Pack images into tar shards")
    parser.add_argument("--images", required=True,
                        help="images root (local or gs://)")
    parser.add_argument("--annotations", required=True,
                        help="COCO annotations JSON (defines the file list)")
    parser.add_argument("--out", required=True, help="shard output dir")
    parser.add_argument("--shard-mb", type=int, default=256)
    args = parser.parse_args(argv)

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
    import fsspec

    from layoutdit_tpu.data.shards import build_shards
    from layoutdit_tpu.utils.paths import join_path

    with fsspec.open(args.annotations, "r") as f:
        coco = json.load(f)
    file_names = [img["file_name"] for img in coco["images"]]
    logger.info("Packing %d images from %s", len(file_names), args.images)

    def read_bytes(name: str) -> bytes:
        with fsspec.open(join_path(args.images, name), "rb") as fh:
            return fh.read()

    index = build_shards(
        file_names, read_bytes, args.out,
        shard_size_bytes=args.shard_mb * 1024 * 1024,
    )
    logger.info("Done: %d shards -> %s", len(index["shards"]), args.out)


if __name__ == "__main__":
    main()
