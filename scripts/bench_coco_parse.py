"""Reproducible benchmark: native COCO scanner vs Python json.loads.

Generates a synthetic PubLayNet-shaped annotations blob (segmentation
polygons dominate the bytes, as in the real file) and times both
parsers. CPU-only — runs anywhere.

  python scripts/bench_coco_parse.py [--images 30000] [--anns 200000]
"""

import argparse
import json
import time

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--images", type=int, default=30000)
    ap.add_argument("--anns", type=int, default=200000)
    args = ap.parse_args()

    from layoutdit_tpu.native import cocojson

    rng = np.random.default_rng(0)
    data = {
        "images": [
            {"id": i, "width": 612, "height": 792,
             "file_name": f"PMC{i:07d}.jpg"}
            for i in range(args.images)
        ],
        "annotations": [
            {"id": j, "image_id": j % args.images, "category_id": j % 5 + 1,
             "bbox": [float(j % 600), 12.5, 50.25, 20.125],
             "area": 1010.0, "iscrowd": 0,
             "segmentation": [[float(v) for v in rng.uniform(0, 600, 16)]]}
            for j in range(args.anns)
        ],
        "categories": [
            {"id": c, "name": n}
            for c, n in enumerate(
                ["text", "title", "list", "table", "figure"], 1
            )
        ],
    }
    raw = json.dumps(data).encode()
    print(f"blob: {len(raw) / 1e6:.1f} MB "
          f"({args.images} images, {args.anns} annotations)")

    t = time.time()
    py = json.loads(raw)
    t_py = time.time() - t
    assert len(py["annotations"]) == args.anns

    assert cocojson.available(), "native parser failed to build"
    t = time.time()
    arr = cocojson.parse_coco_bytes(raw)
    t_na = time.time() - t
    assert arr is not None and len(arr.ann_id) == args.anns

    print(f"json.loads: {t_py:.2f}s ({len(raw) / 1e6 / t_py:.0f} MB/s)")
    print(f"native:     {t_na:.2f}s ({len(raw) / 1e6 / t_na:.0f} MB/s)")
    print(f"speedup:    {t_py / t_na:.1f}x")


if __name__ == "__main__":
    main()
