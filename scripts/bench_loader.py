"""Host input-pipeline throughput: can the loader outrun the chip?

Measures end-to-end DetectionLoader img/s (decode + resize + target prep +
assemble) over a local JPEG fixture for both the native C++ path and the
PIL fallback, WITHOUT any device work. Compare against the train step's
img/s (PERF_STAGES.md): the loader must exceed it or the chip starves.

Usage: python scripts/bench_loader.py [--n 512] [--batch 16] [--workers 2]
"""

from __future__ import annotations

import argparse
import os
import tempfile
import time


def main() -> None:
    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=512)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--workers", type=int, default=2)
    args = ap.parse_args()

    from layoutdit_tpu.data.dataset import PubLayNetDataset
    from layoutdit_tpu.data.pipeline import DetectionLoader
    from layoutdit_tpu.tools.make_fixture import make_fixture
    from layoutdit_tpu import native

    with tempfile.TemporaryDirectory() as root:
        make_fixture(root, n_images=args.n, split="samples", seed=0)
        ds = PubLayNetDataset(
            images_root_dir=os.path.join(root, "samples"),
            annotations_json_path=os.path.join(root, "samples.json"),
        )

        variants = [("pil", False)]
        if native.available():
            variants.insert(0, ("native-c++", True))
        for name, use_native in variants:
            loader = DetectionLoader(
                ds, batch_size=args.batch, shuffle=True,
                num_workers=args.workers, drop_last=True,
                device_put=False, use_native=use_native,
            )
            n_img = 0
            it = iter(loader)
            first = next(it)  # exclude producer spin-up
            t0 = time.perf_counter()
            for b in it:
                n_img += b.images.shape[0]
            dt = time.perf_counter() - t0
            print(f"{name:12s} {n_img / dt:8.1f} img/s "
                  f"({args.workers} workers, bs{args.batch})")


if __name__ == "__main__":
    main()
