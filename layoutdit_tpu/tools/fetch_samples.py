"""Fetch the PubLayNet examples tarball for local runs.

Equivalent of the reference's download_test_data_script.py:1-19 (same CDN
artifact, same ``examples/`` output layout), with a ``--synthetic``
fallback that generates the fixture dataset instead — this environment has
no network egress, and tests/benchmarks use the synthetic pages.

Usage:
  python -m layoutdit_tpu.tools.fetch_samples [--out examples] [--synthetic]
"""

from __future__ import annotations

import argparse
import os
import tarfile

EXAMPLES_URL = (
    "https://dax-cdn.cdn.appdomain.cloud/dax-publaynet/1.0.0/examples.tar.gz"
)


def fetch(out_dir: str = "examples") -> str:
    import urllib.request

    os.makedirs(out_dir, exist_ok=True)
    tar_path = os.path.join(out_dir, "examples.tar.gz")
    if not os.path.exists(tar_path):
        print(f"downloading {EXAMPLES_URL}")
        urllib.request.urlretrieve(EXAMPLES_URL, tar_path)
    with tarfile.open(tar_path, "r:gz") as tf:
        tf.extractall(out_dir, filter="data")
    return out_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="examples")
    ap.add_argument(
        "--synthetic", action="store_true",
        help="generate synthetic sample pages instead of downloading",
    )
    ap.add_argument("--n", type=int, default=64)
    args = ap.parse_args()
    if args.synthetic:
        from layoutdit_tpu.tools.make_fixture import make_fixture

        path = make_fixture(args.out, n_images=args.n, split="samples")
        print(f"synthetic samples: {path}")
    else:
        print(f"samples: {fetch(args.out)}")


if __name__ == "__main__":
    main()
