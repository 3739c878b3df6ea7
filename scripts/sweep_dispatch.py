"""steps_per_dispatch sweep at a REALISTIC epoch length (VERDICT r3 item 2).

The round-2 CLI gap: 132 img/s end-to-end vs ~369 compute-only, caused by
the axon tunnel's ~30-50 ms per-dispatch latency. steps_per_dispatch=S
runs S train steps per device call (one unrolled lax.scan over a stacked
super-batch, H2D overlapped by the producer thread); on the round-2
128-image fixture the epoch bubbles swamped the win. This sweeps S on a
1024-image fixture and reports STEADY-STATE epoch throughput (first epoch
discarded — it pays compile).

Run on the chip: python scripts/sweep_dispatch.py [--n 1024] [--svals 1 8]
"""

from __future__ import annotations

import argparse
import json
import os
import tempfile

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--svals", type=int, nargs="*", default=[1, 8])
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--fixture-dir", default=None,
                    help="reuse an existing fixture dir instead of building")
    args = ap.parse_args()

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
    from layoutdit_tpu.train.trainer import Trainer

    root = args.fixture_dir or tempfile.mkdtemp(prefix="sweep_fixture_")
    if not os.path.exists(os.path.join(root, "samples.json")):
        make_fixture(root, n_images=args.n, split="samples", seed=0)
        write_fixture_config(root, epochs=args.epochs, batch_size=16)

    results = {}
    for s in args.svals:
        cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
        cfg.run_name = f"sweep_s{s}"
        cfg.train_config.steps_per_dispatch = s
        set_layout_dit_config(cfg)
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        steady = trainer.epoch_images_per_sec[1:]
        results[s] = {
            "epoch_img_s": [round(x, 1) for x in trainer.epoch_images_per_sec],
            "steady_img_s": round(sum(steady) / max(len(steady), 1), 1),
        }
        print(f"S={s}: {results[s]}")
        set_layout_dit_config(None)

    print(json.dumps({"n_images": args.n, "results":
                      {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
