"""Windowed-attention quality at 1024 px: mAP delta vs full attention.

VERDICT r4 item 3: ViTDet-style windowed attention (window_size=16,
models/vit.py) ships with a measured 1.59x train / 1.55x inference win
at 1024 px (PERF_STAGES.md) and oracle-tested implementation parity —
but windowing CHANGES THE FUNCTION COMPUTED, and no fine-tune had ever
run with it. This script runs the decisive experiment: fine-tune the
same model at 1024 px with full attention and with window_size=16 under
the SAME budget, then score both on the same held-out 1024 px split.

Runs on the real TPU chip by default (a 64x64-grid attention stack is
not CPU-feasible); the model is a scaled-down multi-layer encoder so
the windowed/global mix is exercised (global layers at the taps, like
the production preset configs/train_1024_window.json).

Run: PYTHONPATH=.:/root/.axon_site python scripts/winquality.py
Emits one JSON line per variant; recorded in docs/convergence.md and the
preset's docstring.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")


def run_variant(root: str, window: int, epochs: int) -> dict:
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.tools.make_fixture import write_fixture_config

    cfg_path = write_fixture_config(root, split="samples", epochs=epochs,
                                    batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(cfg_path)))
    cfg.eval_config.eval_input = "val"
    cfg.local_mode = False
    cfg.train_config.checkpoint_interval = epochs
    cfg.train_config.lr_schedule = "cosine"
    cfg.train_config.learning_rate = 2e-4
    cfg.train_config.warmup_steps = 48
    mc = cfg.detection_model_config
    mc.image_size = 1024
    mc.attention_impl = "auto"
    # a deeper encoder than the 2-layer CPU-tiny one, so the windowed/
    # global layer mix actually exercises (taps stay global)
    mc.vit_overrides = {
        "hidden_size": 64, "num_hidden_layers": 4,
        "num_attention_heads": 2, "intermediate_size": 128,
    }
    mc.window_size = window
    mc.window_global_layers = []  # default: the backbone taps stay global
    # bf16 like the production 1024 preset (the CPU-tiny fixture config
    # pins f32 for CPU determinism — not needed on the chip)
    cfg.precision.compute_dtype = "bfloat16"
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        t0 = time.time()
        trainer.train()
        wall = time.time() - t0
        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
    finally:
        set_layout_dit_config(None)
    return {
        "variant": f"window{window}" if window else "full_attention",
        "window_size": window,
        "image_size": 1024,
        "epochs": epochs,
        "train_wall_s": round(wall, 1),
        "mAP": round(metrics["mAP"], 4),
        "AP50": round(metrics["AP50"], 4),
        "AP75": round(metrics.get("AP75", float("nan")), 4),
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--n-train", type=int, default=64)
    ap.add_argument("--n-val", type=int, default=16)
    ap.add_argument("--windows", default="0,16",
                    help="comma list of window sizes (0 = full attention)")
    args = ap.parse_args()

    from layoutdit_tpu.tools.make_fixture import make_fixture

    root = tempfile.mkdtemp(prefix="winquality_")
    make_fixture(root, n_images=args.n_train, split="samples",
                 image_size=1024, seed=0)
    make_fixture(root, n_images=args.n_val, split="val",
                 image_size=1024, seed=777)

    for w in (int(x) for x in args.windows.split(",")):
        print(f"== window={w} ==", file=sys.stderr, flush=True)
        row = run_variant(root, w, args.epochs)
        print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
