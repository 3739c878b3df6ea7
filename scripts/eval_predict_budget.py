"""Quantify the predict-path pooling budget (VERDICT r3 item 1c).

The inference path pools rpn_post_nms_top_n_test=1000 proposals/img
(torchvision default) — 2x the train path's 512. This script trains the
full-size detector on the synthetic fixture, then scores the SAME weights
with post_nms budgets {1000, 512} to measure the mAP effect of halving the
pooled stream (the infer-throughput side is BENCH_POST_NMS in
scripts/bench_infer.py).

Run on the chip: python scripts/eval_predict_budget.py [--n 64] [--epochs 2]
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
    ap.add_argument("--n", type=int, default=64)
    ap.add_argument("--epochs", type=int, default=2)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.eval.evaluator import Evaluator
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
    from layoutdit_tpu.train.trainer import Trainer

    root = args.out or tempfile.mkdtemp(prefix="budget_fixture_")
    make_fixture(root, n_images=args.n, split="samples", seed=0)
    write_fixture_config(root, epochs=args.epochs, batch_size=16)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)

    model = build_model(cfg)
    trainer = Trainer(cfg, model)
    trainer.train()
    print("final train loss:", trainer.loss_history[-1])

    results = {}
    for post_n in (1000, 512):
        cfg2 = cfg.model_copy(deep=True)
        cfg2.detection_model_config.detection_budget.rpn_post_nms_top_n_test = post_n
        cfg2.run_name = f"budget{post_n}"
        set_layout_dit_config(cfg2)
        model2 = build_model(cfg2)
        model2.params = model.params
        metrics = Evaluator(model=model2, layout_dit_config=cfg2).score()
        results[post_n] = {k: round(float(v), 4) for k, v in metrics.items()}
        print(post_n, results[post_n])

    print(json.dumps({"fixture_n": args.n, "epochs": args.epochs,
                      "results": {str(k): v for k, v in results.items()}}))


if __name__ == "__main__":
    main()
