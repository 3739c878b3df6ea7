"""Quality-vs-throughput matrix: held-out fixture convergence per family.

VERDICT r4 item 2: the four round-4 detector families (RetinaNet, FCOS,
DETR, Mask) and Cascade shipped with overfit tests only — overfit proves
gradients flow, not that the family *learns*. This runner re-runs the
docs/convergence.md recipe (128-page synthetic train split, 32-page
HELD-OUT split, 48 epochs, cosine 2e-4, bs8, tiny detector) for any
family through the PRODUCTION path (config -> build_model -> Trainer ->
Evaluator -> vectorized COCOeval) and emits one JSON line with the
held-out metrics. The reference job being proxied is
/root/reference/src/layoutdit/training/trainer.py:204-215 ->
evaluator.py:266-286 (fine-tune then 12-metric COCO eval); PubLayNet
itself is unreachable in this zero-egress environment.

Run one family per process (a crash in one family must not eat the
matrix):

    for f in faster_rcnn cascade mask retinanet fcos detr; do
        python scripts/convergence_matrix.py --family $f \
            >> /tmp/matrix.jsonl 2>/tmp/matrix_$f.log
    done

Results are recorded in docs/convergence.md; the RetinaNet/FCOS floors
are pinned by tests/test_convergence.py.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

# Family -> ModelConfig overrides. "cascade" and "mask" are modifiers of
# the faster_rcnn RoI pipeline; the rest switch detector_kind.
FAMILY_KNOBS: dict[str, dict] = {
    "faster_rcnn": {},
    "cascade": {"cascade_iou_threshs": [0.5, 0.6, 0.7]},
    "mask": {"with_mask": True},
    "retinanet": {"detector": "retinanet"},
    "fcos": {"detector": "fcos"},
    "detr": {"detector": "detr"},
    # quality cost of the matcher-latency mitigation (PERF_STAGES.md
    # round 5): same DETR, Hungarian solved on the final layer only
    "detr_shared": {"detector": "detr", "detr_shared_matching": True},
}


def run_family(family: str, root: str, epochs: int, lr: float,
               batch_size: int = 8, eval_split: str = "val",
               n_train: int = 128) -> dict:
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.tools.make_fixture import (
        make_fixture,
        write_fixture_config,
    )

    make_fixture(root, n_images=n_train, split="samples", seed=0)
    make_fixture(root, n_images=32, split="val", seed=777)
    cfg_path = write_fixture_config(root, split="samples", epochs=epochs,
                                    batch_size=batch_size, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(cfg_path)))
    # eval_split="samples" scores the TRAIN split — the memorization
    # probe separating "eval path broken" from "family did not
    # generalize" (used for the DETR small-data diagnosis, round 5)
    cfg.eval_config.eval_input = eval_split
    # write_fixture_config's local_mode=True reroutes TRAINING to
    # eval_input (reference sample-split semantics) — that would train on
    # the held-out 32 pages and measure memorization. Train on the 128.
    cfg.local_mode = False
    cfg.train_config.checkpoint_interval = epochs
    # the calibrated fine-tune recipe (docs/convergence.md): cosine decay
    # + brief warmup; the default StepLR decays 10x too early at 48 epochs
    cfg.train_config.lr_schedule = "cosine"
    cfg.train_config.learning_rate = lr
    cfg.train_config.warmup_steps = 48
    for k, v in FAMILY_KNOBS[family].items():
        setattr(cfg.detection_model_config, k, v)
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        t0 = time.time()
        trainer.train()
        train_s = time.time() - t0
        losses = [float(x) for x in trainer.loss_history]
        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
    finally:
        set_layout_dit_config(None)

    row = {
        "family": family,
        "epochs": epochs,
        "lr": lr,
        "train_wall_s": round(train_s, 1),
        "first4_loss": round(sum(losses[:4]) / 4, 4),
        "last4_loss": round(sum(losses[-4:]) / 4, 4),
        "mAP": round(metrics["mAP"], 4),
        "AP50": round(metrics["AP50"], 4),
        "AP75": round(metrics.get("AP75", float("nan")), 4),
    }
    for name in ("text", "title", "list", "figure", "table"):
        key = f"AP50-{name}"
        if key in metrics:
            row[key] = round(metrics[key], 4)
    if family == "mask":
        for k in ("segm_mAP", "segm_AP50", "segm_AP75"):
            if k in metrics:
                row[k] = round(metrics[k], 4)
    return row


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--family", required=True, choices=sorted(FAMILY_KNOBS))
    ap.add_argument("--epochs", type=int, default=48)
    ap.add_argument("--lr", type=float, default=2e-4)
    ap.add_argument("--root", default=None,
                    help="fixture dir (default: fresh tempdir)")
    ap.add_argument("--eval-split", default="val",
                    help="'samples' = score the train split "
                    "(memorization probe)")
    ap.add_argument("--n-train", type=int, default=128,
                    help="train-split pages (the DETR data-scaling "
                    "probe uses 1024)")
    ap.add_argument("--tpu", action="store_true",
                    help="run on the default backend (TPU if present); "
                    "default pins CPU so matrix runs can proceed while "
                    "the chip is busy with benches")
    args = ap.parse_args()
    if not args.tpu:
        # In this environment the TPU plugin overrides JAX_PLATFORMS, so
        # the platform must be forced via jax.config before backend init
        # (same pattern as tests/conftest.py).
        import jax

        jax.config.update("jax_platforms", "cpu")
    root = args.root or tempfile.mkdtemp(prefix=f"matrix_{args.family}_")
    row = run_family(args.family, root, args.epochs, args.lr,
                     eval_split=args.eval_split, n_train=args.n_train)
    row["eval_split"] = args.eval_split
    row["n_train"] = args.n_train
    print(json.dumps(row), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
