"""LoRA vs full fine-tune: held-out quality + cost, measured.

VERDICT r4 item 4: LoRA's mechanics are tested (tests/test_lora.py) but
the thing LoRA exists for — held-out quality close to full fine-tune at
a fraction of the optimizer state — was never measured. This script
measures it with the workflow LoRA is actually for:

  1. "Pretrain": train the tiny detector on a 128-page synthetic fixture
     drawn with seed 42 (a stand-in for the upstream pretrained model;
     the real microsoft/dit-base bytes are unreachable here — zero
     egress, see ROUND5.md).
  2. Fine-tune on a DIFFERENT 128-page split (seed 0), starting every
     variant from the SAME pretrained weights:
       - full fine-tune (reference recipe, model.py:65-70)
       - LoRA r=8  (adapters on q,v; base frozen)
       - LoRA r=32
  3. Score each on the held-out 32-page split (seed 777) and report
     held-out mAP/AP50, trainable-parameter count, optimizer-state
     bytes, and fine-tune wall img/s.

Run: PYTHONPATH=. python scripts/lora_quality.py  (CPU, ~40 min on the
1-core host). Results recorded in docs/convergence.md; the r=8 floor is
pinned by tests/test_lora.py.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")


def _merge_pretrained(target: dict, pretrained: dict) -> dict:
    """Copy every leaf of ``pretrained`` into ``target`` where the same
    key path exists with the same shape (LoRA adapter leaves, absent from
    the pretrained tree, keep their fresh init — B=0 makes the merged
    model's forward bit-identical to the pretrained one)."""
    import numpy as np

    out = {}
    for k, v in target.items():
        if k in pretrained and isinstance(v, dict):
            out[k] = _merge_pretrained(v, pretrained[k])
        elif (
            k in pretrained
            and getattr(v, "shape", None) == getattr(pretrained[k], "shape", ())
        ):
            out[k] = np.asarray(pretrained[k])
        else:
            out[k] = v
    return out


def _cfg(root: str, split: str, epochs: int, lora_rank: int = 0):
    from layoutdit_tpu.config import LayoutDitConfig
    from layoutdit_tpu.tools.make_fixture import write_fixture_config

    cfg_path = write_fixture_config(root, split=split, epochs=epochs,
                                    batch_size=8, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(cfg_path)))
    cfg.eval_config.eval_input = "val"
    cfg.local_mode = False  # train on the real split, not eval_input
    cfg.train_config.checkpoint_interval = epochs
    cfg.train_config.lr_schedule = "cosine"
    cfg.train_config.learning_rate = 2e-4
    cfg.train_config.warmup_steps = 48
    cfg.detection_model_config.lora_rank = lora_rank
    return cfg


def _train(cfg, pretrained=None):
    from layoutdit_tpu.config import set_layout_dit_config
    from layoutdit_tpu.eval.evaluator import Evaluator
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        if pretrained is not None:
            model.params = _merge_pretrained(model.params, pretrained)
        trainer = Trainer(cfg, model)
        t0 = time.time()
        trainer.train()
        wall = time.time() - t0
        opt_bytes = sum(
            getattr(x, "nbytes", 0)
            for x in __import__("jax").tree_util.tree_leaves(trainer.opt_state)
        )
        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
    finally:
        set_layout_dit_config(None)
    return model.params, metrics, wall, opt_bytes


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=24)
    ap.add_argument("--tpu", action="store_true")
    args = ap.parse_args()
    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from layoutdit_tpu.models.lora import num_trainable
    from layoutdit_tpu.tools.make_fixture import make_fixture

    root = tempfile.mkdtemp(prefix="lora_quality_")
    # pretraining corpus (seed 42), fine-tune corpus (seed 0), held-out val
    make_fixture(root, n_images=128, split="pretrain", seed=42)
    make_fixture(root, n_images=128, split="samples", seed=0)
    make_fixture(root, n_images=32, split="val", seed=777)

    print("== pretraining on seed-42 split ==", file=sys.stderr, flush=True)
    pre_cfg = _cfg(root, "pretrain", args.epochs)
    pretrained, pre_metrics, _, _ = _train(pre_cfg)
    print(f"pretrain mAP on val: {pre_metrics['mAP']:.4f}",
          file=sys.stderr, flush=True)

    rows = []
    for name, rank in (("full_ft", 0), ("lora_r8", 8), ("lora_r32", 32)):
        print(f"== fine-tuning: {name} ==", file=sys.stderr, flush=True)
        cfg = _cfg(root, "samples", args.epochs, lora_rank=rank)
        params, metrics, wall, opt_bytes = _train(cfg, pretrained=pretrained)
        if rank:
            n_train, _ = num_trainable(params)
        else:
            import jax

            n_train = sum(
                x.size for x in jax.tree_util.tree_leaves(params)
            )
        rows.append({
            "variant": name,
            "lora_rank": rank,
            "epochs": args.epochs,
            "mAP": round(metrics["mAP"], 4),
            "AP50": round(metrics["AP50"], 4),
            "trainable_params": int(n_train),
            "opt_state_bytes": int(opt_bytes),
            "finetune_wall_s": round(wall, 1),
            "pretrain_mAP": round(pre_metrics["mAP"], 4),
        })
        print(json.dumps(rows[-1]), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
