"""Multi-epoch convergence demonstration on the synthetic fixture
(VERDICT r3 next-round #2).

A 120-step overfit test cannot see matcher balance, LR schedule, EMA or
augmentation regressions over a real multi-epoch run. This test is the
closest zero-egress proxy for the reference's actual job
(/root/reference/src/layoutdit/training/trainer.py:204-215 ->
evaluator.py:266-286): fine-tune the tiny detector for 48 epochs through
the PRODUCTION path (config -> build_model -> Trainer -> Evaluator) on a
128-page synthetic train split and score on a 32-page HELD-OUT split —
generalization, not memorization.

Bar calibration (2026-08-19, seed-pinned recipe below, single CPU
device): held-out mAP 0.586 / AP50 0.849; the same recipe at 32 epochs
reaches 0.431/0.714 and the default StepLR recipe only 0.252/0.537, so
the asserted floor (0.45/0.70) sits ~25% under the measured value —
loose enough for cross-platform float drift (the suite runs this on an
8-device virtual mesh), tight enough that a matcher/sampler/schedule
regression that costs a quarter of the quality fails. The committed
learning curve lives in docs/convergence.md.
"""

import json
import os

import numpy as np
import pytest

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config


@pytest.mark.slow
@pytest.mark.parametrize("family,floor_map,floor_ap50", [
    # Floors ~25% under the values measured by scripts/convergence_matrix.py
    # (docs/convergence.md "Family matrix", 2026-08-20: retinanet
    # 0.296/0.608, fcos 0.755/0.980) — same margin policy as the
    # flagship floor below.
    ("retinanet", 0.22, 0.45),
    ("fcos", 0.55, 0.75),
])
def test_family_multiepoch_convergence(tmp_path, family, floor_map,
                                       floor_ap50):
    """Held-out convergence floors for the single-stage families
    (VERDICT r4 item 2): overfit tests prove gradients flow; this proves
    the family LEARNS — matcher balance, assignment, schedule — on the
    same recipe and held-out split as the flagship."""
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), os.pardir,
                                    "scripts"))
    from convergence_matrix import run_family

    row = run_family(family, str(tmp_path), epochs=48, lr=2e-4)
    assert row["last4_loss"] < 0.6 * row["first4_loss"], row
    assert row["mAP"] >= floor_map, row
    assert row["AP50"] >= floor_ap50, row


@pytest.mark.slow
def test_synthetic_fixture_multiepoch_convergence(tmp_path):
    root = str(tmp_path)
    make_fixture(root, n_images=128, split="samples", seed=0)
    make_fixture(root, n_images=32, split="val", seed=777)
    cfg_path = write_fixture_config(root, split="samples", epochs=48,
                                    batch_size=8, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(cfg_path)))
    cfg.eval_config.eval_input = "val"
    # write_fixture_config sets local_mode=True, which reroutes TRAINING
    # to eval_input (the reference's sample-split semantics) — here that
    # would silently train on the 32-page val split and measure
    # memorization. Train on the real 128-page split.
    cfg.local_mode = False
    cfg.train_config.checkpoint_interval = 48
    # the calibrated fine-tune recipe (cosine decay + brief warmup; the
    # default StepLR step_size=10 decays 10x too early for a 48-epoch run)
    cfg.train_config.lr_schedule = "cosine"
    cfg.train_config.learning_rate = 2e-4
    cfg.train_config.warmup_steps = 48
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()

        losses = trainer.loss_history
        assert len(losses) == 48
        assert np.isfinite(losses).all()
        # the optimization made real progress, not just one lucky epoch
        assert np.mean(losses[-4:]) < 0.4 * np.mean(losses[:4]), losses

        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
        assert metrics is not None
        assert metrics["mAP"] >= 0.45, metrics
        assert metrics["AP50"] >= 0.70, metrics
        # every class is actually being detected (the fixture's hardest
        # class, table, converges last — a matcher/sampler regression
        # typically zeroes a class long before it dents the mean)
        for name in ("text", "title", "list", "figure"):
            assert metrics[f"AP50-{name}"] >= 0.3, metrics
    finally:
        set_layout_dit_config(None)
