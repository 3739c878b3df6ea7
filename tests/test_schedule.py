"""LR schedule options: reference StepLR, cosine decay, linear warmup.

The reference offers exactly AdamW + StepLR (trainer.py:62-76); cosine
and warmup are standard fine-tuning additions, both off by default so
the default recipe stays reference-exact."""

import numpy as np

from layoutdit_tpu.config.constructs import TrainingConfig
from layoutdit_tpu.train.trainer import make_lr_schedule


def test_step_schedule_reference_semantics():
    cfg = TrainingConfig(
        learning_rate=0.1, step_size=2, gamma=0.1, num_epochs=6
    )
    lr = make_lr_schedule(cfg, steps_per_epoch=10)
    # StepLR: decay by gamma every `step_size` EPOCHS (10 updates each)
    assert float(lr(0)) == 0.1
    assert float(lr(19)) == 0.1              # still epoch 1
    np.testing.assert_allclose(float(lr(20)), 0.01)   # epoch 2 -> decayed
    np.testing.assert_allclose(float(lr(45)), 0.001)  # epoch 4


def test_cosine_schedule():
    cfg = TrainingConfig(
        learning_rate=0.1, lr_schedule="cosine", num_epochs=10
    )
    lr = make_lr_schedule(cfg, steps_per_epoch=10)  # total = 100 updates
    np.testing.assert_allclose(float(lr(0)), 0.1)
    np.testing.assert_allclose(float(lr(50)), 0.05, rtol=1e-6)
    np.testing.assert_allclose(float(lr(100)), 0.0, atol=1e-9)
    # clamped past the end, never negative
    np.testing.assert_allclose(float(lr(150)), 0.0, atol=1e-9)
    # monotone decreasing
    vals = [float(lr(c)) for c in range(0, 101, 10)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))


def test_warmup_composes_with_either_schedule():
    for family in ("step", "cosine"):
        cfg = TrainingConfig(
            learning_rate=0.1, lr_schedule=family, warmup_steps=10,
            num_epochs=10,
        )
        lr = make_lr_schedule(cfg, steps_per_epoch=100)
        # rtol covers the cosine base's own (tiny) decay inside the ramp
        np.testing.assert_allclose(float(lr(0)), 0.1 * (1 / 10), rtol=1e-4)
        np.testing.assert_allclose(float(lr(4)), 0.1 * (5 / 10), rtol=1e-4)
        # warmup complete at count 9 (update 10): full base rate
        np.testing.assert_allclose(float(lr(9)), 0.1, rtol=1e-3)
        vals = [float(lr(c)) for c in range(10)]
        assert all(a < b for a, b in zip(vals, vals[1:]))
