"""EMA parameter averaging (TrainingConfig.ema_decay).

The EMA buffer is observation-only: it must never perturb the training
trajectory, it follows ema = d*ema + (1-d)*params after each optimizer
update (seeded from the initial params, torch-ModelEmaV2 semantics), it
rides checkpoints next to the optimizer state, and the CLI evaluates it.
The reference has no parameter averaging at all (trainer.py:62-80)."""

import json

import numpy as np

import jax

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.models.model import build_model
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
from layoutdit_tpu.train.trainer import Trainer


def _cfg(tmp_path, ema_decay, steps_per_dispatch=1, batch_size=4, epochs=1):
    cfg = LayoutDitConfig(**json.load(open(tmp_path / "cfg.json")))
    cfg.train_config.ema_decay = ema_decay
    cfg.train_config.steps_per_dispatch = steps_per_dispatch
    cfg.data_loader_config.batch_size = batch_size
    cfg.train_config.num_epochs = epochs
    return cfg


def _leaves(tree):
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(tree)]


def test_ema_decay_one_keeps_initial_and_roundtrips(tmp_path):
    """d=1.0 -> ema = initial params exactly, regardless of training;
    checkpoint save + fresh-trainer resume restores the EMA buffer."""
    make_fixture(str(tmp_path), n_images=8, split="samples", seed=0)
    write_fixture_config(str(tmp_path), epochs=1, batch_size=4, tiny_model=True)
    cfg = _cfg(tmp_path, ema_decay=1.0)
    cfg.train_config.checkpoint_interval = 1
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        initial = _leaves(trainer.ema_params)
        trainer.train()
        for e, i in zip(_leaves(trainer.ema_params), initial):
            np.testing.assert_array_equal(e, i)
        # training moved the real params away from the EMA buffer
        assert any(
            not np.array_equal(p, e)
            for p, e in zip(_leaves(model.params), _leaves(trainer.ema_params))
        )

        ckpt = f"{tmp_path}/fixture/model_checkpoints/epoch_1.msgpack"
        import os

        if not os.path.exists(ckpt):  # sharded path picked orbax instead
            ckpt = f"{tmp_path}/fixture/model_checkpoints/epoch_1.orbax"
        model2 = build_model(cfg)
        trainer2 = Trainer(cfg, model2)
        trainer2.resume(ckpt)
        assert trainer2.epoch == 1
        for a, b in zip(_leaves(trainer2.ema_params), _leaves(trainer.ema_params)):
            np.testing.assert_array_equal(a, b)
    finally:
        set_layout_dit_config(None)


def test_ema_tracks_params_and_does_not_perturb_training(tmp_path):
    """Near-zero decay -> ema converges to the live params (update-order
    check, on the stacked multi-step path); and the training trajectory
    with EMA on matches EMA off (observation-only — tolerance covers
    jit-program fusion differences, same rationale as test_grad_accum)."""
    make_fixture(str(tmp_path), n_images=8, split="samples", seed=0)
    write_fixture_config(str(tmp_path), epochs=1, batch_size=4, tiny_model=True)

    cfg = _cfg(tmp_path, ema_decay=1e-12, steps_per_dispatch=2)
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        for p, e in zip(_leaves(model.params), _leaves(trainer.ema_params)):
            np.testing.assert_allclose(e, p, rtol=1e-5, atol=1e-7)

        cfg_off = _cfg(tmp_path, ema_decay=0.0, steps_per_dispatch=2)
        set_layout_dit_config(cfg_off)
        model_off = build_model(cfg_off)
        trainer_off = Trainer(cfg_off, model_off)
        assert trainer_off.ema_params is None
        trainer_off.train()
        for a, b in zip(_leaves(model.params), _leaves(model_off.params)):
            np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6)
    finally:
        set_layout_dit_config(None)
