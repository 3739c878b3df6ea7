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


def test_skip_nonfinite_updates_guards_params_and_moments():
    """skip_nonfinite_updates=N: a NaN/inf gradient step is a complete
    no-op (params, Adam moments, schedule count all untouched), finite
    steps apply normally, and after N consecutive bad steps the NaNs
    flow through so a diverged run fails loudly."""
    import jax
    import jax.numpy as jnp
    import optax

    from layoutdit_tpu.train.trainer import make_optimizer

    tx = make_optimizer(
        TrainingConfig(skip_nonfinite_updates=2), steps_per_epoch=10
    )
    params = {"w": jnp.ones(3)}
    state = tx.init(params)

    bad = {"w": jnp.asarray([1.0, jnp.nan, 1.0])}
    good = {"w": jnp.full(3, 0.5)}

    upd, state = tx.update(bad, state, params)
    p_after_bad = optax.apply_updates(params, upd)
    np.testing.assert_array_equal(np.asarray(p_after_bad["w"]),
                                  np.asarray(params["w"]))
    assert int(state.notfinite_count) == 1

    upd, state = tx.update(good, state, p_after_bad)
    p_after_good = optax.apply_updates(p_after_bad, upd)
    assert not np.allclose(np.asarray(p_after_good["w"]),
                           np.asarray(params["w"]))
    assert int(state.notfinite_count) == 0  # reset by a finite step

    # exceed the budget: 3rd consecutive bad step propagates non-finite
    for _ in range(3):
        upd, state = tx.update(bad, state, p_after_good)
        p_after_good = optax.apply_updates(p_after_good, upd)
    assert not np.isfinite(np.asarray(p_after_good["w"])).all()


def test_skip_nonfinite_trainer_e2e_checkpoint_roundtrip(tmp_path):
    """The wrapped optimizer state (ApplyIfFiniteState) must survive the
    full train -> checkpoint -> resume path: the checkpoint templates
    are built from the live opt_state, so the extra wrapper layers have
    to round-trip."""
    import json
    import os

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=41)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 1
    cfg.train_config.skip_nonfinite_updates = 3
    set_layout_dit_config(cfg)
    try:
        t = Trainer(cfg, build_model(cfg))
        t.train()
        assert np.isfinite(t.loss_history[-1])
        # observability: the skipped-step counter is surfaced per epoch
        # in metrics.jsonl (0 here — the fixture data is clean)
        assert t.metrics_history[-1]["skipped_nonfinite_steps"] == 0
        t2 = Trainer(cfg, build_model(cfg))
        t2.resume("auto")
        assert t2.epoch == 1
        assert int(t2.opt_state.notfinite_count) == 0
    finally:
        set_layout_dit_config(None)


def test_adam_mu_dtype_bf16_moments():
    """adam_mu_dtype="bfloat16": mu is STORED bf16 (half the first
    moment's HBM stream), nu stays fp32, params stay fp32, and a few
    updates track the fp32-mu trajectory closely (update math still
    runs in fp32 — optax casts mu up inside the update)."""
    import jax
    import jax.numpy as jnp
    import optax

    from layoutdit_tpu.train.trainer import make_optimizer

    params = {
        "w": jnp.linspace(-1.0, 1.0, 64, dtype=jnp.float32).reshape(8, 8),
        "b": jnp.zeros((8,), jnp.float32),
    }
    grads = jax.tree.map(
        lambda p: jnp.cos(p * 3.0) * 0.1, params
    )

    def run(mu_dtype):
        cfg = TrainingConfig(learning_rate=1e-2, adam_mu_dtype=mu_dtype)
        tx = make_optimizer(cfg, steps_per_epoch=10)
        state = tx.init(params)
        p = params
        for _ in range(5):
            updates, state = tx.update(grads, state, p)
            p = optax.apply_updates(p, updates)
        return p, state

    p32, _ = run("float32")
    pbf, state = run("bfloat16")
    # locate the ScaleByAdamState inside the (possibly nested) chain
    adam = [
        s
        for s in jax.tree_util.tree_leaves(
            state, is_leaf=lambda x: hasattr(x, "mu")
        )
        if hasattr(s, "mu")
    ]
    assert adam, "no ScaleByAdamState found in optimizer state"
    mu_leaves = jax.tree.leaves(adam[0].mu)
    nu_leaves = jax.tree.leaves(adam[0].nu)
    assert all(m.dtype == jnp.bfloat16 for m in mu_leaves)
    assert all(n.dtype == jnp.float32 for n in nu_leaves)
    # params themselves stay fp32 and the trajectory tracks fp32-mu
    for a, b in zip(jax.tree.leaves(p32), jax.tree.leaves(pbf)):
        assert b.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_adam_mu_dtype_rejects_unknown():
    import pytest

    from layoutdit_tpu.train.trainer import make_optimizer

    with pytest.raises(ValueError, match="adam_mu_dtype"):
        make_optimizer(
            TrainingConfig(adam_mu_dtype="float16"), steps_per_epoch=1
        )


def test_steps_per_dispatch_auto_resolution():
    """steps_per_dispatch=0 (auto) probes dispatch latency: sub-ms local
    backends resolve to S=1, tunnel-class latency to S=4; explicit
    values pass through (VERDICT r3 item 8)."""
    from layoutdit_tpu.train.trainer import resolve_steps_per_dispatch

    assert resolve_steps_per_dispatch(2) == 2
    assert resolve_steps_per_dispatch(4) == 4
    # CPU backend in the suite: dispatch is tens of microseconds, but the
    # 1-core CI host can stall a wall-clock median under contention — use
    # a generous explicit threshold so only the BRANCH is under test
    assert resolve_steps_per_dispatch(0, threshold_ms=50.0) == 1
    # a tunnel-class threshold makes the same probe pick S=4
    assert resolve_steps_per_dispatch(0, threshold_ms=0.0) == 4
