"""End-to-end CLI pipeline test: config -> train -> checkpoint -> score ->
visualize -> resume, on the synthetic fixture with a tiny model
(the full reference surface of main.py:12-43 in one pass)."""

import json
import os

import numpy as np
import pytest

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("e2e"))
    make_fixture(root, n_images=8, split="samples", seed=1)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    return root


@pytest.mark.slow
def test_full_pipeline(fixture_dir):
    cfg = LayoutDitConfig(**json.load(open(os.path.join(fixture_dir, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        assert len(trainer.loss_history) == 1
        assert np.isfinite(trainer.loss_history[0])

        run_dir = os.path.join(fixture_dir, "fixture")
        ckpt = os.path.join(run_dir, "model_checkpoints", "epoch_1.msgpack")
        assert os.path.exists(ckpt)
        assert os.path.exists(os.path.join(run_dir, "loss_history", "loss_curve.png"))
        with open(os.path.join(run_dir, "metrics", "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert len(recs) == 1 and recs[0]["epoch"] == 1
        assert recs[0]["loss"] == trainer.loss_history[0]
        assert recs[0]["learning_rate"] > 0 and recs[0]["images_per_sec"] > 0

        evaluator = Evaluator(model=model, layout_dit_config=cfg)
        metrics = evaluator.score()
        assert metrics is not None and set(metrics) >= {"mAP", "AP50", "AR100"}
        assert os.path.exists(os.path.join(run_dir, "predictions.json"))

        evaluator.visualize_preds()
        evaluator.visualize_gt()
        assert os.path.exists(os.path.join(run_dir, "visualizations_gt", "1.jpg"))
        assert os.path.exists(os.path.join(run_dir, "visualizations_preds", "1.jpg"))

        # true resume: params + optimizer + epoch
        cfg2 = cfg.model_copy(deep=True)
        cfg2.train_config.num_epochs = 2
        model2 = build_model(cfg2)
        trainer2 = Trainer(cfg2, model2)
        trainer2.resume(ckpt)
        assert trainer2.epoch == 1
        assert trainer2.loss_history  # restored
        trainer2.train()
        assert len(trainer2.loss_history) == 2
    finally:
        set_layout_dit_config(None)


@pytest.mark.slow
def test_multi_step_dispatch(fixture_dir):
    """steps_per_dispatch > 1: scan over stacked micro-batches in one
    device call (amortizes dispatch latency on remote backends)."""
    cfg = LayoutDitConfig(**json.load(open(os.path.join(fixture_dir, "cfg.json"))))
    cfg.train_config.steps_per_dispatch = 2
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()  # 8 imgs / bs4 -> 2 steps -> one multi-dispatch
        assert len(trainer.loss_history) == 1
        assert np.isfinite(trainer.loss_history[0])
    finally:
        set_layout_dit_config(None)


@pytest.mark.slow
def test_preemption_checkpoints_and_resumes(tmp_path):
    """SIGTERM mid-training: the guard finishes the in-flight dispatch,
    writes an out-of-cadence *_preempt checkpoint with the COMPLETED
    epoch count, and train() returns cleanly; resume finishes the run."""
    import glob
    import signal

    root = str(tmp_path)
    make_fixture(root, n_images=8, split="samples", seed=3)
    write_fixture_config(root, epochs=3, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 100  # no cadence saves
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)

        # Deliver SIGTERM to ourselves from inside the hot loop: the
        # handler runs at the next bytecode boundary in this (main)
        # thread — deterministic, no timers.
        real_dispatch = trainer._dispatch
        calls = {"n": 0}

        def dispatch_then_sigterm(*a, **kw):
            out = real_dispatch(*a, **kw)
            calls["n"] += 1
            if calls["n"] == 3:  # mid-epoch-2 (2 steps/epoch)
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer._dispatch = dispatch_then_sigterm
        trainer.train()  # returns instead of dying

        assert trainer.epoch == 1  # epoch 2 was partial
        ckpts = glob.glob(
            os.path.join(root, "fixture", "model_checkpoints", "*_preempt.*")
        )
        assert len(ckpts) == 1 and "epoch_1_preempt" in ckpts[0]
        # the handler was restored on exit from the guard
        assert signal.getsignal(signal.SIGTERM) in (
            signal.SIG_DFL, signal.default_int_handler,
        ) or not callable(signal.getsignal(signal.SIGTERM))

        # true resume from the preempt checkpoint redoes epoch 2 + runs 3
        model2 = build_model(cfg)
        trainer2 = Trainer(cfg, model2)
        trainer2.resume(ckpts[0])
        assert trainer2.epoch == 1
        trainer2.train()
        assert trainer2.epoch == 3
        assert all(np.isfinite(l) for l in trainer2.loss_history)
    finally:
        set_layout_dit_config(None)


def test_checkpoint_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from layoutdit_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = {"a": jnp.arange(6.0).reshape(2, 3), "b": {"c": jnp.ones((4,))}}
    opt = {"mu": jnp.zeros((2, 3))}
    path = str(tmp_path / "ck" / "state.msgpack")
    save_checkpoint(path, params, opt, epoch=7, extra={"loss_history": [1.0, 0.5]})

    zero = jax.tree_util.tree_map(jnp.zeros_like, params)
    state = load_checkpoint(path, zero, jax.tree_util.tree_map(jnp.ones_like, opt))
    np.testing.assert_array_equal(np.asarray(state["params"]["a"]), np.asarray(params["a"]))
    np.testing.assert_array_equal(np.asarray(state["opt_state"]["mu"]), 0)
    assert state["epoch"] == 7
    assert state["extra"]["loss_history"] == [1.0, 0.5]


def test_async_checkpoint_writer_matches_sync(tmp_path):
    """Background write produces a byte-compatible checkpoint, and the
    snapshot is a real copy (later in-place mutation of the source arrays
    cannot corrupt the pending write)."""
    import jax.numpy as jnp
    import numpy as np

    from layoutdit_tpu.train.checkpoint import (
        AsyncCheckpointWriter,
        load_checkpoint,
        save_checkpoint,
    )

    params = {"w": np.arange(12.0).reshape(3, 4), "b": {"x": np.ones(5)}}
    opt = {"mu": np.zeros((3, 4))}
    sync_path = str(tmp_path / "sync.msgpack")
    async_path = str(tmp_path / "async.msgpack")
    save_checkpoint(sync_path, params, opt, epoch=3, extra={"k": 1})

    w = AsyncCheckpointWriter()
    try:
        w.save(async_path, params, opt, epoch=3, extra={"k": 1})
        params["w"] += 100.0  # mutate AFTER submit — must not leak in
        w.wait()
    finally:
        w.close()

    zero = {"w": np.zeros((3, 4)), "b": {"x": np.zeros(5)}}
    got = load_checkpoint(async_path, zero, {"mu": np.ones((3, 4))})
    ref = load_checkpoint(sync_path, zero, {"mu": np.ones((3, 4))})
    np.testing.assert_array_equal(
        np.asarray(got["params"]["w"]), np.asarray(ref["params"]["w"])
    )
    assert got["epoch"] == 3 and got["extra"] == {"k": 1}
    assert float(np.asarray(got["params"]["w"]).max()) < 100  # no mutation leak
    del jnp


def test_async_checkpoint_writer_surfaces_errors(tmp_path):
    from layoutdit_tpu.train.checkpoint import AsyncCheckpointWriter

    blocker = tmp_path / "file"
    blocker.write_text("x")
    w = AsyncCheckpointWriter()
    try:
        # path nests under an existing FILE -> the worker's open() fails
        w.save(str(blocker / "nested" / "ck.msgpack"), {"a": np.ones(2)})
        with pytest.raises(OSError):
            w.wait()
    finally:
        w.close()


def test_checkpoint_rejects_garbage(tmp_path):
    from layoutdit_tpu.train.checkpoint import load_checkpoint

    p = tmp_path / "bad.msgpack"
    p.write_bytes(b"not a checkpoint")
    with pytest.raises(ValueError):
        load_checkpoint(str(p), params_template={})


def test_mid_training_eval_tracks_best(tmp_path):
    """TrainingConfig.eval_interval: COCO eval every N epochs, mAP in the
    metrics records, rolling best checkpoint at model_checkpoints/best.*."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=8, split="samples", seed=1)
    write_fixture_config(root, epochs=2, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.eval_interval = 1
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        maps = [rec.get("mAP") for rec in trainer.metrics_history]
        assert len(maps) == 2 and all(m is not None for m in maps)
        assert trainer.best_checkpoint_path is not None
        assert os.path.exists(trainer.best_checkpoint_path)
        assert "best" in os.path.basename(trainer.best_checkpoint_path)
        assert trainer.best_map == max(maps)
        # metrics.jsonl carries the mAP column too
        with open(os.path.join(root, "fixture", "metrics", "metrics.jsonl")) as f:
            recs = [json.loads(line) for line in f]
        assert [r.get("mAP") for r in recs] == maps
    finally:
        set_layout_dit_config(None)


def test_early_stopping_on_map_plateau(tmp_path):
    """early_stop_patience: training halts after N consecutive mid-evals
    without a new best mAP; the best checkpoint (written at the peak)
    survives, and the epochs a fixed num_epochs would waste never run."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=9)
    write_fixture_config(root, epochs=10, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.eval_interval = 1
    cfg.train_config.early_stop_patience = 2
    cfg.train_config.checkpoint_interval = 100
    set_layout_dit_config(cfg)
    try:
        trainer = Trainer(cfg, build_model(cfg))

        class _PlateauEval:
            """mAP peaks on eval 2, then plateaus below it."""

            seq = iter([0.30, 0.50, 0.40, 0.45, 0.49, 0.49, 0.49])

            def score(self):
                return {"mAP": next(self.seq)}

        trainer._evaluator = _PlateauEval()
        trainer.train()
        # peak at epoch 2, two non-improving evals (epochs 3, 4) -> stop
        assert trainer.epoch == 4
        assert trainer.best_map == 0.50
        assert trainer.best_checkpoint_path.endswith("best.msgpack")
        assert os.path.exists(trainer.best_checkpoint_path)
        assert len(trainer.loss_history) == 4  # epochs 5..10 never ran
    finally:
        set_layout_dit_config(None)


def test_early_stop_state_survives_resume(tmp_path):
    """best_map / best_checkpoint_path / patience clock ride checkpoints:
    a preemption-resume must not regress best.* (a worse post-resume eval
    would otherwise count as a 'new best' from -inf and overwrite the
    deployable weights) nor restart the early-stop counter."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=13)
    write_fixture_config(root, epochs=2, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.eval_interval = 1
    cfg.train_config.checkpoint_interval = 1
    set_layout_dit_config(cfg)
    try:
        trainer = Trainer(cfg, build_model(cfg))

        class _Eval:
            seq = iter([0.50, 0.40])  # best at epoch 1, worse at epoch 2

            def score(self):
                return {"mAP": next(self.seq)}

        trainer._evaluator = _Eval()
        trainer.train()
        assert trainer.best_map == 0.50
        assert trainer._evals_since_best == 1
        best_path = trainer.best_checkpoint_path

        t2 = Trainer(cfg, build_model(cfg))
        t2.resume("auto")
        assert t2.best_map == 0.50
        assert t2.best_checkpoint_path == best_path
        assert t2._evals_since_best == 1

        # a worse post-resume eval must NOT overwrite best.*
        class _Worse:
            def score(self):
                return {"mAP": 0.45}

        t2._evaluator = _Worse()
        t2._mid_eval(2)
        assert t2.best_map == 0.50
        assert t2.best_checkpoint_path == best_path
        assert t2._evals_since_best == 2
    finally:
        set_layout_dit_config(None)


def test_nan_evals_do_not_tick_patience_before_first_best(tmp_path):
    """Mid-evals with no predictions (score() -> None, mAP NaN) must not
    count toward early-stop patience until a finite best exists — a run
    must never halt at best=-inf with no best.* checkpoint written."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=14)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.eval_interval = 1
    cfg.train_config.early_stop_patience = 2
    set_layout_dit_config(cfg)
    try:
        trainer = Trainer(cfg, build_model(cfg))

        class _Seq:
            def __init__(self, vals):
                self.vals = iter(vals)

            def score(self):
                v = next(self.vals)
                return None if v is None else {"mAP": v}

        trainer._evaluator = _Seq([None, None])
        trainer._mid_eval(0)
        trainer._mid_eval(1)
        assert trainer._evals_since_best == 0  # no finite best yet
        assert trainer.best_checkpoint_path is None

        trainer._evaluator = _Seq([0.3, None])
        trainer._mid_eval(2)          # first finite best
        assert trainer.best_map == 0.3
        trainer._mid_eval(3)          # NaN after a best DOES tick
        assert trainer._evals_since_best == 1
    finally:
        set_layout_dit_config(None)
