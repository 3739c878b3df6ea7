"""Mid-epoch preemption resume: the preempt checkpoint records the step
the epoch was cut at, and resume continues from the NEXT step — same
data order (loader pinned to the global epoch), same rng stream (dispatch
keys are position-keyed with fold_in, not split-chained) — instead of
redoing the epoch. The reference restarts from scratch on preemption
(no resume at all, SURVEY.md §5)."""

import json
import os
import signal

import numpy as np
import pytest

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config


class _IndexDataset:
    """Dataset stub: only len() matters for index-order tests."""

    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n


def _loader(n=10, bs=3, seed=7):
    from layoutdit_tpu.data.pipeline import DetectionLoader

    return DetectionLoader(
        _IndexDataset(n), batch_size=bs, shuffle=True, seed=seed,
        device_put=False, use_native=False,
    )


def test_set_epoch_pins_shuffle_order():
    a, b = _loader(), _loader()
    a.set_epoch(4)
    b.set_epoch(4)
    oa = [x.tolist() for x in a._batches_of_indices()]
    ob = [x.tolist() for x in b._batches_of_indices()]
    assert oa == ob
    b.set_epoch(5)
    assert oa != [x.tolist() for x in b._batches_of_indices()]


def test_skip_batches_yields_tail_of_same_order():
    full, tail = _loader(), _loader()
    full.set_epoch(2)
    tail.set_epoch(2)
    all_batches = [x.tolist() for x in full._batches_of_indices()]
    tail.skip_batches(2)
    assert [x.tolist() for x in tail._batches_of_indices()] == all_batches[2:]
    # one-shot: the next epoch starts from the beginning again
    tail.set_epoch(2)
    assert [x.tolist() for x in tail._batches_of_indices()] == all_batches


def test_skip_past_remainder_yields_nothing():
    ld = _loader(n=10, bs=3)  # 3 full batches + remainder of 1 -> 4 total
    ld.set_epoch(0)
    ld.skip_batches(4)
    assert list(ld._batches_of_indices()) == []
    ld.skip_batches(3)
    ld.set_epoch(0)
    assert len(list(ld._batches_of_indices())) == 1  # just the remainder


@pytest.mark.slow
def test_midepoch_resume_matches_uninterrupted_run(tmp_path):
    """SIGTERM after step 3 of 6 (mid epoch 2): resume runs steps 4..6
    only, and the final params are IDENTICAL to an uninterrupted run —
    same batches, same rng keys, same update sequence."""
    import jax

    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=8, split="samples", seed=5)
    write_fixture_config(root, epochs=3, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 100
    cfg.train_config.steps_per_dispatch = 1  # 2 plain steps/epoch
    set_layout_dit_config(cfg)
    try:
        # ---- run A: uninterrupted
        model_a = build_model(cfg)
        Trainer(cfg, model_a).train()

        # ---- run B: preempted after dispatch 3 (epoch 2, step 1)
        model_b = build_model(cfg)
        trainer_b = Trainer(cfg, model_b)
        real_dispatch = trainer_b._dispatch
        calls = {"n": 0}

        def dispatch_then_sigterm(*a, **kw):
            out = real_dispatch(*a, **kw)
            calls["n"] += 1
            if calls["n"] == 3:
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer_b._dispatch = dispatch_then_sigterm
        trainer_b.train()
        assert trainer_b.epoch == 1 and trainer_b._partial_steps == 1

        import glob

        ckpt = glob.glob(os.path.join(
            root, "fixture", "model_checkpoints", "*_preempt.msgpack"
        ))[0]

        # ---- run B': fresh process resumes mid-epoch
        model_b2 = build_model(cfg)
        trainer_b2 = Trainer(cfg, model_b2)
        trainer_b2.resume(ckpt)
        assert trainer_b2.epoch == 1 and trainer_b2._start_step == 1
        assert trainer_b2._total_updates == 3  # 2 (epoch 1) + 1 (partial)
        trainer_b2.train()
        assert trainer_b2.epoch == 3

        # params bitwise-equal: resume replayed the exact remaining steps
        flat_a = jax.tree_util.tree_leaves(model_a.params)
        flat_b = jax.tree_util.tree_leaves(model_b2.params)
        assert len(flat_a) == len(flat_b)
        for la, lb in zip(flat_a, flat_b):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    finally:
        set_layout_dit_config(None)


def test_resume_adopts_checkpoint_steps_per_dispatch(tmp_path):
    """The rng stream depends on the resolved S (multi_step splits rng
    inside its scan), so a resume whose auto probe lands on a different
    steps_per_dispatch than the original run must adopt the checkpointed
    value — otherwise bitwise resume silently breaks."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=8, split="samples", seed=5)
    write_fixture_config(root, epochs=3, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 100
    cfg.train_config.steps_per_dispatch = 2  # original run: S=2
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        real_dispatch = trainer._dispatch
        calls = {"n": 0}

        def dispatch_then_sigterm(*a, **kw):
            out = real_dispatch(*a, **kw)
            calls["n"] += 1
            if calls["n"] == 1:
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer._dispatch = dispatch_then_sigterm
        trainer.train()

        import glob

        ckpt = glob.glob(os.path.join(
            root, "fixture", "model_checkpoints", "*_preempt.msgpack"
        ))[0]

        # restarted process resolves S=1 (different harness conditions)
        cfg.train_config.steps_per_dispatch = 1
        model2 = build_model(cfg)
        trainer2 = Trainer(cfg, model2)
        assert trainer2.dataloader.stack_batches == 1
        trainer2.resume(ckpt)
        assert cfg.train_config.steps_per_dispatch == 2
        assert trainer2.dataloader.stack_batches == 2
    finally:
        set_layout_dit_config(None)


def test_resume_keeps_metrics_history(tmp_path):
    """metrics.jsonl must survive preempt+resume: _save_metrics rewrites
    the whole file per epoch, so resume() restores metrics_history."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=13)
    write_fixture_config(root, epochs=3, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 100
    set_layout_dit_config(cfg)
    try:
        trainer = Trainer(cfg, build_model(cfg))
        real = trainer._dispatch
        calls = {"n": 0}

        def boom(*a, **kw):
            out = real(*a, **kw)
            calls["n"] += 1
            if calls["n"] == 2:  # after epoch 2's only step
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer._dispatch = boom
        trainer.train()
        assert len(trainer.metrics_history) == 2  # epochs 1, 2

        import glob

        ckpt = glob.glob(os.path.join(
            root, "fixture", "model_checkpoints", "*_preempt.msgpack"))[0]
        trainer2 = Trainer(cfg, build_model(cfg))
        trainer2.resume(ckpt)
        assert [m["epoch"] for m in trainer2.metrics_history] == [1, 2]
        trainer2.train()
        epochs = [m["epoch"] for m in trainer2.metrics_history]
        assert epochs[0] == 1 and epochs[-1] == 3
        # the on-disk jsonl covers the WHOLE run, not just post-resume
        recs = [json.loads(l) for l in open(os.path.join(
            root, "fixture", "metrics", "metrics.jsonl"))]
        assert [r["epoch"] for r in recs] == epochs
    finally:
        set_layout_dit_config(None)


def test_find_latest_checkpoint_ordering(tmp_path):
    from layoutdit_tpu.train.checkpoint import find_latest_checkpoint

    assert find_latest_checkpoint(str(tmp_path / "missing")) is None
    d = tmp_path / "ck"
    d.mkdir()
    assert find_latest_checkpoint(str(d)) is None
    for n in ("epoch_2.msgpack", "epoch_10.msgpack", "best.msgpack",
              "best.orbax"):
        (d / n).touch()
    # numeric (not lexicographic) epoch order; rolling best excluded
    assert find_latest_checkpoint(str(d)).endswith("epoch_10.msgpack")
    # a preempt save at the same epoch carries extra mid-epoch steps
    (d / "epoch_10_preempt.msgpack").touch()
    assert find_latest_checkpoint(str(d)).endswith("epoch_10_preempt.msgpack")
    # orbax directories count too
    (d / "epoch_11.orbax").mkdir()
    assert find_latest_checkpoint(str(d)).endswith("epoch_11.orbax")


def test_find_latest_checkpoint_keeps_remote_scheme():
    import fsspec

    from layoutdit_tpu.train.checkpoint import find_latest_checkpoint

    fs = fsspec.filesystem("memory")
    fs.mkdirs("/run/model_checkpoints", exist_ok=True)
    fs.touch("/run/model_checkpoints/epoch_3.msgpack")
    got = find_latest_checkpoint("memory://run/model_checkpoints")
    assert got.startswith("memory://") and got.endswith("epoch_3.msgpack")
    fs.rm("/run", recursive=True)


def test_resume_auto_picks_latest_or_starts_fresh(tmp_path):
    """--resume auto: restart loops pass it unconditionally — first run
    starts fresh (no checkpoint yet), the restarted run picks the newest
    save without knowing its path."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=21)
    write_fixture_config(root, epochs=2, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 1
    set_layout_dit_config(cfg)
    try:
        fresh = Trainer(cfg, build_model(cfg))
        fresh.resume("auto")  # nothing saved yet -> fresh start
        assert fresh.epoch == 0
        fresh.train()

        restarted = Trainer(cfg, build_model(cfg))
        restarted.resume("auto")
        assert restarted.epoch == 2  # newest periodic save (epoch_2)
        assert len(restarted.loss_history) == 2
    finally:
        set_layout_dit_config(None)


def test_preempt_after_completed_epoch_resumes_next_epoch(tmp_path):
    """SIGTERM landing AFTER an epoch's last step-loop check (e.g. during
    the end-of-epoch loss fetch) must checkpoint epoch+1/step 0 — the
    epoch's updates are all applied. Recording the old epoch made resume
    re-train an applied epoch on its own updated params."""
    import jax

    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=31)
    write_fixture_config(root, epochs=2, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 100
    set_layout_dit_config(cfg)
    try:
        model_a = build_model(cfg)
        Trainer(cfg, model_a).train()  # uninterrupted oracle

        model_b = build_model(cfg)
        trainer_b = Trainer(cfg, model_b)
        real_run = trainer_b._run_epoch

        def run_then_sigterm(epoch):
            out = real_run(epoch)
            if epoch == 0:  # after epoch 0 fully completed
                os.kill(os.getpid(), signal.SIGTERM)
            return out

        trainer_b._run_epoch = run_then_sigterm
        trainer_b.train()
        assert trainer_b._partial_steps == 0
        assert trainer_b.epoch == 1  # epoch 0 is DONE

        import glob

        ckpt = glob.glob(os.path.join(
            root, "fixture", "model_checkpoints", "*_preempt.msgpack"))[0]
        assert os.path.basename(ckpt) == "epoch_1_preempt.msgpack"

        model_b2 = build_model(cfg)
        trainer_b2 = Trainer(cfg, model_b2)
        trainer_b2.resume(ckpt)
        assert trainer_b2.epoch == 1 and trainer_b2._start_step == 0
        trainer_b2.train()  # runs exactly epoch 1

        for la, lb in zip(jax.tree_util.tree_leaves(model_a.params),
                          jax.tree_util.tree_leaves(model_b2.params)):
            np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))
    finally:
        set_layout_dit_config(None)


def test_resume_auto_falls_back_past_corrupt_newest(tmp_path):
    """A truncated/garbage newest checkpoint (SIGKILL mid-write predating
    the write-then-rename hardening, half-uploaded object, disk-full) must
    not brick the restart loop: --resume auto falls back to the next-
    newest intact save; when EVERY candidate is unreadable it raises
    rather than silently restarting from scratch."""
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=33)
    write_fixture_config(root, epochs=2, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 1
    set_layout_dit_config(cfg)
    try:
        Trainer(cfg, build_model(cfg)).train()  # epoch_1 + epoch_2 saved
        ckdir = os.path.join(root, "fixture", "model_checkpoints")
        # a corrupt file now outranks them
        with open(os.path.join(ckdir, "epoch_3_preempt.msgpack"), "wb") as f:
            f.write(b"LDTPU1\n\x00truncated-by-a-mid-write-kill")

        restarted = Trainer(cfg, build_model(cfg))
        restarted.resume("auto")
        assert restarted.epoch == 2  # fell back to the intact epoch_2

        for name in os.listdir(ckdir):
            with open(os.path.join(ckdir, name), "wb") as f:
                f.write(b"garbage")
        bricked = Trainer(cfg, build_model(cfg))
        with pytest.raises(RuntimeError, match="unreadable"):
            bricked.resume("auto")
    finally:
        set_layout_dit_config(None)


def test_checkpoint_write_is_tmp_then_rename(tmp_path):
    """No partial file ever sits at the final name: the payload lands at
    <path>.tmp and is renamed; no .tmp residue after success, and an
    orphaned .tmp never matches the resume-candidate pattern."""
    from layoutdit_tpu.train.checkpoint import (
        find_latest_checkpoint,
        load_checkpoint,
        save_checkpoint,
    )

    d = tmp_path / "ck"
    params = {"w": np.arange(4.0)}
    save_checkpoint(str(d / "epoch_1.msgpack"), params, epoch=1)
    assert sorted(os.listdir(d)) == ["epoch_1.msgpack"]  # no .tmp residue
    got = load_checkpoint(str(d / "epoch_1.msgpack"), params)
    np.testing.assert_array_equal(got["params"]["w"], params["w"])
    # an orphaned tmp (crash between write and rename) is inert
    (d / "epoch_9.msgpack.tmp").write_bytes(b"partial")
    assert find_latest_checkpoint(str(d)).endswith("epoch_1.msgpack")
