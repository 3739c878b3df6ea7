"""Checkpoint retention (train_config.keep_checkpoints): newest-N
periodic saves kept, best/preempt untouched. The reference keeps every
checkpoint forever (model.py:90-121)."""

import json
import os

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
from layoutdit_tpu.train.checkpoint import prune_checkpoints


def test_prune_unit(tmp_path):
    root = str(tmp_path / "ck")
    os.makedirs(root)
    for n in ("epoch_1.msgpack", "epoch_2.msgpack", "epoch_3.msgpack",
              "epoch_1_preempt.msgpack", "best.msgpack"):
        open(os.path.join(root, n), "w").write("x")
    # orbax checkpoints are directories with a sidecar
    os.makedirs(os.path.join(root, "epoch_0.orbax"))
    open(os.path.join(root, "epoch_0.orbax.meta.json"), "w").write("{}")

    deleted = prune_checkpoints(root, keep=2, current_epoch=4)
    # epoch 4 is in-flight: keep set = {4, 3} -> 0, 1, 2 pruned
    assert sorted(os.path.basename(d) for d in deleted) == [
        "epoch_0.orbax", "epoch_1.msgpack", "epoch_2.msgpack"
    ]
    left = sorted(os.listdir(root))
    assert left == ["best.msgpack", "epoch_1_preempt.msgpack",
                    "epoch_3.msgpack"]

    assert prune_checkpoints(root, keep=0, current_epoch=9) == []  # off
    assert prune_checkpoints(str(tmp_path / "missing"), 2, 1) == []


def test_trainer_retention_e2e(tmp_path):
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=6)
    write_fixture_config(root, epochs=4, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.train_config.checkpoint_interval = 1
    cfg.train_config.keep_checkpoints = 2
    cfg.train_config.async_checkpoint = False  # deterministic listing
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        Trainer(cfg, model).train()
        ck = os.path.join(root, "fixture", "model_checkpoints")
        epochs = sorted(f for f in os.listdir(ck) if f.startswith("epoch_"))
        assert epochs == ["epoch_3.msgpack", "epoch_4.msgpack"]
    finally:
        set_layout_dit_config(None)
