"""Non-POSIX filesystem integration tests over fsspec's ``memory://``.

The reference does all artifact I/O against ``gs://layoutdit``
(publay_dataset.py:19, trainer.py:228-255, evaluator.py:288-294); this
rebuild routes the same surface through fsspec. These tests run the
artifact paths against a filesystem that is NOT local disk — catching the
whole ``os.path``-style class of path bugs (VERDICT r2 item 5) without
any network: checkpoint save/load, loss-curve PNG, predictions JSON,
visualization JPEGs, config probe, and checkpoint resume.
"""

import json
import os

import numpy as np
import pytest

import fsspec

from layoutdit_tpu.config import (
    LayoutDitConfig,
    read_config_from_path,
    set_layout_dit_config,
)
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config

BUCKET = "memory://ldtpu-bucket"


def _memfs():
    return fsspec.filesystem("memory")


def test_config_probe_over_memory():
    path = BUCKET + "/cfg/layout_dit_config.json"
    with fsspec.open(path, "w") as f:
        json.dump({"run_name": "from-mem"}, f)
    cfg = read_config_from_path(path)
    assert cfg is not None and cfg.run_name == "from-mem"
    assert read_config_from_path(BUCKET + "/cfg/absent.json") is None


def test_checkpoint_roundtrip_over_memory():
    import jax
    import jax.numpy as jnp

    from layoutdit_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    params = {"w": jnp.arange(12.0).reshape(3, 4), "b": {"x": jnp.ones((5,))}}
    path = BUCKET + "/ckpt/state.msgpack"
    save_checkpoint(path, params, None, epoch=3, extra={"note": "mem"})
    state = load_checkpoint(
        path, jax.tree_util.tree_map(jnp.zeros_like, params)
    )
    np.testing.assert_array_equal(
        np.asarray(state["params"]["w"]), np.asarray(params["w"])
    )
    assert state["epoch"] == 3 and state["extra"]["note"] == "mem"


@pytest.mark.slow
def test_e2e_artifacts_over_memory(tmp_path):
    """Full train -> checkpoint -> score -> visualize -> resume with every
    run artifact written to memory:// (train data stays local)."""
    root = str(tmp_path / "fix")
    os.makedirs(root)
    make_fixture(root, n_images=8, split="samples", seed=2)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.run_name = "memrun"
    # subject is the memory:// IO seam, not dispatch batching: S=1 avoids
    # compiling the multi-step graph on the 1-core host
    cfg.train_config.steps_per_dispatch = 1
    cfg.eval_config.eval_base_path = BUCKET
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

        fs = _memfs()
        ckpt = BUCKET + "/memrun/model_checkpoints/epoch_1.msgpack"
        assert fs.exists("/ldtpu-bucket/memrun/model_checkpoints/epoch_1.msgpack")
        assert fs.exists("/ldtpu-bucket/memrun/loss_history/loss_curve.png")

        evaluator = Evaluator(model=model, layout_dit_config=cfg)
        metrics = evaluator.score()
        assert metrics is not None and "mAP" in metrics
        assert fs.exists("/ldtpu-bucket/memrun/predictions.json")

        evaluator.visualize_preds()
        evaluator.visualize_gt()
        assert fs.exists("/ldtpu-bucket/memrun/visualizations_preds/1.jpg")
        assert fs.exists("/ldtpu-bucket/memrun/visualizations_gt/1.jpg")

        # resume directly from the memory:// checkpoint
        cfg2 = cfg.model_copy(deep=True)
        cfg2.train_config.num_epochs = 2
        model2 = build_model(cfg2)
        trainer2 = Trainer(cfg2, model2)
        trainer2.resume(ckpt)
        assert trainer2.epoch == 1
        trainer2.train()
        assert len(trainer2.loss_history) == 2
    finally:
        set_layout_dit_config(None)
