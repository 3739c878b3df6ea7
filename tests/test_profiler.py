"""Profiler tracing path (reference trainer.py:82-146, 232-257 — the
torch.profiler + GCS-upload machinery, reimplemented with jax.profiler)."""

import glob
import json
import os

import numpy as np


def test_enable_profile_writes_and_uploads_traces(tmp_path):
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
    from layoutdit_tpu.train.trainer import Trainer

    make_fixture(str(tmp_path), n_images=4, split="samples", seed=0)
    write_fixture_config(str(tmp_path), epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(tmp_path / "cfg.json")))
    cfg.train_config.enable_profile = True
    cfg.train_config.trace_log_dir = str(tmp_path / "traces")
    # subject is the profiler trace path, not dispatch batching
    cfg.train_config.steps_per_dispatch = 1
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        # local traces written by jax.profiler
        local = glob.glob(str(tmp_path / "traces" / "**" / "*"), recursive=True)
        assert any(os.path.isfile(p) for p in local), local
        # "uploaded" copies (fsspec local target here) mirror the tree
        uploaded = glob.glob(
            str(tmp_path / "fixture" / "profiler" / "**" / "*"), recursive=True
        )
        assert any(os.path.isfile(p) for p in uploaded), uploaded
        assert np.isfinite(trainer.loss_history[0])
    finally:
        set_layout_dit_config(None)
