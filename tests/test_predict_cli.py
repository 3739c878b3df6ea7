"""Offline prediction CLI (tools/predict.py): checkpoint -> detections
JSON + overlays over the serving engine. New deployment surface — the
reference has no inference entry point (main.py:12-43 trains+evals only)."""

import json
import os

import pytest

from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
from layoutdit_tpu.models.model import build_model
from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config
from layoutdit_tpu.tools.predict import collect_inputs, main


def test_collect_inputs_modes(tmp_path):
    (tmp_path / "a.jpg").write_bytes(b"x")
    (tmp_path / "b.png").write_bytes(b"x")
    (tmp_path / "c.txt").write_bytes(b"x")
    assert collect_inputs(str(tmp_path)) == [
        str(tmp_path / "a.jpg"), str(tmp_path / "b.png")
    ]
    assert collect_inputs(str(tmp_path / "*.jpg")) == [str(tmp_path / "a.jpg")]
    with pytest.raises(FileNotFoundError):
        collect_inputs(str(tmp_path / "*.gif"))


def test_predict_cli_end_to_end(tmp_path):
    root = str(tmp_path)
    make_fixture(root, n_images=6, split="samples", seed=2)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        ckpt = model.save_checkpoint(root, "run", 1)

        out = os.path.join(root, "dets.json")
        viz = os.path.join(root, "viz")
        main([
            "--checkpoint", ckpt,
            "--input", os.path.join(root, "samples"),
            "--output", out,
            "--sizes", "64",
            "--batch-size", "4",
            "--score-thresh", "0.0",
            "--visualize", viz,
        ])
        records = json.load(open(out))
        assert len(records) == 6
        for rec in records:
            assert os.path.exists(rec["file"])
            assert len(rec["boxes"]) == len(rec["scores"]) == len(rec["labels"])
            assert len(rec["label_names"]) == len(rec["labels"])
            for b in rec["boxes"]:
                assert len(b) == 4
            # random-init model, thresh 0: the static detection budget is
            # fully populated -> boxes exist and are in page coordinates
            assert rec["boxes"]
        vizzed = [f for f in os.listdir(viz) if f.endswith(".pred.jpg")]
        assert len(vizzed) == 6
        # label names resolve through the PubLayNet inventory (5 classes)
        assert any(
            n in {"text", "title", "list", "table", "figure"}
            for rec in records for n in rec["label_names"]
        )
    finally:
        set_layout_dit_config(None)


def test_predict_cli_mask_model(tmp_path):
    """with_mask checkpoints: records carry windowed-RLE instance masks
    (the HTTP server's schema) and the overlay path blends them."""
    root = str(tmp_path)
    make_fixture(root, n_images=3, split="samples", seed=3)
    write_fixture_config(root, epochs=1, batch_size=3, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.detection_model_config.with_mask = True
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        assert "mask_head" in model.params
        ckpt = model.save_checkpoint(root, "run", 1)
        out = os.path.join(root, "dets.json")
        viz = os.path.join(root, "viz")
        main([
            "--checkpoint", ckpt,
            "--input", os.path.join(root, "samples"),
            "--output", out, "--sizes", "64", "--batch-size", "3",
            "--score-thresh", "0.0", "--visualize", viz,
        ])
        records = json.load(open(out))
        assert len(records) == 3
        for rec in records:
            assert len(rec["masks"]) == len(rec["boxes"])
            for m in rec["masks"]:
                assert len(m["offset"]) == 2 and len(m["size"]) == 2
                assert sum(m["counts"]) == m["size"][0] * m["size"][1]
        assert len(os.listdir(viz)) == 3
    finally:
        set_layout_dit_config(None)


def test_label_names_inventories():
    from layoutdit_tpu.tools.predict import _label_names

    assert _label_names(5, None)[1] == "text"
    assert _label_names(11, None)[11] == "Title"        # doclaynet by count
    assert _label_names(13, "docbank")[13] == "title"
    assert _label_names(7, None) == {}                  # unknown count
    assert _label_names(7, "docbank") == {}             # mismatched override


def test_predict_cli_from_shards(tmp_path):
    """--shards: pages come straight out of the tar-shard index."""
    from layoutdit_tpu.tools.make_shards import main as make_shards_main

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=7)
    make_shards_main([
        "--images", os.path.join(root, "samples"),
        "--annotations", os.path.join(root, "samples.json"),
        "--out", os.path.join(root, "shards"),
    ])
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        ckpt = model.save_checkpoint(root, "run", 1)
        out = os.path.join(root, "dets.json")
        viz = os.path.join(root, "viz")
        main([
            "--checkpoint", ckpt,
            "--shards", os.path.join(root, "shards"),
            "--output", out, "--sizes", "64", "--batch-size", "4",
            "--score-thresh", "0.0", "--visualize", viz,
        ])
        records = json.load(open(out))
        assert len(records) == 4
        assert all(r["boxes"] for r in records)
        assert len(os.listdir(viz)) == 4
        # member-name filter through --input
        main([
            "--checkpoint", ckpt,
            "--shards", os.path.join(root, "shards"),
            "--input", "*0000*", "--output", out,
            "--sizes", "64", "--batch-size", "4",
        ])
        assert len(json.load(open(out))) == 1
    finally:
        set_layout_dit_config(None)
