"""Dataset adapter tests (DocLayNet/DocBank transfer, SURVEY §7 step 9)."""

import json

import numpy as np
import pytest

from layoutdit_tpu.config.constructs import LayoutDitConfig
from layoutdit_tpu.data.adapters import (
    DOCBANK,
    DOCLAYNET,
    apply_dataset_spec,
    convert_docbank_to_coco,
    load_coco_dataset,
)


def test_apply_doclaynet_spec():
    cfg = LayoutDitConfig()
    apply_dataset_spec(cfg, "doclaynet")
    assert cfg.detection_model_config.num_classes == 11


def test_docbank_conversion_and_loading(tmp_path):
    txt_dir = tmp_path / "txt"
    img_dir = tmp_path / "img"
    txt_dir.mkdir(); img_dir.mkdir()
    lines = [
        "hello\t100\t50\t200\t80\t0\t0\t0\tArial\tparagraph",
        "world\t100\t90\t220\t120\t0\t0\t0\tArial\ttitle",
        "bad\t10\t10\t10\t30\t0\t0\t0\tArial\tparagraph",  # zero width
        "skip\t10\t10\t30\t30\t0\t0\t0\tArial\tunknown_label",
    ]
    (txt_dir / "page_0.txt").write_text("\n".join(lines))
    from PIL import Image

    Image.new("RGB", (1000, 1000), "white").save(img_dir / "page_0_ori.jpg")

    out = convert_docbank_to_coco(str(txt_dir), str(img_dir),
                                  str(tmp_path / "docbank.json"))
    coco = json.loads(open(out).read())
    assert len(coco["images"]) == 1
    assert len(coco["annotations"]) == 2  # degenerate + unknown dropped
    assert len(coco["categories"]) == DOCBANK.num_classes

    ds = load_coco_dataset(str(img_dir), out)
    image, target = ds[0]
    assert image.shape == (3, 1000, 1000)
    assert len(target["boxes"]) == 2
    # paragraph id=9, title id=13 per DOCBANK class order
    para_id = DOCBANK.class_names.index("paragraph") + 1
    title_id = DOCBANK.class_names.index("title") + 1
    assert set(np.asarray(target["labels"]).tolist()) == {
        ds.cat_id_to_label[para_id], ds.cat_id_to_label[title_id]
    }


@pytest.mark.slow
def test_transfer_finetune_e2e_doclaynet_shaped(tmp_path):
    """11-class transfer fine-tune end to end (VERDICT r2 item 8 /
    BASELINE.json config #4): DocLayNet-shaped synthetic fixture ->
    apply_dataset_spec -> 1-epoch train -> score. Proves the class-count
    path (num_classes=11 heads, 11-way eval) beyond unit conversion."""
    import jax  # noqa: F401  (backend must be CPU via conftest)

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.data.adapters import apply_dataset_spec
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config

    root = str(tmp_path / "dln")
    make_fixture(root, n_images=6, split="samples", seed=5, num_classes=11)
    write_fixture_config(root, epochs=1, batch_size=3, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(root + "/cfg.json")))
    cfg.run_name = "dln"
    # subject is the transfer-learning class plumbing, not dispatch
    # batching: S=1 avoids the extra multi-step compile
    cfg.train_config.steps_per_dispatch = 1
    apply_dataset_spec(cfg, "doclaynet")
    assert cfg.detection_model_config.num_classes == 11
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        # heads must be sized for 11 classes + background
        cls_b = model.params["box_predictor"]["cls"]["bias"]
        assert cls_b.shape == (12,)
        trainer = Trainer(cfg, model)
        trainer.train()
        assert np.isfinite(trainer.loss_history[0])

        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
        assert metrics is not None and np.isfinite(metrics["mAP"])
    finally:
        set_layout_dit_config(None)
