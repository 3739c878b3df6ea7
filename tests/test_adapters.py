"""Dataset adapter tests (DocLayNet/DocBank transfer, SURVEY §7 step 9)."""

import json

import numpy as np

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
