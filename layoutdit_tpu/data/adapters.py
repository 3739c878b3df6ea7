"""Dataset adapters: PubLayNet, DocLayNet, DocBank (BASELINE.json config
#4 — "DocLayNet / DocBank transfer (new dataset adapters, same
preprocessing pipeline)").

All three run through the same COCO-indexed ``PubLayNetDataset`` +
``DetectionLoader`` pipeline; an adapter supplies the class inventory (and
for DocBank, a one-time conversion of its token-level txt annotations into
a COCO JSON).
"""

from __future__ import annotations

import dataclasses
import json
import os

from layoutdit_tpu.data.dataset import PubLayNetDataset
from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


@dataclasses.dataclass(frozen=True)
class DatasetSpec:
    name: str
    num_classes: int
    class_names: tuple[str, ...]


PUBLAYNET = DatasetSpec(
    "publaynet", 5, ("text", "title", "list", "table", "figure")
)

DOCLAYNET = DatasetSpec(
    "doclaynet", 11,
    ("Caption", "Footnote", "Formula", "List-item", "Page-footer",
     "Page-header", "Picture", "Section-header", "Table", "Text", "Title"),
)

DOCBANK = DatasetSpec(
    "docbank", 13,
    ("abstract", "author", "caption", "date", "equation", "figure",
     "footer", "list", "paragraph", "reference", "section", "table",
     "title"),
)

SPECS = {s.name: s for s in (PUBLAYNET, DOCLAYNET, DOCBANK)}


def apply_dataset_spec(config, spec_name: str):
    """Point a LayoutDitConfig at a different dataset family: sets
    num_classes; data paths stay config-driven."""
    spec = SPECS[spec_name]
    config.detection_model_config.num_classes = spec.num_classes
    return config


def load_coco_dataset(images_root_dir: str, annotations_json_path: str) -> PubLayNetDataset:
    """DocLayNet ships COCO JSONs; PubLayNet too — same loader."""
    return PubLayNetDataset(images_root_dir, annotations_json_path)


def convert_docbank_to_coco(
    txt_dir: str,
    images_dir: str,
    out_json_path: str,
    image_size: tuple[int, int] = (1000, 1000),
) -> str:
    """Convert DocBank token-level annotations to a COCO detection JSON.

    DocBank txt schema (one token per line, tab-separated):
      token x0 y0 x1 y1 R G B fontname label
    with coordinates normalized to a 1000x1000 page. Each token bbox
    becomes one annotation of its label's category (the standard
    token-bbox detection protocol for DocBank).
    """
    import fsspec

    cat_to_id = {name: i + 1 for i, name in enumerate(DOCBANK.class_names)}
    images, annotations = [], []
    ann_id = 1
    fs, _, _ = fsspec.get_fs_token_paths(txt_dir)
    txt_files = sorted(p for p in fs.ls(txt_dir) if p.endswith(".txt"))
    for img_id, txt_path in enumerate(txt_files, start=1):
        base = os.path.splitext(os.path.basename(txt_path))[0]
        file_name = base + "_ori.jpg"
        images.append({
            "id": img_id, "file_name": file_name,
            "width": image_size[1], "height": image_size[0],
        })
        with fs.open(txt_path, "r") as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) < 10:
                    continue
                _, x0, y0, x1, y1 = parts[:5]
                label = parts[9]
                if label not in cat_to_id:
                    continue
                x0, y0, x1, y1 = float(x0), float(y0), float(x1), float(y1)
                w, h = x1 - x0, y1 - y0
                if w <= 0 or h <= 0:
                    continue
                annotations.append({
                    "id": ann_id, "image_id": img_id,
                    "category_id": cat_to_id[label],
                    "bbox": [x0, y0, w, h], "area": w * h, "iscrowd": 0,
                })
                ann_id += 1
    coco = {
        "images": images,
        "annotations": annotations,
        "categories": [
            {"id": i + 1, "name": n} for i, n in enumerate(DOCBANK.class_names)
        ],
    }
    with fsspec.open(out_json_path, "w", auto_mkdir=True) as f:
        json.dump(coco, f)
    logger.info(
        "DocBank -> COCO: %d images, %d annotations -> %s",
        len(images), len(annotations), out_json_path,
    )
    return out_json_path
