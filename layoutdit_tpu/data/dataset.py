"""PubLayNet (COCO-format) dataset — API parity with the reference.

Mirrors /root/reference/src/layoutdit/data/publay_dataset.py:16-81:
  * parses the COCO annotations JSON once into ``image_info`` /
    ``annotations`` / ``cat_id_to_label`` indices (:29-39),
  * ``__getitem__`` opens the image via fsspec, decodes to RGB float
    CHW in [0, 1], converts COCO ``[x, y, w, h]`` -> ``[x1, y1, x2, y2]``,
    remaps category ids to 1..N, drops degenerate boxes (:44-74),
  * exposes the raw ``coco_data`` for the evaluator (:25),
with numpy instead of torch tensors (the TPU pipeline consumes numpy and
ships batches to the device itself).
"""

from __future__ import annotations

import json
import os
from typing import Callable

import numpy as np

from layoutdit_tpu.log import get_logger
from layoutdit_tpu.utils.paths import join_path
from layoutdit_tpu.utils.retry import retry_io

logger = get_logger(__name__)

# (image [3, H, W] float32 in [0,1], target dict)
PUBLAY_NET_DATASET_ITEM_TYPE = tuple[np.ndarray, dict]


class PubLayNetDataset:
    def __init__(self, images_root_dir: str, annotations_json_path: str):
        import fsspec

        # seam for local-fs / GCS duality, as in the reference (:19)
        self.fs_open: Callable = fsspec.open

        @retry_io
        def _read_annotations():
            # transient GCS 5xx on the one up-front JSON read aborts the
            # whole run without this (image reads were already retried)
            with self.fs_open(annotations_json_path, "r") as f:
                return json.load(f)

        coco_data = _read_annotations()

        # kept for the Evaluator (reference :25)
        self.coco_data = coco_data
        self.images_root_dir = images_root_dir

        self.image_info = {img["id"]: img for img in coco_data["images"]}
        self.annotations: dict[int, list] = {}
        for ann in coco_data["annotations"]:
            self.annotations.setdefault(ann["image_id"], []).append(ann)
        self.ids = list(self.image_info.keys())
        self.cat_id_to_label = {
            cat["id"]: i for i, cat in enumerate(coco_data["categories"], start=1)
        }

    def __len__(self) -> int:
        return len(self.ids)

    @retry_io
    def load_image_bytes(self, img_id) -> bytes:
        """Raw encoded image bytes (consumed by the native C++ decoder).
        Retries transient storage errors (GCS 5xx etc.)."""
        file_name = self.image_info[img_id]["file_name"]
        img_path = join_path(self.images_root_dir, file_name)
        with self.fs_open(img_path, "rb") as f:
            return f.read()

    @retry_io
    def load_image(self, img_id) -> np.ndarray:
        """Decode one image -> [3, H, W] float32 in [0, 1]."""
        from PIL import Image

        file_name = self.image_info[img_id]["file_name"]
        img_path = join_path(self.images_root_dir, file_name)
        with self.fs_open(img_path, "rb") as f:
            image = Image.open(f).convert("RGB")
        arr = np.asarray(image, dtype=np.float32) / 255.0  # [H, W, 3]
        return arr.transpose(2, 0, 1)

    def load_target(self, img_id) -> dict:
        """Boxes/labels for one image (degenerate boxes dropped)."""
        anns = self.annotations.get(img_id, [])
        boxes, labels = [], []
        for ann in anns:
            x, y, w, h = ann["bbox"]
            boxes.append([x, y, x + w, y + h])
            labels.append(self.cat_id_to_label.get(ann["category_id"], 0))
        boxes_np = np.asarray(boxes, dtype=np.float32).reshape(-1, 4)
        labels_np = np.asarray(labels, dtype=np.int64)
        keep = (boxes_np[:, 2] > boxes_np[:, 0]) & (boxes_np[:, 3] > boxes_np[:, 1])
        return {
            "boxes": boxes_np[keep],
            "labels": labels_np[keep],
            "image_id": np.asarray([img_id]),
        }

    def __getitem__(self, idx: int) -> PUBLAY_NET_DATASET_ITEM_TYPE:
        img_id = self.ids[idx]
        return self.load_image(img_id), self.load_target(img_id)


def collate_fn(batch):
    """Tuple-of-lists collate (variable #boxes per image) — reference :77-81."""
    return tuple(zip(*batch))
