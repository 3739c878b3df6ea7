"""Batch inference serving: padded-bucket batching with on-device NMS.

Implements BASELINE.json config #5 ("Batch inference serving: high-res
multi-page documents with padded-bucket batching and fused on-device
NMS") — a capability the reference does not have (its only entry point is
train+eval, main.py:12-43).

Documents arrive as lists of pages (JPEG bytes or arrays) of arbitrary
size. Pages are decoded/resized host-side (the native C++ loader when
available), routed into (image_size, batch_size) buckets, padded to the
bucket's static shape, and run through a per-bucket jit-compiled
``detector_predict`` — everything from the backbone through per-class NMS
and top-k stays on device; boxes come back in original page coordinates.

Higher-resolution buckets reuse the same weights: the ViT resamples its
position embeddings for larger patch grids (models/vit.py) and the anchor
grid / RPN budgets are recomputed per bucket's static image size.
"""

from __future__ import annotations

import bisect
import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

from layoutdit_tpu.log import get_logger
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_predict,
    rescale_detections,
)

logger = get_logger(__name__)


@dataclasses.dataclass
class PageDetections:
    boxes: np.ndarray  # [K, 4] xyxy, original page coordinates
    scores: np.ndarray  # [K]
    labels: np.ndarray  # [K] int (1..NC)


class BatchInferenceEngine:
    """Bucketed batch inference over a trained detector.

    Args:
      model: LayoutDetectionModel (or anything with .params/.cfg).
      image_sizes: ascending bucket resolutions (multiples of the patch
        size); pages route to the smallest bucket >= max(h, w), the last
        bucket catches everything larger.
      batch_size: static batch per device call (padded).
      score_thresh: drop detections below this score.
    """

    def __init__(
        self,
        model,
        image_sizes: Sequence[int] = (224,),
        batch_size: int = 8,
        score_thresh: float = 0.05,
    ):
        self.model = model
        self.image_sizes = sorted(image_sizes)
        self.batch_size = batch_size
        self.score_thresh = score_thresh
        self._compiled: dict[int, object] = {}

    def _predict_fn(self, size: int):
        if size not in self._compiled:
            cfg = dataclasses.replace(self.model.cfg, image_size=size)

            @jax.jit
            def run(params, images, orig_sizes):
                dets = detector_predict(params, images, cfg)
                return rescale_detections(dets, orig_sizes, size)

            self._compiled[size] = run
            logger.info(
                "compiled serving bucket size=%d batch=%d", size, self.batch_size
            )
        return self._compiled[size]

    def _bucket_for(self, h: int, w: int) -> int:
        i = bisect.bisect_left(self.image_sizes, max(h, w))
        return self.image_sizes[min(i, len(self.image_sizes) - 1)]

    def _decode(self, pages, size: int):
        """pages: list of JPEG bytes or [3,H,W]/[H,W,3] arrays ->
        (images [N,3,S,S], orig [N,2])."""
        from layoutdit_tpu import native
        from layoutdit_tpu.ops.interpolate import resize_bilinear_np

        jpeg_pages = [p for p in pages if isinstance(p, (bytes, bytearray))]
        if jpeg_pages and len(jpeg_pages) == len(pages) and native.available():
            images, orig, fails = native.decode_resize_batch(
                [bytes(p) for p in pages], size
            )
            if fails:
                logger.warning("%d pages failed to decode", fails)
            return images, orig

        images = np.zeros((len(pages), 3, size, size), np.float32)
        orig = np.ones((len(pages), 2), np.float32)
        for i, p in enumerate(pages):
            if isinstance(p, (bytes, bytearray)):
                import io

                from PIL import Image

                arr = np.asarray(
                    Image.open(io.BytesIO(p)).convert("RGB"), np.float32
                ).transpose(2, 0, 1) / 255.0
            else:
                arr = np.asarray(p, np.float32)
                if arr.ndim == 3 and arr.shape[-1] == 3:  # HWC -> CHW
                    arr = arr.transpose(2, 0, 1)
                if arr.max() > 1.5:
                    arr = arr / 255.0
            orig[i] = arr.shape[-2:]
            images[i] = resize_bilinear_np(arr, size, size)
        return images, orig

    def predict_pages(self, pages: Sequence) -> list[PageDetections]:
        """Run detection on a list of pages (one document or many)."""
        # probe original sizes to route buckets
        sizes = []
        for p in pages:
            if isinstance(p, (bytes, bytearray)):
                import io

                from PIL import Image

                # PIL opens lazily: .size parses the JPEG header only —
                # pixel data is decoded once, in _decode, after bucketing
                # (which needs these sizes to pick the target resolution).
                with Image.open(io.BytesIO(bytes(p))) as im:
                    w, h = im.size
            else:
                arr = np.asarray(p)
                h, w = (arr.shape[-2:] if arr.shape[0] in (1, 3)
                        else arr.shape[:2])
            sizes.append((h, w))

        buckets: dict[int, list[int]] = {}
        for i, (h, w) in enumerate(sizes):
            buckets.setdefault(self._bucket_for(h, w), []).append(i)

        results: list[PageDetections | None] = [None] * len(pages)
        for size, indices in buckets.items():
            run = self._predict_fn(size)
            for start in range(0, len(indices), self.batch_size):
                chunk = indices[start:start + self.batch_size]
                chunk_pages = [pages[i] for i in chunk]
                images, orig = self._decode(chunk_pages, size)
                # pad to the static batch
                pad = self.batch_size - len(chunk)
                if pad:
                    images = np.concatenate(
                        [images, np.zeros((pad, *images.shape[1:]), np.float32)]
                    )
                    orig = np.concatenate([orig, np.ones((pad, 2), np.float32)])
                dets = run(self.model.params, jnp.asarray(images),
                           jnp.asarray(orig))
                boxes = np.asarray(dets.boxes)
                scores = np.asarray(dets.scores)
                labels = np.asarray(dets.labels)
                valid = np.asarray(dets.valid) & (scores >= self.score_thresh)
                for slot, page_idx in enumerate(chunk):
                    keep = valid[slot]
                    results[page_idx] = PageDetections(
                        boxes=boxes[slot][keep],
                        scores=scores[slot][keep],
                        labels=labels[slot][keep],
                    )
        return results  # type: ignore[return-value]

    def predict_document(self, pages: Sequence) -> list[PageDetections]:
        """Alias: a document is a list of pages."""
        return self.predict_pages(pages)
