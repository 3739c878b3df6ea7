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

The engine pipelines: decode-worker threads prepare batches ahead of the
device, dispatches are asynchronous with a bounded in-flight window, and
an optional ``jax.sharding.Mesh`` shards each batch over every device for
multi-chip data-parallel serving (weights replicated once).
"""

from __future__ import annotations

import bisect
import dataclasses
import os
from concurrent.futures import ThreadPoolExecutor
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

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
    # Mask R-CNN models: per-detection cropped bitmaps in original page
    # coordinates, as (x0, y0, bitmap uint8) windows (eval/masks.py);
    # None when the model has no mask head
    masks: list | None = None


class BatchInferenceEngine:
    """Bucketed batch inference over a trained detector.

    Args:
      model: LayoutDetectionModel (or anything with .params/.cfg).
      image_sizes: ascending bucket resolutions (multiples of the patch
        size); pages route to the smallest bucket >= max(h, w), the last
        bucket catches everything larger.
      batch_size: static batch per device call (padded).
      score_thresh: drop detections below this score.
      int8: quantize the encoder's hot linears to W8A8-dynamic int8
        (ops/quant.py). Measured NEUTRAL for dit-base on v5e (1.00x at
        224/1024 px — see ops/quant.py); off by default, available for
        GEMM-bound model shapes.
      mesh: optional ``jax.sharding.Mesh`` for multi-chip data-parallel
        serving: each device batch is sharded over ALL mesh axes jointly
        (batch_size must divide evenly) and the weights are replicated
        once at engine construction. GSPMD then runs each bucket's
        ``detector_predict`` fully device-parallel with no collectives on
        the hot path (detection is embarrassingly data-parallel).
      decode_workers: host threads that decode/resize pages ahead of the
        device (the device queue is fed asynchronously; see
        ``max_in_flight``). Default: cpu_count - 1, floor 1 — decode
        threads share cores with the dispatch/transfer path, and
        oversubscribing a small host starves it (measured 2.3x slower
        with 2 workers on a 1-core host, PERF_STAGES.md).
      max_in_flight: dispatched-but-unfetched device batches to keep in
        the pipeline. JAX dispatch is async, so the engine overlaps host
        decode of batch i+1..i+k with device compute of batch i and only
        blocks when the window is full — this hides dispatch latency and
        host decode behind compute. Bounds device memory to
        ``max_in_flight`` input batches.
    """

    def _init_pipeline_fields(
        self,
        score_thresh: float,
        decode_workers: int | None,
        max_in_flight: int,
    ) -> None:
        """Host-pipeline scalars shared by the live and exported engines
        (the decode-worker default encodes the 1-core-host tuning from
        PERF_STAGES.md — keep it in exactly one place)."""
        if decode_workers is None:
            decode_workers = max(1, min(4, (os.cpu_count() or 2) - 1))
        self.score_thresh = score_thresh
        self.decode_workers = decode_workers
        self.max_in_flight = max(1, max_in_flight)
        # overridden by the live engine when the model has a mask head;
        # exported artifacts serve boxes only
        self._with_masks = False

    def __init__(
        self,
        model,
        image_sizes: Sequence[int] = (224,),
        batch_size: int = 8,
        score_thresh: float = 0.05,
        int8: bool = False,
        mesh: Mesh | None = None,
        decode_workers: int | None = None,
        max_in_flight: int = 2,
    ):
        self.model = model
        self.image_sizes = sorted(image_sizes)
        self.batch_size = batch_size
        self.mesh = mesh
        self._init_pipeline_fields(score_thresh, decode_workers, max_in_flight)
        self._with_masks = bool(getattr(model.cfg, "with_mask", False))
        # Resolve the TP axis the same way the sharding rules do
        # (parallel/mesh.py::model_axis_name): by NAME when an axis is
        # called 'model', else positionally. Engine and param specs
        # disagreeing here silently served replicated weights on meshes
        # like Mesh(devs, ('model',)).
        from layoutdit_tpu.parallel.mesh import model_axis_name

        model_axis = model_axis_name(mesh) if mesh is not None else None
        tp = int(mesh.shape[model_axis]) if model_axis is not None else 1
        if int8 and tp > 1:
            # checked BEFORE quantizing: the quantization pass is seconds
            # of host work on a large model and would be thrown away
            raise ValueError(
                "int8 serving does not compose with tensor parallelism "
                "(quantized params carry scales the TP layout does not "
                "cover)"
            )
        if int8:
            from layoutdit_tpu.models.lora import merge_lora_detector
            from layoutdit_tpu.ops.quant import quantize_detector_params

            # fold any LoRA adapters into the kernels first — int8
            # quantization works on merged weights (ops/quant.py raises
            # on unmerged adapters rather than dropping them)
            params = quantize_detector_params(
                merge_lora_detector(model.params, model.cfg.backbone.vit)
            )
        else:
            params = model.params
        if mesh is not None:
            if tp > 1:
                # Tensor-parallel serving: params shard Megatron-style
                # over 'model' (encoder qkv/mlp column/row + box-head
                # fc6/fc7, parallel/sharding.py); batches shard over the
                # remaining axes. Cuts per-request latency for big
                # models/resolutions (dit-large @ 1024 px) where dp over
                # small batches leaves chips idle.
                from layoutdit_tpu.parallel.sharding import shard_params

                data_axes = tuple(
                    a for a in mesh.axis_names if a != model_axis
                )
                n_data = int(
                    np.prod([mesh.shape[a] for a in data_axes])
                ) if data_axes else 1
                if batch_size % n_data:
                    raise ValueError(
                        f"batch_size {batch_size} must divide evenly over "
                        f"the {n_data}-way data section of the mesh"
                    )
                params = shard_params(params, mesh)
                self._batch_sharding = NamedSharding(
                    mesh, P(data_axes) if data_axes else P()
                )
            else:
                if batch_size % mesh.size:
                    raise ValueError(
                        f"batch_size {batch_size} must divide evenly over "
                        f"the {mesh.size}-device mesh"
                    )
                self._batch_sharding = NamedSharding(mesh, P(mesh.axis_names))
                params = jax.device_put(params, NamedSharding(mesh, P()))
        else:
            self._batch_sharding = None
        self._params = params
        self._compiled: dict[int, object] = {}

    @classmethod
    def from_corpus(
        cls,
        model,
        page_sizes,
        max_buckets: int = 3,
        **kwargs,
    ) -> "BatchInferenceEngine":
        """Build an engine with cost-optimal buckets for a measured corpus
        of (height, width) page sizes (eval/buckets.py DP planner)."""
        from layoutdit_tpu.eval.buckets import plan_buckets

        patch = getattr(model.cfg.backbone.vit, "patch_size", 16)
        sizes = plan_buckets(page_sizes, k=max_buckets, patch=patch)
        return cls(model, image_sizes=sizes, **kwargs)

    @property
    def params(self):
        return self._params

    def _predict_fn(self, size: int):
        if size not in self._compiled:
            cfg = dataclasses.replace(self.model.cfg, image_size=size)
            with_masks = self._with_masks

            @jax.jit
            def run(params, images, orig_sizes):
                if with_masks:
                    dets, probs = detector_predict(
                        params, images, cfg, with_masks=True
                    )
                    return rescale_detections(dets, orig_sizes, size), probs
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

                try:
                    arr = np.asarray(
                        Image.open(io.BytesIO(p)).convert("RGB"), np.float32
                    ).transpose(2, 0, 1) / 255.0
                except Exception:
                    # Same failure semantics as the native loader: zero
                    # image, orig == (0, 0) marks the slot invalid; the
                    # rest of the batch proceeds.
                    logger.warning("page %d failed to decode; zeroed", i)
                    orig[i] = 0.0
                    continue
            else:
                arr = np.asarray(p, np.float32)
                if arr.ndim == 3 and arr.shape[-1] == 3:  # HWC -> CHW
                    arr = arr.transpose(2, 0, 1)
                if arr.max() > 1.5:
                    arr = arr / 255.0
            orig[i] = arr.shape[-2:]
            images[i] = resize_bilinear_np(arr, size, size)
        return images, orig

    def _decode_padded(self, pages, size: int):
        """Decode a chunk and pad it to the engine's static batch shape
        (runs on a decode-worker thread)."""
        images, orig = self._decode(pages, size)
        pad = self.batch_size - len(pages)
        if pad:
            images = np.concatenate(
                [images, np.zeros((pad, *images.shape[1:]), np.float32)]
            )
            orig = np.concatenate([orig, np.ones((pad, 2), np.float32)])
        return images, orig

    def _put(self, images: np.ndarray, orig: np.ndarray):
        if self._batch_sharding is not None:
            return (
                jax.device_put(images, self._batch_sharding),
                jax.device_put(orig, self._batch_sharding),
            )
        return jnp.asarray(images), jnp.asarray(orig)

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
                try:
                    with Image.open(io.BytesIO(bytes(p))) as im:
                        w, h = im.size
                except Exception:
                    w = h = 1  # corrupt page: smallest bucket, zeroed slot
            else:
                arr = np.asarray(p)
                h, w = (arr.shape[-2:] if arr.shape[0] in (1, 3)
                        else arr.shape[:2])
            sizes.append((h, w))

        buckets: dict[int, list[int]] = {}
        for i, (h, w) in enumerate(sizes):
            buckets.setdefault(self._bucket_for(h, w), []).append(i)

        results: list[PageDetections | None] = [None] * len(pages)

        def fetch(chunk, decoded_ok, orig, out):
            if self._with_masks:
                dets, mask_probs = out
                mask_probs = np.asarray(mask_probs)
            else:
                dets, mask_probs = out, None
            boxes = np.asarray(dets.boxes)
            scores = np.asarray(dets.scores)
            labels = np.asarray(dets.labels)
            valid = np.asarray(dets.valid) & (scores >= self.score_thresh)
            for slot, page_idx in enumerate(chunk):
                keep = valid[slot] & decoded_ok[slot]
                masks = None
                if mask_probs is not None:
                    from layoutdit_tpu.eval.masks import paste_mask_in_box

                    im_h, im_w = (int(orig[slot, 0]), int(orig[slot, 1]))
                    masks = [
                        paste_mask_in_box(
                            mask_probs[slot, di], boxes[slot, di],
                            max(im_h, 1), max(im_w, 1),
                        )
                        for di in np.nonzero(keep)[0]
                    ]
                results[page_idx] = PageDetections(
                    boxes=boxes[slot][keep],
                    scores=scores[slot][keep],
                    labels=labels[slot][keep],
                    masks=masks,
                )

        # Three-stage pipeline: decode-worker threads fill chunk buffers
        # ahead, the main thread dispatches each ready chunk (JAX dispatch
        # is async — the call returns before the device finishes), and
        # fetches lag max_in_flight batches behind so device compute,
        # host decode, and D2H transfers all overlap.
        chunks = []
        for size, indices in buckets.items():
            for start in range(0, len(indices), self.batch_size):
                chunks.append((size, indices[start:start + self.batch_size]))
        in_flight: list[tuple[list[int], np.ndarray, object]] = []
        with ThreadPoolExecutor(max_workers=self.decode_workers) as pool:
            # decode-ahead is BOUNDED: only enough chunks in flight to
            # keep the workers busy plus the dispatch window — finished
            # float32 batches otherwise pile up host-side at corpus
            # scale (decode is usually faster than device inference)
            from collections import deque

            pending: deque = deque()
            chunk_iter = iter(chunks)
            ahead = self.decode_workers + self.max_in_flight + 1

            def submit_next() -> None:
                nxt = next(chunk_iter, None)
                if nxt is not None:
                    size_, chunk_ = nxt
                    pending.append((nxt, pool.submit(
                        self._decode_padded,
                        [pages[i] for i in chunk_], size_,
                    )))

            for _ in range(ahead):
                submit_next()
            while pending:
                (size, chunk), fut = pending.popleft()
                run = self._predict_fn(size)
                images, orig = fut.result()
                submit_next()  # refill the decode window
                decoded_ok = (orig > 0).all(axis=1)  # (0,0) = failed slot
                in_flight.append(
                    (chunk, decoded_ok, orig,
                     run(self.params, *self._put(images, orig)))
                )
                if len(in_flight) >= self.max_in_flight:
                    fetch(*in_flight.pop(0))
        for entry in in_flight:
            fetch(*entry)
        return results  # type: ignore[return-value]

    def predict_document(self, pages: Sequence) -> list[PageDetections]:
        """Alias: a document is a list of pages."""
        return self.predict_pages(pages)


class ExportedInferenceEngine(BatchInferenceEngine):
    """The same pipelined serving engine, backed by an AOT export
    artifact (export.py) instead of live model code: per-bucket
    callables are the deserialized StableHLO programs, so serving a
    frozen artifact gets the identical host path — size bucketing,
    padded static batches, bounded decode-ahead, in-flight dispatch
    window — with zero ``layoutdit_tpu`` model/config involvement.

    ``batch_size`` and ``image_sizes`` are fixed at export time (the
    StableHLO programs have static shapes); the constructor takes them
    from the artifact's manifest.
    """

    def __init__(
        self,
        exported,
        score_thresh: float = 0.05,
        decode_workers: int | None = None,
        max_in_flight: int = 2,
    ):
        from layoutdit_tpu.export import ExportedDetector

        if isinstance(exported, str):
            exported = ExportedDetector(exported)
        self.exported = exported
        self.model = None
        self.mesh = None
        self.image_sizes = sorted(exported.image_sizes)
        self.batch_size = int(exported.manifest["batch_size"])
        self._init_pipeline_fields(score_thresh, decode_workers, max_in_flight)
        self._batch_sharding = None
        self._params = None  # weights live inside the artifact

    def _predict_fn(self, size: int):
        import types

        def run(_params, images, orig_sizes):
            # dict -> attribute view: predict_pages' fetch() reads
            # .boxes/.scores/.labels/.valid like a Detections pytree
            return types.SimpleNamespace(
                **self.exported.predict_async(images, orig_sizes)
            )

        return run
