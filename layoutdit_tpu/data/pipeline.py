"""Streaming host-side input pipeline with device prefetch.

Replaces the reference's ``torch.utils.data.DataLoader(num_workers=2,
collate_fn)`` + gcsfuse stack (trainer.py:54-60, SURVEY.md §2.2): decode /
resize / normalize happen on the host in worker threads while the TPU
computes, and finished batches are shipped to the device ahead of time
(double buffering) so the accelerator never waits on input.

TPU-specific transformations happen here, not on-device:
  * resize to the fixed ``image_size`` (the reference does this inside
    GeneralizedRCNNTransform, model.py:50-54) using the SAME torch-parity
    bilinear formula as the device ops — host/device resizes agree,
  * gt boxes scaled into model space and padded to ``max_gt`` with a
    validity mask (static shapes for jit),
  * the final partial batch is padded with an ``image_valid`` mask
    instead of producing a ragged shape that would trigger a recompile.
"""

from __future__ import annotations

import queue
import threading
from dataclasses import dataclass
from typing import Iterator, Sequence

import numpy as np

from layoutdit_tpu.data.dataset import PubLayNetDataset
from layoutdit_tpu.log import get_logger
from layoutdit_tpu.ops.interpolate import resize_bilinear_np

logger = get_logger(__name__)


@dataclass
class DetectionBatch:
    images: np.ndarray  # [B, 3, S, S] float32 in [0, 1]
    gt_boxes: np.ndarray  # [B, G, 4] float32, model (S x S) space
    gt_labels: np.ndarray  # [B, G] int32
    gt_valid: np.ndarray  # [B, G] bool
    image_ids: np.ndarray  # [B] int64
    orig_sizes: np.ndarray  # [B, 2] float32 (height, width)
    image_valid: np.ndarray  # [B] bool (False = batch padding)
    # [B, G, M, M] uint8 GT bitmasks on the model-space grid (Mask R-CNN
    # branch; None unless the loader runs with load_masks=True)
    gt_masks: np.ndarray | None = None


def prepare_example(
    image: np.ndarray,  # [3, H, W] float in [0,1]
    target: dict,
    image_size: int,
    max_gt: int,
    skip_image: bool = False,
) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Resize one example into model space and pad its targets.

    skip_image=True only scales/pads targets (the native C++ loader has
    already produced the resized image)."""
    _, h, w = image.shape
    if skip_image:
        resized = None
    else:
        resized = resize_bilinear_np(image, image_size, image_size).astype(
            np.float32
        )

    boxes = np.asarray(target["boxes"], np.float32).reshape(-1, 4)
    labels = np.asarray(target["labels"], np.int64)
    n = min(len(boxes), max_gt)
    if len(boxes) > max_gt:
        logger.warning("Clipping %d gt boxes to max_gt=%d", len(boxes), max_gt)
    out_boxes = np.zeros((max_gt, 4), np.float32)
    out_labels = np.zeros((max_gt,), np.int32)
    out_valid = np.zeros((max_gt,), bool)
    if n:
        scale = np.array(
            [image_size / w, image_size / h, image_size / w, image_size / h],
            np.float32,
        )
        out_boxes[:n] = boxes[:n] * scale
        out_labels[:n] = labels[:n]
        out_valid[:n] = True
    return resized, out_boxes, out_labels, out_valid, np.array([h, w], np.float32)


class DetectionLoader:
    """Iterable over DetectionBatch with threaded decode + device prefetch.

    Equivalent role to the reference's DataLoader construction at
    trainer.py:44-60 / evaluator.py:296-311.
    """

    def __init__(
        self,
        dataset: PubLayNetDataset,
        batch_size: int = 16,
        shuffle: bool = True,
        num_workers: int = 2,
        image_size: int = 224,
        max_gt: int = 128,
        seed: int = 0,
        drop_last: bool = False,
        device_put: bool = True,
        prefetch_depth: int = 2,
        use_native: bool | None = None,
        shardings: dict | None = None,
        stack_batches: int = 1,
        augment_hflip: float = 0.0,
        load_masks: bool = False,
        mask_size: int = 0,
    ):
        if load_masks and not getattr(dataset, "with_segmentation", False):
            raise ValueError(
                "load_masks=True needs a dataset constructed with "
                "with_segmentation=True (the segmentation field is "
                "dropped otherwise)"
            )
        self.load_masks = load_masks
        self.mask_size = mask_size or image_size // 2
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.image_size = image_size
        self.max_gt = max_gt
        self.seed = seed
        self.drop_last = drop_last
        self.device_put = device_put
        self.shardings = shardings
        # >1: the producer stacks S consecutive batches into one
        # super-batch ([S, B, ...] on the fields named in `shardings`,
        # device_put as ONE transfer per field) so the trainer can run S
        # steps per dispatch (lax.scan) — per-call dispatch latency and
        # transfer setup amortize S-fold while the H2D still overlaps
        # compute in this thread. Epoch remainders yield plain batches.
        self.stack_batches = max(1, stack_batches)
        self.augment_hflip = augment_hflip
        self.prefetch_depth = prefetch_depth
        self._epoch = 0
        self._start_batch = 0
        if use_native is None:
            from layoutdit_tpu import native

            use_native = native.available()
        self.use_native = use_native

    def __len__(self) -> int:
        n = len(self.dataset)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _pool(self):
        """Lazy shared decode thread-pool (PIL fallback path). Registered
        for shutdown at GC time so each loader instance does not leak its
        worker threads for the process lifetime."""
        if getattr(self, "_decode_pool", None) is None:
            import weakref
            from concurrent.futures import ThreadPoolExecutor

            pool = ThreadPoolExecutor(
                max_workers=self.num_workers,
                thread_name_prefix="ld-decode",
            )
            self._decode_pool = pool
            weakref.finalize(self, pool.shutdown, wait=False)
        return self._decode_pool

    def close(self) -> None:
        """Release the decode pool's worker threads (idempotent)."""
        pool = getattr(self, "_decode_pool", None)
        if pool is not None:
            pool.shutdown(wait=False)
            self._decode_pool = None

    def set_epoch(self, epoch: int) -> None:
        """Pin the shuffle/augmentation epoch (torch DistributedSampler
        API shape). The trainer calls this with the GLOBAL epoch so data
        order is a function of (seed, epoch) alone — a resumed process
        replays the same per-epoch order instead of restarting the
        loader's private iteration counter at 0."""
        self._epoch = int(epoch)

    def skip_batches(self, n: int) -> None:
        """One-shot: the next epoch iteration starts ``n`` index-batches
        into the epoch order (mid-epoch resume; consumed then reset)."""
        self._start_batch = int(n)

    def _epoch_order(self) -> np.ndarray:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        return order

    def _process_local_rows(self) -> np.ndarray | None:
        """Global batch rows owned by THIS process under the data sharding.

        Multi-host runs (a mesh spanning processes, e.g. a TPU pod over
        DCN): every host sees the same deterministic global batch order
        (a function of (seed, epoch) alone), but each must decode ONLY
        the rows its addressable devices own and construct the global
        array via jax.make_array_from_process_local_data — plain
        device_put cannot target non-addressable devices, and decoding
        the full global batch on every host wastes host CPU P-fold.
        Returns None in single-process runs (all rows local); rows come
        back sorted, i.e. in global order, which is the layout
        make_array_from_process_local_data expects.
        """
        import jax

        if self.shardings is None or jax.process_count() == 1:
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        s = next(iter(self.shardings.values()))
        batch_axis = s.spec[0] if len(s.spec) else None
        s1d = NamedSharding(s.mesh, PartitionSpec(batch_axis))
        rows: set[int] = set()
        imap = s1d.addressable_devices_indices_map((self.batch_size,))
        for idx in imap.values():
            rows.update(range(*idx[0].indices(self.batch_size)))
        return np.asarray(sorted(rows), np.int64)

    def _assemble(
        self, idxs: Sequence[int], rows: Sequence[int] | None = None
    ) -> DetectionBatch:
        """Assemble one batch. ``idxs`` holds the GLOBAL batch's dataset
        indices (shorter than batch_size only for the epoch remainder).
        ``rows`` (multi-host) restricts assembly to those global slot
        positions: the returned arrays then have len(rows) rows, row j
        holding global slot rows[j]; slots past len(idxs) stay padding
        (image_valid=False), exactly as in the single-process layout."""
        if rows is None:
            b = self.batch_size
            pairs = [(j, int(idxs[j])) for j in range(len(idxs))]
        else:
            b = len(rows)
            pairs = [
                (j, int(idxs[g])) for j, g in enumerate(rows) if g < len(idxs)
            ]
        s = self.image_size
        images = np.zeros((b, 3, s, s), np.float32)
        gt_boxes = np.zeros((b, self.max_gt, 4), np.float32)
        gt_labels = np.zeros((b, self.max_gt), np.int32)
        gt_valid = np.zeros((b, self.max_gt), bool)
        image_ids = np.zeros((b,), np.int64)
        orig_sizes = np.ones((b, 2), np.float32)
        image_valid = np.zeros((b,), bool)
        m = self.mask_size
        gt_masks = (
            np.zeros((b, self.max_gt, m, m), np.uint8)
            if self.load_masks else None
        )

        def fill_masks(slot, target, oh, ow):
            if gt_masks is None:
                return
            from layoutdit_tpu.data.masks import rasterize_target_masks

            gt_masks[slot] = rasterize_target_masks(
                target.get("segmentation", []), oh, ow, m, self.max_gt
            )

        if self.use_native:
            # C++ fast path: raw bytes -> threaded decode+resize (~100x
            # the PIL+numpy route on this host)
            from layoutdit_tpu import native

            img_ids = [self.dataset.ids[i] for _, i in pairs]
            bufs = [self.dataset.load_image_bytes(i) for i in img_ids]
            decoded, origs, fails = native.decode_resize_batch(
                bufs, s, n_threads=max(1, self.num_workers)
            )
            if fails:
                logger.warning(
                    "%d corrupt images in batch (slots invalidated)", fails
                )
            for k, (slot, _) in enumerate(pairs):
                if origs[k, 0] < 1.0:  # decode failure marker (0, 0):
                    # leave the slot image_valid=False / gt_valid=all-False
                    # so the blank image never enters the loss with
                    # garbage-scaled boxes.
                    continue
                target = self.dataset.load_target(img_ids[k])
                _, boxes, labels, valid, _ = prepare_example(
                    # image content unused for target prep; only dims matter
                    np.empty((3, int(origs[k, 0]), int(origs[k, 1])),
                             np.float32),
                    target, s, self.max_gt, skip_image=True,
                )
                images[slot] = decoded[k]
                gt_boxes[slot] = boxes
                gt_labels[slot] = labels
                gt_valid[slot] = valid
                image_ids[slot] = int(np.asarray(target["image_id"]).ravel()[0])
                orig_sizes[slot] = origs[k]
                image_valid[slot] = True
                fill_masks(slot, target, origs[k, 0], origs[k, 1])
        else:
            # PIL fallback: decode examples CONCURRENTLY (PIL/numpy release
            # the GIL for the heavy parts) — matches the reference's
            # DataLoader(num_workers=2) worker parallelism (trainer.py:54-60)
            # without process overhead.
            def load(slot_idx):
                slot, idx = slot_idx
                image, target = self.dataset[int(idx)]
                return slot, prepare_example(image, target, s, self.max_gt), target

            if self.num_workers > 1 and len(pairs) > 1:
                results = list(self._pool().map(load, pairs))
            else:
                results = [load(si) for si in pairs]
            for slot, (img, boxes, labels, valid, orig), target in results:
                images[slot] = img
                gt_boxes[slot] = boxes
                gt_labels[slot] = labels
                gt_valid[slot] = valid
                image_ids[slot] = int(np.asarray(target["image_id"]).ravel()[0])
                orig_sizes[slot] = orig
                image_valid[slot] = True
                fill_masks(slot, target, orig[0], orig[1])
        if self.augment_hflip > 0:
            # Horizontal flip in model space (image + x-coords of boxes).
            # The decision hashes (seed, epoch, dataset index) — NOT slot,
            # worker order, or host — so an epoch's augmentation is
            # reproducible under any num_workers/stack_batches/process
            # count (DataLoaderConfig).
            for slot, idx in pairs:
                if not image_valid[slot]:
                    continue
                r = np.random.default_rng(
                    (self.seed, self._epoch, int(idx), 0xF11B)
                ).random()
                if r < self.augment_hflip:
                    images[slot] = images[slot][:, :, ::-1]
                    v = gt_valid[slot]
                    x1 = gt_boxes[slot][v, 0].copy()
                    x2 = gt_boxes[slot][v, 2].copy()
                    gt_boxes[slot][v, 0] = s - x2
                    gt_boxes[slot][v, 2] = s - x1
                    if gt_masks is not None:
                        gt_masks[slot] = gt_masks[slot][:, :, ::-1]
        return DetectionBatch(
            images, gt_boxes, gt_labels, gt_valid, image_ids, orig_sizes,
            image_valid, gt_masks=gt_masks,
        )

    def _batches_of_indices(self) -> Iterator[np.ndarray]:
        order = self._epoch_order()
        start = getattr(self, "_start_batch", 0)
        self._start_batch = 0  # one-shot (mid-epoch resume)
        n_full = len(order) // self.batch_size
        for i in range(start, n_full):
            yield order[i * self.batch_size:(i + 1) * self.batch_size]
        rem = len(order) % self.batch_size
        if rem and not self.drop_last and start <= n_full:
            yield order[n_full * self.batch_size:]

    def __iter__(self) -> Iterator[DetectionBatch]:
        """Producer thread assembles batches; consumer gets device-resident
        arrays (double-buffered via the bounded queue)."""
        q: queue.Queue = queue.Queue(maxsize=self.prefetch_depth)
        stop = threading.Event()
        # Multi-host: rows of the global batch this process decodes/ships
        # (None = single process, all rows). Computed once per epoch.
        local_rows = self._process_local_rows()

        def ship(batch: DetectionBatch, stacked: bool) -> DetectionBatch:
            """H2D in the producer thread: jax.device_put is async, so the
            transfer of batch N+1 overlaps the device compute of batch N
            (the trainer's explicit in_shardings then see already-committed
            arrays and skip a second copy). Fields not named in `shardings`
            stay host-side numpy when a shardings map is given (train
            consumes only 4 of the 7); in multi-host runs those host-side
            fields hold ONLY this process's rows."""
            if not (self.device_put or self.shardings):
                return batch
            import jax

            def put(name, val):
                if val is None:  # absent optional field (gt_masks)
                    return None
                if self.shardings is not None:
                    if name not in self.shardings:
                        return val
                    s = self.shardings[name]
                    if stacked:
                        from jax.sharding import (
                            NamedSharding, PartitionSpec,
                        )

                        # super-batch: batch axis moved to dim 1
                        s = NamedSharding(s.mesh, PartitionSpec(None, *s.spec))
                    if local_rows is not None:
                        # global array from per-process shards; the local
                        # rows are in global order (see _process_local_rows)
                        gshape = (
                            (val.shape[0], self.batch_size) + val.shape[2:]
                            if stacked
                            else (self.batch_size,) + val.shape[1:]
                        )
                        return jax.make_array_from_process_local_data(
                            s, val, gshape
                        )
                    return jax.device_put(val, s)
                return jax.device_put(val)

            return DetectionBatch(
                *(put(f, getattr(batch, f))
                  for f in batch.__dataclass_fields__)
            )

        def stack(group: list[DetectionBatch]) -> DetectionBatch:
            fields = {}
            for f in DetectionBatch.__dataclass_fields__:
                vals = [getattr(b, f) for b in group]
                if vals[0] is None:  # absent optional field (gt_masks)
                    fields[f] = None
                elif self.shardings is not None and f not in self.shardings:
                    # metadata stays host-side, flat [S*B, ...]
                    fields[f] = np.concatenate(vals)
                else:
                    fields[f] = np.stack(vals)  # [S, B, ...]
            return DetectionBatch(**fields)

        def producer():
            try:
                group: list[DetectionBatch] = []
                for idxs in self._batches_of_indices():
                    if stop.is_set():
                        return
                    batch = self._assemble(idxs, rows=local_rows)
                    if self.stack_batches > 1:
                        group.append(batch)
                        if len(group) == self.stack_batches:
                            q.put(ship(stack(group), stacked=True))
                            group = []
                    else:
                        q.put(ship(batch, stacked=False))
                for batch in group:  # epoch remainder: plain batches
                    q.put(ship(batch, stacked=False))
            except Exception as e:  # surface worker failures to the consumer
                q.put(e)
            finally:
                q.put(None)

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
        self._epoch += 1
