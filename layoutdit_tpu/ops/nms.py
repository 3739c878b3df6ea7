"""Fixed-shape on-device NMS.

The reference gets NMS from torchvision's C++/CUDA kernel
(``torchvision::nms``, linked through FasterRCNN — SURVEY.md §2.2). On TPU
everything must be shape-static and on-device, so NMS is expressed as a
masked greedy suppression over a *fixed* number of candidates:

  * invalid / padding candidates carry ``-inf`` score,
  * output is a boolean keep-mask (same shape as scores), not a
    variable-length index list,
  * semantics match torchvision exactly: sort by score descending, greedily
    keep a box unless a previously-kept box overlaps it with IoU strictly
    greater than ``iou_threshold``.

Greedy NMS has true sequential dependencies (suppression chains), so the
core is a ``lax.scan`` over candidates in score order with O(N) vector work
per step — a single fused device loop, no host round-trips. ``batched_nms``
uses torchvision's coordinate-offset trick so one scan handles all
classes/levels jointly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.boxes import box_iou


def nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Greedy NMS keep-mask.

    Args:
      boxes: [N, 4] xyxy.
      scores: [N]; padding should be -inf (or pass ``valid``).
      iou_threshold: suppress when IoU > threshold (strict, as torchvision).
      valid: optional [N] bool; False rows are never kept and never suppress.

    Returns:
      [N] bool keep-mask in the ORIGINAL box order.
    """
    n = boxes.shape[0]
    if valid is not None:
        scores = jnp.where(valid, scores, -jnp.inf)
    order = jnp.argsort(-scores, stable=True)
    boxes_s = boxes[order]
    valid_s = jnp.isfinite(scores[order])

    positions = jnp.arange(n)

    def step(keep, inputs):
        i, box_i, valid_i = inputs
        # IoU of this box vs all (computed on the fly: O(N) memory total,
        # the full N x N matrix would blow HBM at RPN candidate counts)
        iou_row = box_iou(box_i[None], boxes_s)[0]
        # suppressed if any earlier kept box overlaps > threshold
        earlier_kept = keep & (positions < i)
        suppressed = jnp.any(earlier_kept & (iou_row > iou_threshold))
        keep_i = valid_i & ~suppressed
        keep = keep.at[i].set(keep_i)
        return keep, None

    keep_sorted, _ = jax.lax.scan(
        step,
        jnp.zeros((n,), dtype=bool),
        (positions, boxes_s, valid_s),
    )
    # scatter back to original order
    keep = jnp.zeros((n,), dtype=bool).at[order].set(keep_sorted)
    return keep


def batched_nms_mask(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    iou_threshold: float,
    valid: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Category-aware NMS (torchvision batched_nms coordinate-offset trick).

    Boxes with different ``idxs`` (class or FPN level) never suppress each
    other; one fused scan handles everything.
    """
    if boxes.shape[0] == 0:
        return jnp.zeros((0,), dtype=bool)
    max_coord = jnp.max(jnp.where(jnp.isfinite(boxes), boxes, 0.0))
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    shifted = boxes + offsets[:, None]
    return nms_mask(shifted, scores, iou_threshold, valid=valid)
