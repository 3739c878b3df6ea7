"""Box primitives: IoU, clipping, and the Faster R-CNN box coder.

Semantics match the torchvision ops the reference links against
(/root/reference/src/layoutdit/modeling/model.py:45-55 pulls in
torchvision's BoxCoder / box_iou / clip_boxes_to_image through
``FasterRCNN``), reimplemented as pure jnp so the whole detector jits:

  * boxes are ``[x1, y1, x2, y2]`` float tensors,
  * encode: deltas = weights * (ctr offset / size, log size ratio),
  * decode: inverse, with ``dw``/``dh`` clamped to ``log(1000/16)``.

Everything is shape-static; invalid (padding) rows are the caller's
responsibility via masks.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

# torchvision's bbox_xform_clip (box decode exp() guard).
BBOX_XFORM_CLIP = math.log(1000.0 / 16.0)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [N,4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """Pairwise IoU: [M,4] x [N,4] -> [M,N] (xyxy, exclusive coords)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1[..., :, None] + area2[..., None, :] - inter
    return jnp.where(union > 0, inter / union, 0.0)


def generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray) -> jnp.ndarray:
    """ELEMENTWISE generalized IoU of aligned box sets: [..., 4] x [..., 4]
    -> [...] (torchvision ops.generalized_box_iou_loss pairing: GIoU =
    IoU - (enclosure - union) / enclosure). Degenerate/empty boxes give
    IoU 0 against the 0-area convention used by box_iou."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = jnp.where(union > 0, inter / union, 0.0)
    lt_e = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb_e = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh_e = jnp.clip(rb_e - lt_e, 0.0)
    enclosure = wh_e[..., 0] * wh_e[..., 1]
    return jnp.where(
        enclosure > 0, iou - (enclosure - union) / enclosure, iou
    )


def encode_boxes_linear(
    reference_boxes: jnp.ndarray, targets: jnp.ndarray,
    normalize_by_size: bool = True,
) -> jnp.ndarray:
    """torchvision BoxLinearCoder.encode (FCOS): (l, t, r, b) distances
    from the REFERENCE box center to the TARGET box sides, optionally
    normalized by the reference box size."""
    ctr_x = 0.5 * (reference_boxes[..., 0] + reference_boxes[..., 2])
    ctr_y = 0.5 * (reference_boxes[..., 1] + reference_boxes[..., 3])
    out = jnp.stack(
        [
            ctr_x - targets[..., 0],
            ctr_y - targets[..., 1],
            targets[..., 2] - ctr_x,
            targets[..., 3] - ctr_y,
        ],
        axis=-1,
    )
    if normalize_by_size:
        w = reference_boxes[..., 2] - reference_boxes[..., 0]
        h = reference_boxes[..., 3] - reference_boxes[..., 1]
        out = out / jnp.stack([w, h, w, h], axis=-1)
    return out


def decode_boxes_linear(
    rel_codes: jnp.ndarray, boxes: jnp.ndarray,
    normalize_by_size: bool = True,
) -> jnp.ndarray:
    """torchvision BoxLinearCoder.decode (FCOS): inverse of
    encode_boxes_linear."""
    ctr_x = 0.5 * (boxes[..., 0] + boxes[..., 2])
    ctr_y = 0.5 * (boxes[..., 1] + boxes[..., 3])
    if normalize_by_size:
        w = boxes[..., 2] - boxes[..., 0]
        h = boxes[..., 3] - boxes[..., 1]
        rel_codes = rel_codes * jnp.stack([w, h, w, h], axis=-1)
    return jnp.stack(
        [
            ctr_x - rel_codes[..., 0],
            ctr_y - rel_codes[..., 1],
            ctr_x + rel_codes[..., 2],
            ctr_y + rel_codes[..., 3],
        ],
        axis=-1,
    )


def clip_boxes_to_image(boxes: jnp.ndarray, height: float, width: float) -> jnp.ndarray:
    """Clamp xyxy boxes to [0,W]x[0,H] (torchvision clip_boxes_to_image)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width)
    y1 = jnp.clip(boxes[..., 1], 0.0, height)
    x2 = jnp.clip(boxes[..., 2], 0.0, width)
    y2 = jnp.clip(boxes[..., 3], 0.0, height)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def small_box_mask(boxes: jnp.ndarray, min_size: float) -> jnp.ndarray:
    """True for boxes with BOTH sides >= min_size (torchvision
    remove_small_boxes keeps ws >= min_size & hs >= min_size)."""
    ws = boxes[..., 2] - boxes[..., 0]
    hs = boxes[..., 3] - boxes[..., 1]
    return (ws >= min_size) & (hs >= min_size)


def encode_boxes(
    reference_boxes: jnp.ndarray,
    proposals: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Encode gt ``reference_boxes`` relative to ``proposals`` (anchors).

    torchvision BoxCoder.encode_single semantics.
    """
    wx, wy, ww, wh = weights
    ex_w = proposals[..., 2] - proposals[..., 0]
    ex_h = proposals[..., 3] - proposals[..., 1]
    ex_cx = proposals[..., 0] + 0.5 * ex_w
    ex_cy = proposals[..., 1] + 0.5 * ex_h

    gt_w = reference_boxes[..., 2] - reference_boxes[..., 0]
    gt_h = reference_boxes[..., 3] - reference_boxes[..., 1]
    gt_cx = reference_boxes[..., 0] + 0.5 * gt_w
    gt_cy = reference_boxes[..., 1] + 0.5 * gt_h

    dx = wx * (gt_cx - ex_cx) / ex_w
    dy = wy * (gt_cy - ex_cy) / ex_h
    dw = ww * jnp.log(gt_w / ex_w)
    dh = wh * jnp.log(gt_h / ex_h)
    return jnp.stack([dx, dy, dw, dh], axis=-1)


def decode_boxes(
    deltas: jnp.ndarray,
    boxes: jnp.ndarray,
    weights: tuple[float, float, float, float] = (1.0, 1.0, 1.0, 1.0),
) -> jnp.ndarray:
    """Apply regression ``deltas`` [..., 4] to ``boxes`` [..., 4] (xyxy).

    torchvision BoxCoder.decode_single semantics, including the
    ``log(1000/16)`` clamp on dw/dh.
    """
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h

    dx = deltas[..., 0] / wx
    dy = deltas[..., 1] / wy
    dw = jnp.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = jnp.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)

    pred_cx = dx * w + cx
    pred_cy = dy * h + cy
    pred_w = jnp.exp(dw) * w
    pred_h = jnp.exp(dh) * h

    return jnp.stack(
        [
            pred_cx - 0.5 * pred_w,
            pred_cy - 0.5 * pred_h,
            pred_cx + 0.5 * pred_w,
            pred_cy + 0.5 * pred_h,
        ],
        axis=-1,
    )
