"""FCOS anchor-free single-stage detection head — beyond-reference family.

The reference is two-stage-only (torchvision ``FasterRCNN``,
/root/reference/src/layoutdit/modeling/model.py:45-55). This adds the
anchor-free single-stage shape with torchvision ``models.detection.fcos``
semantics: every pyramid cell is ONE reference point (a stride-sized
square "anchor" used only as the BoxLinearCoder reference), predictions
are (l, t, r, b) distances plus a center-ness logit, and there is no
matcher-over-IoU, no sampling, no RoI stage — dense, static-shape math
end to end.

Semantics matched to torchvision FCOS / FCOSHead:

  * towers: 4x (conv3x3 C->C + GroupNorm(32) + ReLU) each for class and
    regression; heads: conv3x3 to NC+1 class logits (focal prior bias),
    conv3x3 -> ReLU to 4 ltrb distances, conv3x3 to 1 center-ness logit
    (off the regression tower)
  * assignment (FCOS.compute_loss): a cell matches a gt when its center
    lies within ``center_sampling_radius x anchor_size`` of the gt
    center, inside the gt box, and the max ltrb distance falls in the
    level's scale range (anchor_size x [4, 8); first level lower bound 0,
    last level upper bound inf); ties resolve to the smallest-area gt
  * losses: sigmoid focal (sum over every cell) + GIoU on decoded
    foreground boxes + BCE center-ness vs sqrt(min/max ltrb ratios),
    all divided by the BATCH-global max(1, num_foreground) — unlike
    RetinaNet's per-image normalization
  * inference: per level, score = sqrt(sigmoid(cls) * sigmoid(ctr)),
    threshold + top-k candidates, linear decode, clip; class-aware NMS
    across levels

Divergences (same rationale as retinanet.py): the head runs on a
configurable subset of the SHARED p2..p5+pool pyramid (default strides
8..64; torchvision uses P3..P7), and the untargeted background channel
(class 0) is excluded from inference candidates.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.detection.retinanet import (
    _normal_conv,
    sigmoid_focal_loss,
)
from layoutdit_tpu.models.detection.roi_heads import Detections
from layoutdit_tpu.models.fpn import conv2d
from layoutdit_tpu.ops.boxes import (
    clip_boxes_to_image,
    decode_boxes_linear,
    encode_boxes_linear,
    generalized_box_iou,
)
from layoutdit_tpu.ops.nms import batched_nms_mask

PRIOR_PROBABILITY = 0.01
GN_GROUPS = 32


def init_fcos_head_params(
    key: jax.Array,
    in_channels: int,
    num_classes_bg: int,
    num_convs: int = 4,
) -> dict:
    """FCOSClassificationHead + FCOSRegressionHead params: tower convs
    normal(std=0.01) with GroupNorm(32) (scale 1, bias 0); cls head gets
    the focal prior bias, bbox/ctrness heads zero bias."""
    k_cls, k_reg, k1, k2, k3 = jax.random.split(key, 5)

    def tower(k):
        keys = jax.random.split(k, num_convs)
        p: dict = {}
        for i in range(num_convs):
            p[f"conv{i + 1}"] = {
                "kernel": _normal_conv(keys[i], in_channels, in_channels, 3),
                "bias": jnp.zeros((in_channels,), jnp.float32),
                "gn_scale": jnp.ones((in_channels,), jnp.float32),
                "gn_bias": jnp.zeros((in_channels,), jnp.float32),
            }
        return p

    prior_bias = -math.log((1.0 - PRIOR_PROBABILITY) / PRIOR_PROBABILITY)
    return {
        "cls_tower": tower(k_cls),
        "reg_tower": tower(k_reg),
        "cls_logits": {
            "kernel": _normal_conv(k1, num_classes_bg, in_channels, 3),
            "bias": jnp.full((num_classes_bg,), prior_bias, jnp.float32),
        },
        "bbox_reg": {
            "kernel": _normal_conv(k2, 4, in_channels, 3),
            "bias": jnp.zeros((4,), jnp.float32),
        },
        "ctrness": {
            "kernel": _normal_conv(k3, 1, in_channels, 3),
            "bias": jnp.zeros((1,), jnp.float32),
        },
    }


def _group_norm(x: jnp.ndarray, scale: jnp.ndarray, bias: jnp.ndarray,
                groups: int = GN_GROUPS, eps: float = 1e-5) -> jnp.ndarray:
    """torch GroupNorm over [B, C, H, W]; statistics in fp32."""
    b, c, h, w = x.shape
    g = min(groups, c)
    x32 = x.astype(jnp.float32).reshape(b, g, c // g, h, w)
    mean = x32.mean(axis=(2, 3, 4), keepdims=True)
    var = x32.var(axis=(2, 3, 4), keepdims=True)
    x32 = (x32 - mean) * jax.lax.rsqrt(var + eps)
    out = x32.reshape(b, c, h, w) * scale[None, :, None, None] + bias[
        None, :, None, None
    ]
    return out.astype(x.dtype)


def _run_tower(p: dict, feat: jnp.ndarray) -> jnp.ndarray:
    x = feat
    i = 1
    while f"conv{i}" in p:
        c = p[f"conv{i}"]
        x = conv2d(x, c, padding=1)
        x = _group_norm(x, c["gn_scale"], c["gn_bias"])
        x = jax.nn.relu(x)
        i += 1
    return x


def fcos_head_forward(
    params: dict, feats: list[jnp.ndarray]
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Shared head over the selected pyramid levels.

    Returns (cls_logits [B, N, NC+1], ltrb [B, N, 4] (ReLU'd, as
    torchvision FCOSRegressionHead), ctrness [B, N]) concatenated over
    levels in (level, y, x) cell order — one reference point per cell.
    """
    cls_all, reg_all, ctr_all = [], [], []
    for feat in feats:
        b = feat.shape[0]
        ct = _run_tower(params["cls_tower"], feat)
        rt = _run_tower(params["reg_tower"], feat)
        logits = conv2d(ct, params["cls_logits"], padding=1)  # [B, K, H, W]
        reg = jax.nn.relu(conv2d(rt, params["bbox_reg"], padding=1))
        ctr = conv2d(rt, params["ctrness"], padding=1)  # [B, 1, H, W]
        h, w = logits.shape[-2:]
        cls_all.append(logits.transpose(0, 2, 3, 1).reshape(b, h * w, -1))
        reg_all.append(reg.transpose(0, 2, 3, 1).reshape(b, h * w, 4))
        ctr_all.append(ctr.transpose(0, 2, 3, 1).reshape(b, h * w))
    return (
        jnp.concatenate(cls_all, axis=1),
        jnp.concatenate(reg_all, axis=1),
        jnp.concatenate(ctr_all, axis=1),
    )


def fcos_match_single(
    anchors: jnp.ndarray,  # [N, 4] stride-sized square references
    level_counts: tuple[int, ...],
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_valid: jnp.ndarray,  # [G]
    center_sampling_radius: float,
) -> jnp.ndarray:
    """torchvision FCOS.compute_loss assignment for one image ->
    matched gt index per cell ([N], -1 = background)."""
    n = anchors.shape[0]
    ctr = 0.5 * (anchors[:, :2] + anchors[:, 2:])  # [N, 2]
    sizes = anchors[:, 2] - anchors[:, 0]  # [N]
    gt_ctr = 0.5 * (gt_boxes[:, :2] + gt_boxes[:, 2:])  # [G, 2]

    # center sampling: |cell center - gt center|_inf < r * anchor size
    match = (
        jnp.abs(ctr[:, None, :] - gt_ctr[None, :, :]).max(axis=2)
        < center_sampling_radius * sizes[:, None]
    )
    # cell center strictly inside the gt box
    dist = jnp.stack(
        [
            ctr[:, None, 0] - gt_boxes[None, :, 0],
            ctr[:, None, 1] - gt_boxes[None, :, 1],
            gt_boxes[None, :, 2] - ctr[:, None, 0],
            gt_boxes[None, :, 3] - ctr[:, None, 1],
        ],
        axis=2,
    )  # [N, G, 4]
    match &= dist.min(axis=2) > 0

    # per-level scale range on the max ltrb distance: size*[4, 8), with
    # the first level open below and the last open above
    lower = sizes * 4.0
    upper = sizes * 8.0
    lower = lower.at[: level_counts[0]].set(0.0)
    upper = upper.at[n - level_counts[-1]:].set(jnp.inf)
    max_dist = dist.max(axis=2)  # [N, G]
    match &= (max_dist > lower[:, None]) & (max_dist < upper[:, None])
    match &= gt_valid[None, :]

    # ties -> smallest-area gt (torchvision: match * (1e8 - area), argmax)
    areas = (gt_boxes[:, 2] - gt_boxes[:, 0]) * (gt_boxes[:, 3] - gt_boxes[:, 1])
    scored = match.astype(jnp.float32) * (1e8 - areas[None, :])
    best = scored.max(axis=1)
    idx = scored.argmax(axis=1)
    return jnp.where(best < 1e-5, -1, idx)


def fcos_loss(
    cls_logits: jnp.ndarray,  # [B, N, NC+1]
    ltrb: jnp.ndarray,  # [B, N, 4]
    ctrness: jnp.ndarray,  # [B, N]
    anchors: jnp.ndarray,  # [N, 4]
    level_counts: tuple[int, ...],
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_labels: jnp.ndarray,  # [B, G]
    gt_valid: jnp.ndarray,  # [B, G]
    budget: DetectionBudget,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """(loss_classification, loss_bbox_reg, loss_bbox_ctrness), each a
    sum over the whole batch / batch-global max(1, num_foreground)
    (torchvision FCOSHead.compute_loss)."""
    nc_bg = cls_logits.shape[-1]

    matched = jax.vmap(
        lambda gb, gv: fcos_match_single(
            anchors, level_counts, gb, gv, budget.fcos_center_sampling_radius
        )
    )(gt_boxes, gt_valid)  # [B, N]
    fg = matched >= 0
    num_fg = jnp.maximum(fg.sum(), 1).astype(jnp.float32)

    safe = jnp.maximum(matched, 0)
    tgt_labels = jnp.where(
        fg, jnp.take_along_axis(gt_labels, safe, axis=1), 0
    )  # [B, N]
    tgt_boxes = jnp.where(
        fg[..., None],
        jnp.take_along_axis(gt_boxes, safe[..., None], axis=1),
        jnp.broadcast_to(anchors[None], (matched.shape[0],) + anchors.shape),
    )  # [B, N, 4] (anchor itself off-fg keeps every ratio finite)

    onehot = jax.nn.one_hot(tgt_labels, nc_bg) * fg[..., None]
    loss_cls = sigmoid_focal_loss(cls_logits, onehot).sum() / num_fg

    pred_boxes = decode_boxes_linear(
        ltrb.astype(jnp.float32), jnp.broadcast_to(anchors[None], tgt_boxes.shape)
    )
    giou = generalized_box_iou(pred_boxes, tgt_boxes)
    loss_reg = jnp.where(fg, 1.0 - giou, 0.0).sum() / num_fg

    reg_targets = encode_boxes_linear(
        jnp.broadcast_to(anchors[None], tgt_boxes.shape), tgt_boxes
    )  # [B, N, 4] ltrb
    lr = reg_targets[..., jnp.array([0, 2])]
    tb = reg_targets[..., jnp.array([1, 3])]
    ratio = (lr.min(-1) * tb.min(-1)) / (
        jnp.maximum(lr.max(-1), 1e-12) * jnp.maximum(tb.max(-1), 1e-12)
    )
    ctr_targets = jnp.sqrt(jnp.maximum(ratio, 0.0))
    x = ctrness.astype(jnp.float32)
    bce = jnp.maximum(x, 0) - x * ctr_targets + jnp.log1p(jnp.exp(-jnp.abs(x)))
    loss_ctr = jnp.where(fg, bce, 0.0).sum() / num_fg
    return loss_cls, loss_reg, loss_ctr


def fcos_postprocess_single(
    cls_logits: jnp.ndarray,  # [N, NC+1]
    ltrb: jnp.ndarray,  # [N, 4]
    ctrness: jnp.ndarray,  # [N]
    anchors: jnp.ndarray,  # [N, 4]
    level_counts: tuple[int, ...],
    image_size: tuple[int, int],
    budget: DetectionBudget,
) -> Detections:
    """torchvision FCOS.postprocess_detections for one image, in static
    shapes: score = sqrt(cls_prob * ctr_prob), per-level threshold +
    top-k, linear decode, clip, class-aware NMS across levels."""
    nc = cls_logits.shape[-1] - 1
    boxes_parts, score_parts, label_parts = [], [], []
    start = 0
    for count in level_counts:
        logits = cls_logits[start : start + count].astype(jnp.float32)
        ctr = ctrness[start : start + count].astype(jnp.float32)
        scores = jnp.sqrt(
            jax.nn.sigmoid(logits) * jax.nn.sigmoid(ctr)[:, None]
        )
        flat = scores[:, 1:].reshape(count * nc)  # drop background channel
        cand = jnp.where(flat > budget.fcos_score_thresh, flat, -jnp.inf)
        k = min(budget.fcos_topk_candidates, count * nc)
        top_s, top_i = jax.lax.top_k(cand, k)
        a_idx = top_i // nc
        labels = (top_i % nc).astype(jnp.int32) + 1
        bx = decode_boxes_linear(
            ltrb[start : start + count].astype(jnp.float32)[a_idx],
            anchors[start : start + count][a_idx],
        )
        bx = clip_boxes_to_image(bx, image_size[0], image_size[1])
        boxes_parts.append(bx)
        score_parts.append(top_s)
        label_parts.append(labels)
        start += count

    boxes = jnp.concatenate(boxes_parts)
    scores = jnp.concatenate(score_parts)
    labels = jnp.concatenate(label_parts)
    valid = jnp.isfinite(scores)
    keep = batched_nms_mask(
        boxes, scores, labels, budget.fcos_nms_thresh, valid=valid,
        tile=budget.box_nms_tile,
    )
    final = jnp.where(keep, scores, -jnp.inf)
    d = min(budget.fcos_detections_per_img, final.shape[0])
    out_s, out_i = jax.lax.top_k(final, d)
    return Detections(
        boxes=boxes[out_i],
        scores=jnp.where(jnp.isfinite(out_s), out_s, 0.0),
        labels=labels[out_i],
        valid=jnp.isfinite(out_s),
    )
