"""RetinaNet single-stage detection head — a beyond-reference model family.

The reference is two-stage-only (torchvision ``FasterRCNN`` assembled at
/root/reference/src/layoutdit/modeling/model.py:45-55). This module adds a
single-stage alternative with torchvision RetinaNet semantics — the natural
TPU fit: no proposal filtering, no RoI pooling, no per-image sampling; every
training-time stage is dense, static-shape math over the anchor grid.

Semantics matched to torchvision ``models.detection.retinanet``:

  * classification subnet: 4x (conv3x3 C->C + ReLU) -> conv3x3 to A*(NC+1)
    per-anchor sigmoid class logits; weights normal(std=0.01), final cls
    bias set to the focal prior -log((1-p)/p), p=0.01
  * regression subnet: 4x (conv3x3 C->C + ReLU) -> conv3x3 to A*4 deltas;
    same init, zero bias; BoxCoder weights (1, 1, 1, 1)
  * matcher fg 0.5 / bg 0.4 with low-quality matches (the shared
    torchvision Matcher already built for the RPN, rpn.match_anchors_to_gt)
  * loss: sigmoid focal loss (alpha 0.25, gamma 2.0) summed over all
    non-ignored anchors + L1 summed over foreground anchors, each
    normalized per image by max(1, num_foreground) and then averaged over
    the batch (RetinaNetClassificationHead / RetinaNetRegressionHead
    .compute_loss)
  * inference: per level, score-threshold filter -> top ``topk_candidates``
    -> decode -> clip; across levels, class-aware NMS -> top
    ``detections_per_img`` (RetinaNet.postprocess_detections)

Deliberate, documented divergences:

  * Pyramid: torchvision's retinanet_resnet50_fpn builds P3..P7
    (strides 8..128) with LastLevelP6P7. Here the head runs on a
    configurable subset of the SHARED framework pyramid p2..p5+pool
    (strides 4..64 at 224 px) so the DiT/ResNet backbone + FPN stay one
    tested implementation; the default subset (1, 2, 3, 4) = strides
    8..64 mirrors torchvision's stride range minus the 128 tail (a 224 px
    page has no 128-stride cells to spare).
  * The background channel (class 0, never a focal-loss target — one-hot
    targets index gt labels 1..NC directly, exactly as torchvision) is
    EXCLUDED from inference candidates. torchvision keeps it as an
    untrained channel whose sigmoid scores clear score_thresh only on an
    untrained model; excluding it keeps this framework's labels-1..NC
    Detections contract.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.detection.rpn import match_anchors_to_gt
from layoutdit_tpu.models.detection.roi_heads import Detections
from layoutdit_tpu.models.fpn import conv2d
from layoutdit_tpu.ops.boxes import (
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
)
from layoutdit_tpu.ops.nms import batched_nms_mask

FOCAL_ALPHA = 0.25
FOCAL_GAMMA = 2.0
PRIOR_PROBABILITY = 0.01


def _normal_conv(key, out_ch, in_ch, k, std=0.01):
    return jax.random.normal(key, (out_ch, in_ch, k, k), jnp.float32) * std


def init_retinanet_head_params(
    key: jax.Array,
    in_channels: int,
    num_anchors: int,
    num_classes_bg: int,
    num_convs: int = 4,
) -> dict:
    """Both subnets (torchvision RetinaNetHead): every conv
    normal(std=0.01); biases zero except the final classification bias,
    set to -log((1-p)/p) so every anchor starts predicting the focal
    prior p=0.01 for every class."""
    k_cls, k_reg = jax.random.split(key)

    def subnet(k, out_final, final_bias):
        keys = jax.random.split(k, num_convs + 1)
        p: dict = {}
        for i in range(num_convs):
            p[f"conv{i + 1}"] = {
                "kernel": _normal_conv(keys[i], in_channels, in_channels, 3),
                "bias": jnp.zeros((in_channels,), jnp.float32),
            }
        p["final"] = {
            "kernel": _normal_conv(keys[num_convs], out_final, in_channels, 3),
            "bias": jnp.full((out_final,), final_bias, jnp.float32),
        }
        return p

    prior_bias = -math.log((1.0 - PRIOR_PROBABILITY) / PRIOR_PROBABILITY)
    return {
        "cls": subnet(k_cls, num_anchors * num_classes_bg, prior_bias),
        "reg": subnet(k_reg, num_anchors * 4, 0.0),
    }


def _run_subnet(p: dict, feat: jnp.ndarray) -> jnp.ndarray:
    x = feat
    i = 1
    while f"conv{i}" in p:
        x = jax.nn.relu(conv2d(x, p[f"conv{i}"], padding=1))
        i += 1
    return conv2d(x, p["final"], padding=1)


def retinanet_head_forward(
    params: dict, feats: list[jnp.ndarray], num_anchors: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shared head over the selected pyramid levels.

    Returns (cls_logits [B, N, NC+1], deltas [B, N, 4]) concatenated over
    levels in (level, y, x, anchor) order — aligned with
    anchors.grid_anchors exactly as torchvision's
    RetinaNetHead view/permute/reshape produces.
    """
    cls_all, reg_all = [], []
    for feat in feats:
        b = feat.shape[0]
        logits = _run_subnet(params["cls"], feat)  # [B, A*K, H, W]
        deltas = _run_subnet(params["reg"], feat)  # [B, A*4, H, W]
        h, w = logits.shape[-2:]
        k = logits.shape[1] // num_anchors
        cls_all.append(
            logits.reshape(b, num_anchors, k, h, w)
            .transpose(0, 3, 4, 1, 2)
            .reshape(b, h * w * num_anchors, k)
        )
        reg_all.append(
            deltas.reshape(b, num_anchors, 4, h, w)
            .transpose(0, 3, 4, 1, 2)
            .reshape(b, h * w * num_anchors, 4)
        )
    return jnp.concatenate(cls_all, axis=1), jnp.concatenate(reg_all, axis=1)


def sigmoid_focal_loss(
    logits: jnp.ndarray,
    targets: jnp.ndarray,
    alpha: float = FOCAL_ALPHA,
    gamma: float = FOCAL_GAMMA,
) -> jnp.ndarray:
    """Elementwise focal loss (torchvision ops.sigmoid_focal_loss,
    reduction='none'); compute in fp32."""
    x = logits.astype(jnp.float32)
    t = targets.astype(jnp.float32)
    p = jax.nn.sigmoid(x)
    # numerically-stable BCE with logits
    ce = jnp.maximum(x, 0) - x * t + jnp.log1p(jnp.exp(-jnp.abs(x)))
    p_t = p * t + (1.0 - p) * (1.0 - t)
    loss = ce * (1.0 - p_t) ** gamma
    if alpha >= 0:
        alpha_t = alpha * t + (1.0 - alpha) * (1.0 - t)
        loss = alpha_t * loss
    return loss


def retinanet_loss(
    cls_logits: jnp.ndarray,  # [B, N, NC+1]
    deltas: jnp.ndarray,  # [B, N, 4]
    anchors: jnp.ndarray,  # [N, 4]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_labels: jnp.ndarray,  # [B, G] int 1..NC
    gt_valid: jnp.ndarray,  # [B, G]
    budget: DetectionBudget,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_classification, loss_bbox_reg) with torchvision's per-image
    normalization: each image's sums divide by its own max(1, num_fg),
    then the per-image losses average over the batch."""
    nc_bg = cls_logits.shape[-1]

    def per_image(logits, dl, gt_b, gt_l, gt_v):
        midx, labels = match_anchors_to_gt(
            anchors, gt_b, gt_v,
            budget.retinanet_fg_iou_thresh, budget.retinanet_bg_iou_thresh,
            allow_low_quality=True,
        )
        fg = labels == 1
        valid_cls = labels != -1  # ignore band excluded, fg+bg kept
        num_fg = jnp.maximum(fg.sum(), 1).astype(jnp.float32)

        # one-hot targets at the matched gt LABEL (1..NC indexes the
        # channel directly; channel 0 is never a target — torchvision
        # RetinaNetClassificationHead.compute_loss)
        target_cls = jnp.where(fg, gt_l[midx], 0)
        onehot = jax.nn.one_hot(target_cls, nc_bg) * fg[:, None]
        focal = sigmoid_focal_loss(logits, onehot)
        loss_cls = jnp.where(valid_cls[:, None], focal, 0.0).sum() / num_fg

        # L1 on foreground anchors; matched gt replaced by the anchor
        # itself off-foreground so encode's log() stays finite under the
        # masked sum (padded gt rows are degenerate [0,0,0,0] boxes).
        gt_matched = jnp.where(fg[:, None], gt_b[midx], anchors)
        targets = encode_boxes(gt_matched, anchors)
        l1 = jnp.abs(dl.astype(jnp.float32) - targets).sum(-1)
        loss_reg = jnp.where(fg, l1, 0.0).sum() / num_fg
        return loss_cls, loss_reg

    loss_cls, loss_reg = jax.vmap(per_image)(
        cls_logits, deltas, gt_boxes, gt_labels, gt_valid
    )
    return loss_cls.mean(), loss_reg.mean()


def retinanet_postprocess_single(
    cls_logits: jnp.ndarray,  # [N, NC+1]
    deltas: jnp.ndarray,  # [N, 4]
    anchors: jnp.ndarray,  # [N, 4]
    level_counts: tuple[int, ...],
    image_size: tuple[int, int],
    budget: DetectionBudget,
) -> Detections:
    """torchvision RetinaNet.postprocess_detections for one image, in
    static shapes: per level score-filter + top-k candidates, decode,
    clip; across levels class-aware NMS + final top-k."""
    nc = cls_logits.shape[-1] - 1
    boxes_parts, score_parts, label_parts = [], [], []
    start = 0
    for count in level_counts:
        logits = cls_logits[start : start + count]
        scores = jax.nn.sigmoid(logits.astype(jnp.float32))
        # drop the untrained background channel (module docstring)
        flat = scores[:, 1:].reshape(count * nc)
        cand = jnp.where(flat > budget.retinanet_score_thresh, flat, -jnp.inf)
        k = min(budget.retinanet_topk_candidates, count * nc)
        top_s, top_i = jax.lax.top_k(cand, k)
        a_idx = top_i // nc
        labels = (top_i % nc).astype(jnp.int32) + 1
        bx = decode_boxes(
            deltas[start : start + count].astype(jnp.float32)[a_idx],
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
        boxes, scores, labels, budget.retinanet_nms_thresh, valid=valid,
        tile=budget.box_nms_tile,
    )
    final = jnp.where(keep, scores, -jnp.inf)
    d = min(budget.retinanet_detections_per_img, final.shape[0])
    out_s, out_i = jax.lax.top_k(final, d)
    return Detections(
        boxes=boxes[out_i],
        scores=jnp.where(jnp.isfinite(out_s), out_s, 0.0),
        labels=labels[out_i],
        valid=jnp.isfinite(out_s),
    )
