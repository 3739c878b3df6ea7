"""RoI heads: training-sample selection, Fast R-CNN loss, detection
postprocess — torchvision RoIHeads parity in static shapes.

The reference relies on torchvision's RoIHeads inside ``FasterRCNN``
(model.py:45-55): match proposals to gt at IoU 0.5 (gt boxes appended to
the proposal set), sample 512 @ 25% positives, box-regression weights
(10, 10, 5, 5); at inference softmax -> per-class decode -> clip ->
score/size filters -> per-class NMS(0.5) -> top-100. Everything here is
padded/masked instead of dynamically shaped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.detection.rpn import smooth_l1
from layoutdit_tpu.ops.boxes import (
    box_iou,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    small_box_mask,
)
from layoutdit_tpu.ops.nms import batched_nms_mask


class TrainingSamples(NamedTuple):
    rois: jnp.ndarray  # [S, 4]
    valid: jnp.ndarray  # [S]
    labels: jnp.ndarray  # [S] int (0 = background)
    reg_targets: jnp.ndarray  # [S, 4]
    # index of the matched GT row for each slot (0 where background /
    # invalid — only meaningful where labels > 0); feeds the Mask R-CNN
    # branch's target projection. Defaulted so constructors that predate
    # the mask branch (golden tests) stay valid.
    matched_gt: jnp.ndarray | None = None


def select_training_samples_single(
    proposals: jnp.ndarray,  # [P, 4]
    prop_valid: jnp.ndarray,  # [P]
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_labels: jnp.ndarray,  # [G]
    gt_valid: jnp.ndarray,  # [G]
    budget: DetectionBudget,
    rng: jax.Array,
) -> TrainingSamples:
    """torchvision RoIHeads.select_training_samples for one image."""
    s = budget.box_batch_size_per_image
    max_pos = int(s * budget.box_positive_fraction)

    # append gt to proposals (roi_heads.add_gt_proposals)
    cand = jnp.concatenate([proposals, gt_boxes], axis=0)
    cand_valid = jnp.concatenate([prop_valid, gt_valid], axis=0)

    iou = box_iou(gt_boxes, cand)  # [G, P+G]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    iou = jnp.where(cand_valid[None, :], iou, -1.0)
    matched_vals = iou.max(axis=0)
    matched_idx = iou.argmax(axis=0)

    any_gt = gt_valid.any()
    # Matcher(0.5, 0.5, False): >= fg -> positive, else background.
    is_pos = cand_valid & (matched_vals >= budget.box_fg_iou_thresh) & any_gt
    is_neg = cand_valid & ~is_pos

    k_pos, k_neg = jax.random.split(rng)
    n = cand.shape[0]
    num_pos = jnp.minimum(is_pos.sum(), max_pos)
    num_neg = jnp.minimum(is_neg.sum(), s - num_pos)

    pri_pos = jnp.where(is_pos, jax.random.uniform(k_pos, (n,)), -jnp.inf)
    pri_neg = jnp.where(is_neg, jax.random.uniform(k_neg, (n,)), -jnp.inf)
    _, pos_idx = jax.lax.top_k(pri_pos, s)  # static s slots of pos candidates
    _, neg_idx = jax.lax.top_k(pri_neg, s)

    slot = jnp.arange(s)
    take_pos = slot < num_pos
    idx = jnp.where(take_pos, pos_idx, neg_idx[jnp.maximum(slot - num_pos, 0)])
    valid = take_pos | (slot - num_pos < num_neg)

    rois = cand[idx]
    m = matched_idx[idx]
    labels = jnp.where(
        take_pos, gt_labels[m].astype(jnp.int32), 0
    ) * valid.astype(jnp.int32)
    reg_targets = encode_boxes(gt_boxes[m], rois, budget.box_reg_weights)
    reg_targets = jnp.where(take_pos[:, None], reg_targets, 0.0)
    return TrainingSamples(
        rois=rois, valid=valid, labels=labels, reg_targets=reg_targets,
        matched_gt=jnp.where(take_pos, m, 0),
    )


def fastrcnn_loss(
    class_logits: jnp.ndarray,  # [B, S, NC+1]
    box_regression: jnp.ndarray,  # [B, S, (NC+1)*4]
    samples: TrainingSamples,  # batched [B, S, ...]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_classifier, loss_box_reg), torchvision fastrcnn_loss:
    CE mean over sampled; smooth_l1(beta=1/9, sum over positives'
    matched-class deltas) / num sampled."""
    b, s, nc_bg = class_logits.shape
    valid = samples.valid
    num = jnp.maximum(valid.sum(), 1)

    logits32 = class_logits.astype(jnp.float32)
    logp = jax.nn.log_softmax(logits32, axis=-1)
    ce = -jnp.take_along_axis(logp, samples.labels[..., None], axis=-1)[..., 0]
    loss_cls = jnp.where(valid, ce, 0.0).sum() / num

    pos = valid & (samples.labels > 0)
    reg = box_regression.astype(jnp.float32).reshape(b, s, nc_bg, 4)
    cls_idx = jnp.maximum(samples.labels, 0)
    reg_for_label = jnp.take_along_axis(
        reg, cls_idx[..., None, None].repeat(4, -1), axis=2
    )[:, :, 0, :]
    l1 = smooth_l1(reg_for_label - samples.reg_targets, beta=1.0 / 9).sum(-1)
    loss_box = jnp.where(pos, l1, 0.0).sum() / num
    return loss_cls, loss_box


class Detections(NamedTuple):
    boxes: jnp.ndarray  # [D, 4]
    scores: jnp.ndarray  # [D]
    labels: jnp.ndarray  # [D] int (1..NC)
    valid: jnp.ndarray  # [D] bool


def postprocess_detections_single(
    class_logits: jnp.ndarray,  # [P, NC+1]
    box_regression: jnp.ndarray,  # [P, (NC+1)*4]
    proposals: jnp.ndarray,  # [P, 4]
    prop_valid: jnp.ndarray,  # [P]
    image_size: tuple[int, int],
    budget: DetectionBudget,
    pre_nms_candidates: int | None = None,
) -> Detections:
    """torchvision RoIHeads.postprocess_detections for one image."""
    p, nc_bg = class_logits.shape
    nc = nc_bg - 1

    scores = jax.nn.softmax(class_logits.astype(jnp.float32), axis=-1)
    boxes = decode_boxes(
        box_regression.astype(jnp.float32).reshape(p, nc_bg, 4),
        proposals[:, None, :],
        budget.box_reg_weights,
    )
    boxes = clip_boxes_to_image(boxes, image_size[0], image_size[1])

    # drop background column, flatten to [P*NC]
    boxes = boxes[:, 1:, :].reshape(p * nc, 4)
    scores = scores[:, 1:].reshape(p * nc)
    labels = jnp.tile(jnp.arange(1, nc_bg, dtype=jnp.int32), (p,))

    valid = (
        jnp.repeat(prop_valid, nc)
        & (scores > budget.box_score_thresh)
        & small_box_mask(boxes, 1e-2)
    )

    # torchvision runs NMS on ALL score-threshold survivors (up to P*NC);
    # default to that so the static cap can never drop candidates the
    # reference would have kept (an explicit lower cap stays available
    # as a serving-time knob).
    k = p * nc if pre_nms_candidates is None else min(pre_nms_candidates, p * nc)
    cand_scores = jnp.where(valid, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(cand_scores, k)
    boxes, labels = boxes[top_idx], labels[top_idx]
    cand_valid = jnp.isfinite(top_scores)

    keep = batched_nms_mask(
        boxes, top_scores, labels, budget.box_nms_thresh, valid=cand_valid,
        tile=budget.box_nms_tile,
    )
    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    d = budget.box_detections_per_img
    out_scores, out_idx = jax.lax.top_k(final_scores, d)
    return Detections(
        boxes=boxes[out_idx],
        scores=jnp.where(jnp.isfinite(out_scores), out_scores, 0.0),
        labels=labels[out_idx],
        valid=jnp.isfinite(out_scores),
    )
