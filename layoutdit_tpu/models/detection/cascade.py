"""Cascade R-CNN detection head (Cai & Vasconcelos, CVPR 2018).

BASELINE.json config #3 calls for "DiT-large + cascade detection head,
data-parallel over a v4-8 mesh" — a capability the reference repo does not
have (it builds a plain torchvision ``FasterRCNN``, model.py:45-55).  This
module adds the standard cascade formulation on top of the existing
static-shape RoI machinery:

  * N refinement stages (default 3) with increasing foreground IoU
    thresholds (0.5, 0.6, 0.7), each with its own TwoMLPHead + predictor;
  * class-agnostic box regression per stage (4 deltas, not (NC+1)*4) with
    per-stage BoxCoder weights (10,10,5,5) / (20,20,10,10) / (30,30,15,15);
  * training: stage 0 samples proposals exactly like Fast R-CNN
    (512 @ 25% positives); later stages re-label the *refined* boxes of the
    previous stage at the higher threshold with no re-sampling, and the
    refined boxes are detached (stop_gradient) between stages;
  * inference: boxes are refined through all stages; class scores are the
    mean of every stage's softmax evaluated on that stage's input boxes.

Everything is padded/masked static-shape so the whole cascade jits and
shards like the base detector (vmapped per-image, batch on the data mesh
axis).
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
)

# Per-stage defaults from the Cascade R-CNN paper (§4.2) as adopted by
# detectron2/mmdetection.
DEFAULT_STAGE_IOUS = (0.5, 0.6, 0.7)
DEFAULT_STAGE_REG_WEIGHTS = (
    (10.0, 10.0, 5.0, 5.0),
    (20.0, 20.0, 10.0, 10.0),
    (30.0, 30.0, 15.0, 15.0),
)
DEFAULT_STAGE_LOSS_WEIGHTS = (1.0, 0.5, 0.25)


class StageTargets(NamedTuple):
    labels: jnp.ndarray  # [S] int (0 = background)
    reg_targets: jnp.ndarray  # [S, 4]


def match_boxes_to_gt_single(
    boxes: jnp.ndarray,  # [S, 4] current-stage input boxes
    box_valid: jnp.ndarray,  # [S]
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_labels: jnp.ndarray,  # [G]
    gt_valid: jnp.ndarray,  # [G]
    fg_iou_thresh: float,
    reg_weights: tuple[float, float, float, float],
) -> StageTargets:
    """Re-label refined boxes for a later cascade stage (one image).

    detectron2 ``CascadeROIHeads._match_and_label_boxes`` semantics: every
    valid box is matched to its best gt; >= thresh -> that gt's class,
    otherwise background. No sampling, no gt appending (gt boxes were
    already added to the stage-0 candidate set).
    """
    iou = box_iou(gt_boxes, boxes)  # [G, S]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    iou = jnp.where(box_valid[None, :], iou, -1.0)
    matched_vals = iou.max(axis=0)
    matched_idx = iou.argmax(axis=0)

    is_pos = box_valid & (matched_vals >= fg_iou_thresh) & gt_valid.any()
    labels = jnp.where(is_pos, gt_labels[matched_idx].astype(jnp.int32), 0)
    reg_targets = encode_boxes(gt_boxes[matched_idx], boxes, reg_weights)
    reg_targets = jnp.where(is_pos[:, None], reg_targets, 0.0)
    return StageTargets(labels=labels, reg_targets=reg_targets)


def cascade_stage_loss(
    class_logits: jnp.ndarray,  # [B, S, NC+1]
    box_regression: jnp.ndarray,  # [B, S, 4] (class-agnostic)
    labels: jnp.ndarray,  # [B, S]
    reg_targets: jnp.ndarray,  # [B, S, 4]
    valid: jnp.ndarray,  # [B, S]
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Fast R-CNN loss pair for one cascade stage.

    Same normalisation as ``fastrcnn_loss`` (CE mean over sampled slots;
    smooth_l1 sum over positives / num sampled) but with a single
    regression branch shared by all classes.
    """
    num = jnp.maximum(valid.sum(), 1)
    logp = jax.nn.log_softmax(class_logits.astype(jnp.float32), axis=-1)
    ce = -jnp.take_along_axis(logp, labels[..., None], axis=-1)[..., 0]
    loss_cls = jnp.where(valid, ce, 0.0).sum() / num

    pos = valid & (labels > 0)
    l1 = smooth_l1(
        box_regression.astype(jnp.float32) - reg_targets, beta=1.0 / 9
    ).sum(-1)
    loss_box = jnp.where(pos, l1, 0.0).sum() / num
    return loss_cls, loss_box


def refine_boxes(
    boxes: jnp.ndarray,  # [..., 4]
    deltas: jnp.ndarray,  # [..., 4] class-agnostic
    reg_weights: tuple[float, float, float, float],
    image_size: tuple[int, int],
) -> jnp.ndarray:
    """Apply a stage's class-agnostic regression and clip to the image."""
    out = decode_boxes(deltas.astype(jnp.float32), boxes, reg_weights)
    return clip_boxes_to_image(out, image_size[0], image_size[1])


def cascade_mean_scores(per_stage_logits: list[jnp.ndarray]) -> jnp.ndarray:
    """Average the stages' class posteriors (fp32 softmax per stage)."""
    probs = [
        jax.nn.softmax(l.astype(jnp.float32), axis=-1) for l in per_stage_logits
    ]
    return sum(probs) / len(probs)


def postprocess_cascade_single(
    scores: jnp.ndarray,  # [P, NC+1] stage-averaged posteriors
    boxes: jnp.ndarray,  # [P, 4] final refined boxes (already clipped)
    prop_valid: jnp.ndarray,  # [P]
    budget: DetectionBudget,
) -> "Detections":
    """Per-class NMS + top-k for the cascade's single-box-per-proposal
    output (torchvision postprocess semantics with the box shared across
    classes)."""
    from layoutdit_tpu.models.detection.roi_heads import Detections
    from layoutdit_tpu.ops.boxes import small_box_mask
    from layoutdit_tpu.ops.nms import batched_nms_mask

    p, nc_bg = scores.shape
    nc = nc_bg - 1

    flat_scores = scores[:, 1:].reshape(p * nc)
    flat_boxes = jnp.repeat(boxes, nc, axis=0)  # [P*NC, 4] same box per class
    labels = jnp.tile(jnp.arange(1, nc_bg, dtype=jnp.int32), (p,))

    valid = (
        jnp.repeat(prop_valid, nc)
        & (flat_scores > budget.box_score_thresh)
        & small_box_mask(flat_boxes, 1e-2)
    )
    cand_scores = jnp.where(valid, flat_scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(cand_scores, p * nc)
    flat_boxes, labels = flat_boxes[top_idx], labels[top_idx]
    cand_valid = jnp.isfinite(top_scores)

    keep = batched_nms_mask(
        flat_boxes, top_scores, labels, budget.box_nms_thresh,
        valid=cand_valid, tile=budget.box_nms_tile,
    )
    final_scores = jnp.where(keep, top_scores, -jnp.inf)
    out_scores, out_idx = jax.lax.top_k(final_scores, budget.box_detections_per_img)
    return Detections(
        boxes=flat_boxes[out_idx],
        scores=jnp.where(jnp.isfinite(out_scores), out_scores, 0.0),
        labels=labels[out_idx],
        valid=jnp.isfinite(out_scores),
    )
