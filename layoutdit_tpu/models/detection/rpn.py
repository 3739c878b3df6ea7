"""Region Proposal Network: proposal filtering, target assignment, loss.

TPU-native reimplementation of torchvision's RegionProposalNetwork (used
implicitly by the reference via ``FasterRCNN(...)``, model.py:45-55). The
torchvision pipeline is dynamic-shape (variable proposals per image); here
every stage has a static budget with validity masks (SURVEY.md §7 hard
part #1):

  filter_proposals:  per-level top-k -> decode -> clip -> small/score
  masks -> level-wise NMS (one fused batched scan) -> top post_nms_top_n
  (padded, with valid mask).

  training: anchor<->gt IoU matcher (with low-quality matches), balanced
  256@0.5 sampling via random-priority top-k, BCE objectness + smooth-L1
  (beta=1/9) box loss normalized over the whole batch's sampled count —
  all matching torchvision numerics.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.ops.boxes import (
    box_iou,
    clip_boxes_to_image,
    decode_boxes,
    encode_boxes,
    small_box_mask,
)
from layoutdit_tpu.ops.nms import batched_nms_mask, nms_mask


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # [B, P, 4]
    scores: jnp.ndarray  # [B, P] sigmoid objectness (-inf for padding)
    valid: jnp.ndarray  # [B, P] bool


def _per_level_topk(
    objectness: jnp.ndarray,
    deltas: jnp.ndarray,
    anchors: jnp.ndarray,
    level_counts: tuple[int, ...],
    pre_nms_top_n: int,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Single image: select top min(pre_nms_top_n, n_level) per level.

    Returns concatenated (logits [K], deltas [K,4], anchors [K,4],
    level_ids [K]) with static K = sum of per-level top-k sizes.
    """
    parts = []
    start = 0
    for li, count in enumerate(level_counts):
        k = min(pre_nms_top_n, count)
        ob = jax.lax.dynamic_slice_in_dim(objectness, start, count)
        dl = jax.lax.dynamic_slice_in_dim(deltas, start, count)
        an = jax.lax.dynamic_slice_in_dim(anchors, start, count)
        if k == count:
            # whole level selected: skip the sort (NMS re-sorts its slice
            # and the final top-k orders globally, so only tie-breaking
            # among exactly-equal scores could differ — measured ~0.2 ms
            # across the three small FPN levels)
            parts.append((ob, dl, an, jnp.full((k,), li, jnp.int32)))
        else:
            top_v, top_i = jax.lax.top_k(ob, k)
            parts.append(
                (top_v, dl[top_i], an[top_i], jnp.full((k,), li, jnp.int32))
            )
        start += count
    logits = jnp.concatenate([p[0] for p in parts])
    d = jnp.concatenate([p[1] for p in parts])
    a = jnp.concatenate([p[2] for p in parts])
    lv = jnp.concatenate([p[3] for p in parts])
    return logits, d, a, lv


def filter_proposals_single(
    objectness: jnp.ndarray,  # [N]
    deltas: jnp.ndarray,  # [N, 4]
    anchors: jnp.ndarray,  # [N, 4]
    level_counts: tuple[int, ...],
    image_size: tuple[int, int],
    budget: DetectionBudget,
    training: bool,
) -> Proposals:
    pre_n = budget.rpn_pre_nms_top_n_train if training else budget.rpn_pre_nms_top_n_test
    post_n = budget.rpn_post_nms_top_n_train if training else budget.rpn_post_nms_top_n_test

    logits, d, a, lv = _per_level_topk(
        objectness, deltas, anchors, level_counts, pre_n
    )
    boxes = decode_boxes(d.astype(jnp.float32), a)
    boxes = clip_boxes_to_image(boxes, image_size[0], image_size[1])
    scores = jax.nn.sigmoid(logits.astype(jnp.float32))
    valid = small_box_mask(boxes, budget.rpn_min_size)
    valid &= scores >= budget.rpn_score_thresh

    # Level-wise NMS (torchvision batched_nms over FPN levels). Levels are
    # CONTIGUOUS here, so instead of the coordinate-offset trick on one
    # merged N-box problem (whose O(N^2) overlap bitmask is ~2.7x larger
    # than the sum of the per-level blocks) run exact NMS per level slice —
    # cross-level pairs never suppress either way.
    keep_parts = []
    start = 0
    for count in level_counts:
        k = min(pre_n, count)
        keep_parts.append(
            nms_mask(
                boxes[start : start + k],
                scores[start : start + k],
                budget.rpn_nms_thresh,
                valid=valid[start : start + k],
                tile=budget.rpn_nms_tile,
            )
        )
        start += k
    keep = jnp.concatenate(keep_parts)
    sort_scores = jnp.where(keep, scores, -jnp.inf)
    top_scores, top_idx = jax.lax.top_k(sort_scores, post_n)
    return Proposals(
        boxes=boxes[top_idx],
        scores=top_scores,
        valid=jnp.isfinite(top_scores),
    )


def filter_proposals(
    objectness: jnp.ndarray,  # [B, N]
    deltas: jnp.ndarray,  # [B, N, 4]
    anchors: jnp.ndarray,  # [N, 4]
    level_counts: tuple[int, ...],
    image_size: tuple[int, int],
    budget: DetectionBudget,
    training: bool,
) -> Proposals:
    # objectness is used only for ranking — detach as torchvision does
    # (rpn.py: objectness.detach()).
    fn = lambda ob, dl: filter_proposals_single(  # noqa: E731
        jax.lax.stop_gradient(ob), jax.lax.stop_gradient(dl),
        anchors, level_counts, image_size, budget, training,
    )
    return jax.vmap(fn)(objectness, deltas)


# ------------------------------------------------------------------ targets


def match_anchors_to_gt(
    anchors: jnp.ndarray,  # [N, 4]
    gt_boxes: jnp.ndarray,  # [G, 4]
    gt_valid: jnp.ndarray,  # [G]
    high_thresh: float,
    low_thresh: float,
    allow_low_quality: bool,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """torchvision Matcher. Returns (matched_idx [N], labels [N]) where
    labels: 1 = positive, 0 = negative, -1 = ignore."""
    iou = box_iou(gt_boxes, anchors)  # [G, N]
    iou = jnp.where(gt_valid[:, None], iou, -1.0)
    matched_vals = iou.max(axis=0)
    matched_idx = iou.argmax(axis=0)

    labels = jnp.where(
        matched_vals >= high_thresh,
        1,
        jnp.where(matched_vals < low_thresh, 0, -1),
    )
    if allow_low_quality:
        # torchvision Matcher.set_low_quality_matches_: every anchor that
        # ties a gt's best IoU has its (argmax) match restored — i.e. it
        # becomes positive — with NO >0 guard: a gt whose best IoU is 0
        # marks every zero-IoU anchor positive, exactly as torchvision does.
        highest_per_gt = iou.max(axis=1)  # [G]
        ties = (iou == highest_per_gt[:, None]) & gt_valid[:, None]
        low_quality = ties.any(axis=0)
        labels = jnp.where(low_quality, 1, labels)
    # no valid gt at all -> everything background
    any_gt = gt_valid.any()
    labels = jnp.where(any_gt, labels, 0)
    return matched_idx, labels


def balanced_sample(
    labels: jnp.ndarray,  # [N] in {1, 0, -1}
    rng: jax.Array,
    batch_size: int,
    positive_fraction: float,
) -> jnp.ndarray:
    """torchvision BalancedPositiveNegativeSampler -> sampled mask [N]
    (True = participates in the loss)."""
    n = labels.shape[0]
    k_pos, k_neg = jax.random.split(rng)
    pos = labels == 1
    neg = labels == 0
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(pos.sum(), max_pos)
    num_neg = jnp.minimum(neg.sum(), batch_size - num_pos)

    def pick(mask, key, k_static, num):
        pri = jnp.where(mask, jax.random.uniform(key, (n,)), -jnp.inf)
        _, idx = jax.lax.top_k(pri, k_static)
        sel = jnp.zeros((n,), bool).at[idx].set(jnp.arange(k_static) < num)
        return sel & mask

    return pick(pos, k_pos, max_pos, num_pos) | pick(
        neg, k_neg, batch_size, num_neg
    )


def balanced_sample_with_pos(
    labels: jnp.ndarray,  # [N] in {1, 0, -1}
    rng: jax.Array,
    batch_size: int,
    positive_fraction: float,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """``balanced_sample`` (identical RNG stream and selection) that also
    returns the positive slots as INDICES so the box-regression targets
    can be computed on [max_pos] rows instead of all N anchors (the
    full-anchor encode+gather measured 0.84 ms/step at bs16 —
    scripts/trace_step.py fusion.4929).

    Returns (sampled_mask [N], pos_idx [max_pos], pos_take [max_pos])."""
    n = labels.shape[0]
    k_pos, k_neg = jax.random.split(rng)
    pos = labels == 1
    neg = labels == 0
    max_pos = int(batch_size * positive_fraction)
    num_pos = jnp.minimum(pos.sum(), max_pos)
    num_neg = jnp.minimum(neg.sum(), batch_size - num_pos)

    pri_pos = jnp.where(pos, jax.random.uniform(k_pos, (n,)), -jnp.inf)
    _, pos_idx = jax.lax.top_k(pri_pos, max_pos)
    pos_take = jnp.arange(max_pos) < num_pos

    pri_neg = jnp.where(neg, jax.random.uniform(k_neg, (n,)), -jnp.inf)
    _, neg_idx = jax.lax.top_k(pri_neg, batch_size)
    neg_take = jnp.arange(batch_size) < num_neg

    mask = jnp.zeros((n,), bool).at[pos_idx].set(pos_take) | jnp.zeros(
        (n,), bool
    ).at[neg_idx].set(neg_take)
    return mask, pos_idx, pos_take


def smooth_l1(x: jnp.ndarray, beta: float) -> jnp.ndarray:
    ax = jnp.abs(x)
    return jnp.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


def rpn_loss(
    objectness: jnp.ndarray,  # [B, N] logits
    deltas: jnp.ndarray,  # [B, N, 4]
    anchors: jnp.ndarray,  # [N, 4]
    gt_boxes: jnp.ndarray,  # [B, G, 4]
    gt_valid: jnp.ndarray,  # [B, G]
    budget: DetectionBudget,
    rng: jax.Array,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """(loss_objectness, loss_rpn_box_reg) — torchvision compute_loss:
    BCE mean over sampled; smooth_l1(beta=1/9, sum over positives) /
    total sampled, both normalized across the whole batch."""
    b = objectness.shape[0]

    def per_image(gt_b, gt_v, dl, key):
        midx, labels = match_anchors_to_gt(
            anchors, gt_b, gt_v,
            budget.rpn_fg_iou_thresh, budget.rpn_bg_iou_thresh,
            allow_low_quality=True,
        )
        sampled, pos_idx, pos_take = balanced_sample_with_pos(
            labels, key, budget.rpn_batch_size_per_image,
            budget.rpn_positive_fraction,
        )
        # Regression targets ONLY at the sampled positive slots
        # ([max_pos] rows) — numerically identical to encoding all N
        # anchors and masking, at ~1/100 of the gather/encode volume.
        reg_targets = encode_boxes(gt_b[midx[pos_idx]], anchors[pos_idx])
        l1 = smooth_l1(
            dl[pos_idx].astype(jnp.float32) - reg_targets, beta=1.0 / 9
        ).sum(-1)
        l1_sum = jnp.where(pos_take, l1, 0.0).sum()
        return labels, sampled, l1_sum

    keys = jax.random.split(rng, b)
    labels, sampled, l1_sums = jax.vmap(per_image)(
        gt_boxes, gt_valid, deltas, keys
    )

    num_sampled = jnp.maximum(sampled.sum(), 1)

    ob32 = objectness.astype(jnp.float32)
    bce = jnp.maximum(ob32, 0) - ob32 * (labels == 1) + jnp.log1p(
        jnp.exp(-jnp.abs(ob32))
    )
    loss_obj = jnp.where(sampled, bce, 0.0).sum() / num_sampled

    loss_box = l1_sums.sum() / num_sampled
    return loss_obj, loss_box
