"""Golden-transcription parity tests for the RPN / RoI-head stages.

The composed detector delegates these behaviors to torchvision in the
reference (FasterRCNN assembly, /root/reference/src/layoutdit/modeling/
model.py:45-55). torchvision itself is not installed here, so each stage
is transcribed literally into numpy from torchvision 0.19's
``RegionProposalNetwork._get_top_n_idx`` / ``filter_proposals``,
``Matcher`` (+ ``set_low_quality_matches_``), ``RegionProposalNetwork.
compute_loss``, ``fastrcnn_loss`` and ``RoIHeads.postprocess_detections``
(dynamic shapes, python loops), then diffed against the static-shape JAX
implementations on random inputs — the same technique as ``_nms_ref`` /
``_roi_align_ref`` in tests/test_ops.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.detection import rpn as rpn_mod
from layoutdit_tpu.models.detection.roi_heads import (
    fastrcnn_loss,
    postprocess_detections_single,
    select_training_samples_single,
)

BBOX_XFORM_CLIP = float(np.log(1000.0 / 16.0))


# ----------------------------------------------------------- numpy oracle


def _np_decode(deltas, boxes, weights=(1.0, 1.0, 1.0, 1.0)):
    """torchvision BoxCoder.decode_single."""
    wx, wy, ww, wh = weights
    w = boxes[..., 2] - boxes[..., 0]
    h = boxes[..., 3] - boxes[..., 1]
    cx = boxes[..., 0] + 0.5 * w
    cy = boxes[..., 1] + 0.5 * h
    dx, dy = deltas[..., 0] / wx, deltas[..., 1] / wy
    dw = np.minimum(deltas[..., 2] / ww, BBOX_XFORM_CLIP)
    dh = np.minimum(deltas[..., 3] / wh, BBOX_XFORM_CLIP)
    pcx, pcy = dx * w + cx, dy * h + cy
    pw, ph = np.exp(dw) * w, np.exp(dh) * h
    return np.stack(
        [pcx - 0.5 * pw, pcy - 0.5 * ph, pcx + 0.5 * pw, pcy + 0.5 * ph], -1
    )


def _np_encode(ref, prop, weights=(1.0, 1.0, 1.0, 1.0)):
    """torchvision BoxCoder.encode_single."""
    wx, wy, ww, wh = weights
    ew, eh = prop[..., 2] - prop[..., 0], prop[..., 3] - prop[..., 1]
    ecx, ecy = prop[..., 0] + 0.5 * ew, prop[..., 1] + 0.5 * eh
    gw, gh = ref[..., 2] - ref[..., 0], ref[..., 3] - ref[..., 1]
    gcx, gcy = ref[..., 0] + 0.5 * gw, ref[..., 1] + 0.5 * gh
    return np.stack(
        [wx * (gcx - ecx) / ew, wy * (gcy - ecy) / eh,
         ww * np.log(gw / ew), wh * np.log(gh / eh)], -1
    )


def _np_clip(boxes, h, w):
    return np.stack(
        [np.clip(boxes[..., 0], 0, w), np.clip(boxes[..., 1], 0, h),
         np.clip(boxes[..., 2], 0, w), np.clip(boxes[..., 3], 0, h)], -1
    )


def _np_iou(a, b):
    """torchvision box_ops.box_iou [M,4]x[N,4] -> [M,N]."""
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    lt = np.maximum(a[:, None, :2], b[None, :, :2])
    rb = np.minimum(a[:, None, 2:], b[None, :, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[..., 0] * wh[..., 1]
    union = area_a[:, None] + area_b[None] - inter
    return np.where(union > 0, inter / union, 0.0)


def _np_nms(boxes, scores, thresh):
    """Greedy torchvision::nms — returns kept indices in score order."""
    order = np.argsort(-scores, kind="stable")
    keep = []
    while order.size:
        i = order[0]
        keep.append(i)
        if order.size == 1:
            break
        rest = order[1:]
        iou = _np_iou(boxes[i : i + 1], boxes[rest])[0]
        order = rest[iou <= thresh]
    return np.array(keep, np.int64)


def _np_batched_nms(boxes, scores, idxs, thresh):
    """torchvision batched_nms coordinate-offset trick."""
    if boxes.size == 0:
        return np.zeros((0,), np.int64)
    max_coord = boxes.max()
    offsets = idxs.astype(boxes.dtype) * (max_coord + 1.0)
    return _np_nms(boxes + offsets[:, None], scores, thresh)


def _np_filter_proposals(objectness, deltas, anchors, level_counts,
                         image_size, budget, training):
    """RegionProposalNetwork.forward tail + filter_proposals, one image:
    decode all anchors -> per-level top-k -> sigmoid -> clip -> small/score
    filters -> level-wise batched NMS -> top post_nms_top_n."""
    pre_n = (budget.rpn_pre_nms_top_n_train if training
             else budget.rpn_pre_nms_top_n_test)
    post_n = (budget.rpn_post_nms_top_n_train if training
              else budget.rpn_post_nms_top_n_test)
    proposals = _np_decode(deltas, anchors)

    sel, levels = [], []
    start = 0
    for li, count in enumerate(level_counts):
        k = min(pre_n, count)
        ob_l = objectness[start : start + count]
        top = np.argsort(-ob_l, kind="stable")[:k]
        sel.append(start + top)
        levels.append(np.full(k, li, np.int64))
        start += count
    idx = np.concatenate(sel)
    lv = np.concatenate(levels)

    scores = 1.0 / (1.0 + np.exp(-objectness[idx]))
    boxes = _np_clip(proposals[idx], *image_size)

    ws, hs = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    keep = (ws >= budget.rpn_min_size) & (hs >= budget.rpn_min_size)
    boxes, scores, lv = boxes[keep], scores[keep], lv[keep]
    keep = scores >= budget.rpn_score_thresh
    boxes, scores, lv = boxes[keep], scores[keep], lv[keep]

    keep = _np_batched_nms(boxes, scores, lv, budget.rpn_nms_thresh)
    keep = keep[:post_n]
    return boxes[keep], scores[keep]


def _np_matcher(iou, high, low, allow_low_quality):
    """torchvision Matcher.__call__ on [G, N] quality matrix: returns
    matched idx [N] with -1 = below low, -2 = between."""
    matched_vals = iou.max(axis=0)
    matches = iou.argmax(axis=0).astype(np.int64)
    if allow_low_quality:
        all_matches = matches.copy()
    matches = np.where(matched_vals < low, -1, matches)
    matches = np.where(
        (matched_vals >= low) & (matched_vals < high), -2, matches
    )
    if allow_low_quality:
        # set_low_quality_matches_: restore the PRE-threshold argmax for
        # every anchor that ties some gt's best IoU (no >0 guard)
        highest_per_gt = iou.max(axis=1)
        gt_pred_pairs = np.nonzero(iou == highest_per_gt[:, None])
        pred_inds = gt_pred_pairs[1]
        matches[pred_inds] = all_matches[pred_inds]
    return matches


def _np_smooth_l1(x, beta):
    ax = np.abs(x)
    return np.where(ax < beta, 0.5 * ax * ax / beta, ax - 0.5 * beta)


# ----------------------------------------------------------------- tests


def _random_anchors(rng, n, size=224):
    ctr = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(8, 120, (n, 2))
    return np.concatenate([ctr - wh / 2, ctr + wh / 2], 1).astype(np.float32)


def _random_gt(rng, g, size=224):
    xy = rng.uniform(0, size - 40, (g, 2))
    wh = rng.uniform(10, 40, (g, 2))
    return np.concatenate([xy, xy + wh], 1).astype(np.float32)


@pytest.mark.parametrize("training", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2])
def test_filter_proposals_matches_torchvision_transcription(seed, training):
    rng = np.random.default_rng(seed)
    level_counts = (300, 80, 20)
    n = sum(level_counts)
    anchors = _random_anchors(rng, n)
    objectness = rng.normal(size=(n,)).astype(np.float32)
    deltas = (rng.normal(size=(n, 4)) * 0.4).astype(np.float32)
    budget = DetectionBudget(
        rpn_pre_nms_top_n_train=120, rpn_post_nms_top_n_train=80,
        rpn_pre_nms_top_n_test=60, rpn_post_nms_top_n_test=40,
    )

    want_boxes, want_scores = _np_filter_proposals(
        objectness.astype(np.float64), deltas.astype(np.float64),
        anchors.astype(np.float64), level_counts, (224, 224), budget,
        training,
    )

    got = rpn_mod.filter_proposals_single(
        jnp.asarray(objectness), jnp.asarray(deltas), jnp.asarray(anchors),
        level_counts, (224, 224), budget, training=training,
    )
    n_valid = int(np.asarray(got.valid).sum())
    assert n_valid == len(want_boxes)
    # padded entries sit at the tail (sorted by score), valid prefix matches
    np.testing.assert_allclose(
        np.asarray(got.scores)[:n_valid], want_scores, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes)[:n_valid], want_boxes, rtol=1e-4, atol=1e-3
    )


@pytest.mark.parametrize("seed", range(6))
def test_matcher_matches_torchvision_transcription(seed):
    rng = np.random.default_rng(seed)
    n, g = 400, 7
    anchors = _random_anchors(rng, n)
    gt = _random_gt(rng, g)
    if seed == 3:
        # adversarial: a gt with zero IoU against every anchor (off-image)
        gt[0] = [500.0, 500.0, 510.0, 510.0]
        anchors = np.clip(anchors, 0, 224)
    iou = _np_iou(gt.astype(np.float64), anchors.astype(np.float64))
    want = _np_matcher(iou, 0.7, 0.3, allow_low_quality=True)

    midx, labels = rpn_mod.match_anchors_to_gt(
        jnp.asarray(anchors), jnp.asarray(gt), jnp.ones((g,), bool),
        0.7, 0.3, allow_low_quality=True,
    )
    midx, labels = np.asarray(midx), np.asarray(labels)
    # label semantics: want >= 0 -> positive, -1 -> background, -2 -> ignore
    np.testing.assert_array_equal(labels == 1, want >= 0)
    np.testing.assert_array_equal(labels == 0, want == -1)
    np.testing.assert_array_equal(labels == -1, want == -2)
    # matched gt index must agree wherever the anchor is positive
    pos = want >= 0
    np.testing.assert_array_equal(midx[pos], want[pos])


@pytest.mark.parametrize("seed", [0, 1])
def test_rpn_loss_matches_torchvision_transcription(seed):
    """RegionProposalNetwork.compute_loss, given the SAME sampled set
    (sampling itself is RNG-backend-specific): BCE mean over sampled;
    smooth_l1(beta=1/9) summed over positives / total sampled."""
    rng = np.random.default_rng(seed)
    b, n, g = 2, 300, 5
    anchors = _random_anchors(rng, n)
    gt = np.stack([_random_gt(rng, g) for _ in range(b)])
    gt_valid = np.ones((b, g), bool)
    gt_valid[1, 3:] = False
    objectness = rng.normal(size=(b, n)).astype(np.float32)
    deltas = (rng.normal(size=(b, n, 4)) * 0.3).astype(np.float32)
    budget = DetectionBudget()
    key = jax.random.PRNGKey(seed)

    got_obj, got_box = rpn_mod.rpn_loss(
        jnp.asarray(objectness), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(gt), jnp.asarray(gt_valid), budget, key,
    )

    # replicate the jax path's sampling exactly, then compute the losses
    # with the numpy transcription of compute_loss
    keys = jax.random.split(key, b)
    tot_bce = tot_l1 = tot_sampled = 0.0
    for i in range(b):
        gi = gt[i][gt_valid[i]]
        iou = _np_iou(gi.astype(np.float64), anchors.astype(np.float64))
        want_m = _np_matcher(iou, 0.7, 0.3, True)
        if gi.shape[0] == 0:
            want_m = np.full(n, -1)
        labels_tv = np.where(want_m >= 0, 1, np.where(want_m == -1, 0, -1))
        _, labels_jax = rpn_mod.match_anchors_to_gt(
            jnp.asarray(anchors), jnp.asarray(gt[i]),
            jnp.asarray(gt_valid[i]), 0.7, 0.3, True,
        )
        np.testing.assert_array_equal(np.asarray(labels_jax), labels_tv)
        sampled = np.asarray(
            rpn_mod.balanced_sample(
                labels_jax, keys[i], budget.rpn_batch_size_per_image,
                budget.rpn_positive_fraction,
            )
        )
        matched_gt = gt[i][gt_valid[i]][np.clip(want_m, 0, None)] \
            if gi.shape[0] else np.zeros((n, 4))
        targets = _np_encode(
            matched_gt.astype(np.float64), anchors.astype(np.float64)
        )
        ob = objectness[i].astype(np.float64)
        lab01 = (labels_tv == 1).astype(np.float64)
        bce = np.maximum(ob, 0) - ob * lab01 + np.log1p(np.exp(-np.abs(ob)))
        tot_bce += bce[sampled].sum()
        pos = sampled & (labels_tv == 1)
        tot_l1 += _np_smooth_l1(
            deltas[i].astype(np.float64)[pos] - targets[pos], 1.0 / 9
        ).sum()
        tot_sampled += sampled.sum()

    np.testing.assert_allclose(
        float(got_obj), tot_bce / tot_sampled, rtol=1e-5
    )
    np.testing.assert_allclose(
        float(got_box), tot_l1 / tot_sampled, rtol=1e-4
    )


@pytest.mark.parametrize("dense", [False, True])
def test_postprocess_detections_matches_torchvision_transcription(dense):
    """RoIHeads.postprocess_detections. dense=True pushes >1000 candidates
    past the score threshold (VERDICT round-1 item 3: bound the old static
    cap's divergence — the production path now runs NMS on all P*NC
    survivors exactly like torchvision)."""
    rng = np.random.default_rng(7 if dense else 3)
    p, nc = (256, 5) if dense else (64, 5)
    proposals = _random_anchors(rng, p).astype(np.float32)
    proposals = _np_clip(proposals, 224, 224).astype(np.float32)
    if dense:
        # near-flat logits -> every class score ~0.17 > 0.05 threshold:
        # all 1280 candidates reach NMS
        logits = (rng.normal(size=(p, nc + 1)) * 0.05).astype(np.float32)
    else:
        logits = rng.normal(size=(p, nc + 1)).astype(np.float32)
    regression = (rng.normal(size=(p, (nc + 1) * 4)) * 0.5).astype(np.float32)
    budget = DetectionBudget()

    # ---- numpy transcription --------------------------------------
    def np_softmax(x):
        e = np.exp(x - x.max(-1, keepdims=True))
        return e / e.sum(-1, keepdims=True)

    scores_all = np_softmax(logits.astype(np.float64))
    boxes_all = _np_decode(
        regression.astype(np.float64).reshape(p, nc + 1, 4),
        proposals.astype(np.float64)[:, None, :], budget.box_reg_weights,
    )
    boxes_all = _np_clip(boxes_all, 224, 224)
    boxes = boxes_all[:, 1:, :].reshape(-1, 4)
    scores = scores_all[:, 1:].reshape(-1)
    labels = np.tile(np.arange(1, nc + 1), p)

    inds = scores > budget.box_score_thresh
    boxes, scores, labels = boxes[inds], scores[inds], labels[inds]
    ws, hs = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    keep = (ws >= 1e-2) & (hs >= 1e-2)
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    if dense:
        assert len(scores) > 1000  # the old static cap would truncate here
    keep = _np_batched_nms(boxes, scores, labels, budget.box_nms_thresh)
    keep = keep[: budget.box_detections_per_img]
    want_boxes, want_scores, want_labels = boxes[keep], scores[keep], labels[keep]

    # ---- jax static-shape path -------------------------------------
    got = postprocess_detections_single(
        jnp.asarray(logits), jnp.asarray(regression), jnp.asarray(proposals),
        jnp.ones((p,), bool), (224, 224), budget,
    )
    n_valid = int(np.asarray(got.valid).sum())
    assert n_valid == len(want_boxes)
    np.testing.assert_allclose(
        np.asarray(got.scores)[:n_valid], want_scores, rtol=1e-5, atol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(got.labels)[:n_valid], want_labels)
    np.testing.assert_allclose(
        np.asarray(got.boxes)[:n_valid], want_boxes, rtol=1e-4, atol=1e-3
    )


def test_select_training_samples_assignment_transcription():
    """RoIHeads.select_training_samples: whatever rois the (backend-
    specific) sampler picked, their labels and regression targets must
    equal the torchvision assignment transcription recomputed from
    scratch: label = gt_label[argmax IoU] if best IoU >= 0.5 else 0,
    target = encode(matched gt, roi, (10,10,5,5))."""
    rng = np.random.default_rng(0)
    p, g = 96, 6
    gt = _random_gt(rng, g)
    gt_labels = rng.integers(1, 6, (g,)).astype(np.int32)
    # proposals: jittered copies of gt (positives) + random (negatives)
    jit = gt[rng.integers(0, g, (p - g,))] + rng.normal(0, 6, (p - g, 4))
    proposals = np.concatenate([jit, _random_gt(rng, g)]).astype(np.float32)
    budget = DetectionBudget(box_batch_size_per_image=64)

    samples = select_training_samples_single(
        jnp.asarray(proposals), jnp.ones((p,), bool), jnp.asarray(gt),
        jnp.asarray(gt_labels), jnp.ones((g,), bool), budget,
        jax.random.PRNGKey(0),
    )
    rois = np.asarray(samples.rois)
    valid = np.asarray(samples.valid)
    labels = np.asarray(samples.labels)
    targets = np.asarray(samples.reg_targets)

    iou = _np_iou(gt.astype(np.float64), rois.astype(np.float64))
    best = iou.max(axis=0)
    midx = iou.argmax(axis=0)
    want_labels = np.where(best >= 0.5, gt_labels[midx], 0)
    for s in range(len(rois)):
        if not valid[s]:
            continue
        assert labels[s] == want_labels[s], s
        if labels[s] > 0:
            want_t = _np_encode(
                gt[midx[s]].astype(np.float64), rois[s].astype(np.float64),
                budget.box_reg_weights,
            )
            np.testing.assert_allclose(targets[s], want_t, rtol=1e-4, atol=1e-4)


def test_fastrcnn_loss_matches_torchvision_transcription():
    """fastrcnn_loss formula given a sampled set: CE mean over sampled,
    class-indexed smooth_l1 sum over positives / total sampled."""
    rng = np.random.default_rng(1)
    b, s, nc = 2, 32, 5
    logits = rng.normal(size=(b, s, nc + 1)).astype(np.float32)
    reg = rng.normal(size=(b, s, (nc + 1) * 4)).astype(np.float32)
    labels = rng.integers(0, nc + 1, (b, s)).astype(np.int32)
    valid = rng.uniform(size=(b, s)) < 0.8
    labels = labels * valid
    targets = (rng.normal(size=(b, s, 4)) * 0.3).astype(np.float32)
    targets = targets * (labels > 0)[..., None]

    from layoutdit_tpu.models.detection.roi_heads import TrainingSamples

    samples = TrainingSamples(
        rois=jnp.zeros((b, s, 4)), valid=jnp.asarray(valid),
        labels=jnp.asarray(labels), reg_targets=jnp.asarray(targets),
    )
    got_cls, got_box = fastrcnn_loss(
        jnp.asarray(logits), jnp.asarray(reg), samples
    )

    lse = np.log(np.exp(logits.astype(np.float64)).sum(-1))
    picked = np.take_along_axis(
        logits.astype(np.float64), labels[..., None], -1
    )[..., 0]
    ce = (lse - picked)[valid]
    num = valid.sum()
    want_cls = ce.sum() / num

    reg4 = reg.astype(np.float64).reshape(b, s, nc + 1, 4)
    pos = valid & (labels > 0)
    l1 = 0.0
    for bi in range(b):
        for si in range(s):
            if pos[bi, si]:
                d = reg4[bi, si, labels[bi, si]] - targets[bi, si]
                l1 += _np_smooth_l1(d, 1.0 / 9).sum()
    want_box = l1 / num

    np.testing.assert_allclose(float(got_cls), want_cls, rtol=1e-5)
    np.testing.assert_allclose(float(got_box), want_box, rtol=1e-5)
