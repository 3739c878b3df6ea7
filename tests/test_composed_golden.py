"""Composed-pipeline golden test (VERDICT r2 item 4).

Every detection stage is individually verified against a torchvision
transcription (tests/test_golden_stages.py, tests/test_ops.py); this test
verifies their COMPOSITION: a fixed input pushed through the *chained
numpy oracles* (trunk activations -> _np_filter_proposals -> literal
RoIAlign + FPN level mapper -> TwoMLPHead/predictor in numpy ->
postprocess transcription) must match ``detector_predict`` end-to-end.
A wiring bug between two individually-correct stages is the one parity
failure nothing else would catch.

Parity target: the reference's FasterRCNN.forward composition
(/root/reference/src/layoutdit/modeling/model.py:45-88 via torchvision
GeneralizedRCNN.forward).
"""

import numpy as np

import jax
import jax.numpy as jnp

from test_golden_stages import (
    _np_batched_nms,
    _np_clip,
    _np_decode,
    _np_filter_proposals,
)
from test_ops import _roi_align_ref

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    _anchors,
    _run_trunk,
    detector_predict,
    init_detector_params,
)
from layoutdit_tpu.models.vit import ViTConfig


def _cfg():
    tiny_vit = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=64,
    )
    budget = DetectionBudget(
        rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=48,
        box_detections_per_img=16,
    )
    return DetectorConfig(
        backbone=BackboneConfig(vit=tiny_vit, fpn_out_channels=32),
        image_size=64, budget=budget,
    )


def _np_box_head(params, pooled_tv):
    """TwoMLPHead + FastRCNNPredictor in numpy.

    pooled_tv: [K, C, Py, Px] (torchvision layout). The production fc6
    kernel is stored contraction-native [Px, Py, C, rep]
    (heads.init_box_head_params), so the oracle contracts that layout
    explicitly — einsum('kcyx,xycm->km')."""
    fc6 = params["box_head"]["fc6"]
    w6 = np.asarray(fc6["kernel"], np.float64)  # [Px, Py, C, rep]
    x = np.einsum("kcyx,xycm->km", pooled_tv, w6) + np.asarray(fc6["bias"])
    x = np.maximum(x, 0.0)
    fc7 = params["box_head"]["fc7"]
    x = np.maximum(
        x @ np.asarray(fc7["kernel"], np.float64) + np.asarray(fc7["bias"]), 0.0
    )
    pred = params["box_predictor"]
    logits = x @ np.asarray(pred["cls"]["kernel"], np.float64) + np.asarray(
        pred["cls"]["bias"]
    )
    regression = x @ np.asarray(pred["bbox"]["kernel"], np.float64) + np.asarray(
        pred["bbox"]["bias"]
    )
    return logits, regression


def _np_multiscale_roi_align(feats, boxes, scales, image_size):
    """MultiScaleRoIAlign: FPN level mapper + literal per-level roi_align
    (ops/roi_align.py multiscale_roi_align semantics)."""
    num_levels = len(feats)
    canonical_level, canonical_scale = 4, float(image_size)
    area = np.maximum(
        (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1]), 0.0
    )
    lvl = np.floor(
        canonical_level + np.log2(np.sqrt(area) / canonical_scale + 1e-6)
    )
    lvl = np.clip(lvl, 2, 2 + num_levels - 1).astype(int) - 2
    k = len(boxes)
    c = feats[0].shape[0]
    out = np.zeros((k, c, 7, 7), np.float64)
    for i in range(k):
        out[i] = _roi_align_ref(feats[lvl[i]], boxes[i : i + 1], scales[lvl[i]])[0]
    return out


def _np_postprocess(logits, regression, proposals, image_size, budget):
    """RoIHeads.postprocess_detections transcription (same as
    tests/test_golden_stages.py test_postprocess...)."""
    p, nc_bg = logits.shape
    nc = nc_bg - 1
    e = np.exp(logits - logits.max(-1, keepdims=True))
    scores_all = e / e.sum(-1, keepdims=True)
    boxes_all = _np_decode(
        regression.reshape(p, nc_bg, 4), proposals[:, None, :],
        budget.box_reg_weights,
    )
    boxes_all = _np_clip(boxes_all, *image_size)
    boxes = boxes_all[:, 1:, :].reshape(-1, 4)
    scores = scores_all[:, 1:].reshape(-1)
    labels = np.tile(np.arange(1, nc_bg), p)
    keep = scores > budget.box_score_thresh
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    ws, hs = boxes[:, 2] - boxes[:, 0], boxes[:, 3] - boxes[:, 1]
    keep = (ws >= 1e-2) & (hs >= 1e-2)
    boxes, scores, labels = boxes[keep], scores[keep], labels[keep]
    keep = _np_batched_nms(boxes, scores, labels, budget.box_nms_thresh)
    keep = keep[: budget.box_detections_per_img]
    return boxes[keep], scores[keep], labels[keep]


def test_detector_predict_matches_chained_oracles():
    cfg = _cfg()
    params = init_detector_params(jax.random.PRNGKey(3), cfg)
    rng = np.random.default_rng(11)
    images = jnp.asarray(rng.uniform(0, 1, (1, 3, 64, 64)), jnp.float32)

    # ---- end-to-end production path --------------------------------
    got = jax.jit(
        lambda p, im: detector_predict(p, im, cfg), static_argnames=()
    )(params, images)

    # ---- chained numpy oracles -------------------------------------
    # trunk activations are taken from the (separately golden-tested)
    # JAX trunk so this test isolates the detection-stage composition
    feats, objectness, deltas = _run_trunk(params, images, cfg)
    anchors, counts = _anchors(cfg)
    prop_boxes, _ = _np_filter_proposals(
        np.asarray(objectness[0], np.float64),
        np.asarray(deltas[0], np.float64),
        np.asarray(anchors, np.float64),
        counts, (64, 64), cfg.budget, training=False,
    )
    feats_np = [np.asarray(f[0], np.float64) for f in feats]
    pooled = _np_multiscale_roi_align(
        feats_np, prop_boxes, list(cfg.backbone.spatial_scales), 64
    )
    logits, regression = _np_box_head(params, pooled)
    want_boxes, want_scores, want_labels = _np_postprocess(
        logits, regression, prop_boxes, (64, 64), cfg.budget
    )

    # ---- compare ---------------------------------------------------
    n_valid = int(np.asarray(got.valid[0]).sum())
    assert n_valid == len(want_boxes)
    np.testing.assert_allclose(
        np.asarray(got.scores[0])[:n_valid], want_scores, rtol=2e-4, atol=1e-5
    )
    np.testing.assert_array_equal(
        np.asarray(got.labels[0])[:n_valid], want_labels
    )
    np.testing.assert_allclose(
        np.asarray(got.boxes[0])[:n_valid], want_boxes, rtol=1e-3, atol=5e-3
    )
