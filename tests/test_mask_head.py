"""Mask R-CNN branch tests: head shapes/init, target projection
semantics, the torchvision-style BCE loss, and end-to-end loss/predict
integration (beyond-reference capability; models/detection/mask_head.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_loss,
    detector_predict,
    init_detector_params,
)
from layoutdit_tpu.models.detection.mask_head import (
    init_mask_head_params,
    mask_head_forward,
    mask_probs_for_labels,
    maskrcnn_loss,
    project_masks_on_boxes,
)
from layoutdit_tpu.models.vit import ViTConfig

# ------------------------------------------------------------------- head


def test_mask_head_shapes():
    params = init_mask_head_params(jax.random.PRNGKey(0), 32, 6, hidden=16)
    x = jnp.zeros((5, 32, 14, 14), jnp.float32)
    out = mask_head_forward(params, x)
    assert out.shape == (5, 6, 28, 28)
    assert out.dtype == jnp.float32


def test_mask_head_deconv_upsamples_2x():
    # one conv channel, deconv kernel of ones with stride 2: every input
    # pixel expands into a 2x2 block of its own value (blocks don't
    # overlap at kernel 2 / stride 2), so output[2i:2i+2, 2j:2j+2] == x[i, j]
    params = {
        "deconv": {
            "kernel": jnp.ones((1, 1, 2, 2), jnp.float32),
            "bias": jnp.zeros((1,), jnp.float32),
        },
        "logits": {
            "kernel": jnp.ones((1, 1, 1, 1), jnp.float32),
            "bias": jnp.zeros((1,), jnp.float32),
        },
    }
    x = jnp.abs(jnp.asarray(np.random.default_rng(0).normal(size=(1, 1, 3, 3)),
                            jnp.float32))
    out = np.asarray(mask_head_forward(params, x))
    assert out.shape == (1, 1, 6, 6)
    for i in range(3):
        for j in range(3):
            np.testing.assert_allclose(
                out[0, 0, 2 * i:2 * i + 2, 2 * j:2 * j + 2],
                float(x[0, 0, i, j]), rtol=1e-6,
            )


# ------------------------------------------------------- target projection


def test_project_masks_inside_outside():
    # GT mask block at M=32 for a 64-px image (scale 1/2). Mask 0 covers
    # image-space x,y in [0, 32) (mask pixels [0, 16)); mask 1 is empty.
    m = 32
    gm = np.zeros((2, m, m), np.float32)
    gm[0, :16, :16] = 1.0
    gt_masks = jnp.asarray(gm)

    boxes = jnp.asarray(
        [[4, 4, 28, 28],     # strictly inside mask 0 -> all ones
         [36, 36, 60, 60],   # strictly outside -> all zeros
         [8, 8, 24, 24]],    # matched to the EMPTY mask -> zeros
        jnp.float32,
    )
    matched = jnp.asarray([0, 0, 1], jnp.int32)
    t = np.asarray(project_masks_on_boxes(gt_masks, boxes, matched, 64, 8))
    assert t.shape == (3, 8, 8)
    np.testing.assert_array_equal(t[0], 1.0)
    np.testing.assert_array_equal(t[1], 0.0)
    np.testing.assert_array_equal(t[2], 0.0)


def test_project_masks_half_coverage():
    # mask covers image-space x < 32 exactly; box x-span [8, 24] with
    # P=4 puts sample centers at x = 10, 14, 18, 22 image px... scaled to
    # a half-covered box [16, 48]: centers 20, 28, 36, 44 -> cols 0,1
    # inside, cols 2,3 outside (all >= 2 image px from the edge).
    m = 32
    gm = np.zeros((1, m, m), np.float32)
    gm[0, :, :16] = 1.0  # x < 32 in image space
    boxes = jnp.asarray([[16, 16, 48, 48]], jnp.float32)
    t = np.asarray(
        project_masks_on_boxes(jnp.asarray(gm), boxes, jnp.asarray([0]), 64, 4)
    )
    np.testing.assert_array_equal(t[0, :, :2], 1.0)
    np.testing.assert_array_equal(t[0, :, 2:], 0.0)


# ------------------------------------------------------------------- loss


def test_maskrcnn_loss_hand_case():
    # two slots, one positive: logits all zero -> sigmoid 0.5; BCE for
    # every pixel is log(2) regardless of target; mean over the positive's
    # P*P pixels = log(2). The invalid slot must not contribute.
    k, ncbg, p = 2, 3, 4
    logits = jnp.zeros((k, ncbg, p, p), jnp.float32)
    labels = jnp.asarray([2, 1], jnp.int32)
    targets = jnp.zeros((k, p, p), jnp.float32).at[0, :2].set(1.0)
    pos_valid = jnp.asarray([True, False])
    loss = float(maskrcnn_loss(logits, labels, targets, pos_valid))
    np.testing.assert_allclose(loss, np.log(2.0), rtol=1e-6)


def test_maskrcnn_loss_matches_manual_bce():
    rng = np.random.default_rng(1)
    k, ncbg, p = 6, 4, 8
    logits = jnp.asarray(rng.normal(size=(k, ncbg, p, p)), jnp.float32)
    labels = jnp.asarray(rng.integers(1, ncbg, size=(k,)), jnp.int32)
    targets = jnp.asarray((rng.uniform(size=(k, p, p)) < 0.5), jnp.float32)
    pos_valid = jnp.asarray([True, True, False, True, False, True])

    got = float(maskrcnn_loss(logits, labels, targets, pos_valid))

    lg = np.asarray(logits)[np.arange(k), np.asarray(labels)]
    prob = 1.0 / (1.0 + np.exp(-lg))
    t = np.asarray(targets)
    bce = -(t * np.log(prob) + (1 - t) * np.log1p(-prob))
    want = bce[np.asarray(pos_valid)].mean()
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_maskrcnn_loss_grad_only_on_positives():
    k, ncbg, p = 3, 3, 4
    labels = jnp.asarray([1, 2, 1], jnp.int32)
    targets = jnp.ones((k, p, p), jnp.float32)
    pos_valid = jnp.asarray([True, False, True])
    g = jax.grad(
        lambda lg: maskrcnn_loss(lg, labels, targets, pos_valid)
    )(jnp.zeros((k, ncbg, p, p), jnp.float32))
    g = np.asarray(g)
    assert np.abs(g[0, 1]).sum() > 0 and np.abs(g[2, 1]).sum() > 0
    assert np.abs(g[1]).sum() == 0  # invalid slot contributes nothing
    assert np.abs(g[0, 0]).sum() == 0  # only the own-class channel trains


def test_mask_probs_for_labels():
    logits = jnp.zeros((2, 3, 4, 4), jnp.float32).at[0, 1].set(10.0)
    probs = np.asarray(
        mask_probs_for_labels(logits, jnp.asarray([1, 2], jnp.int32))
    )
    assert probs[0].min() > 0.99
    np.testing.assert_allclose(probs[1], 0.5)


# ------------------------------------------------------------- end to end


def _tiny_cfg(with_mask: bool):
    tiny_vit = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=64,
    )
    budget = DetectionBudget(
        rpn_pre_nms_top_n_train=100, rpn_pre_nms_top_n_test=50,
        rpn_post_nms_top_n_train=100, rpn_post_nms_top_n_test=50,
        box_batch_size_per_image=32, box_detections_per_img=10,
    )
    return DetectorConfig(
        backbone=BackboneConfig(vit=tiny_vit, fpn_out_channels=32),
        image_size=64, budget=budget, with_mask=with_mask,
        mask_roi_output_size=7,
    )


def _tiny_batch():
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (2, 3, 64, 64)), jnp.float32)
    gt_boxes = jnp.asarray(
        [[[5, 5, 30, 40], [20, 10, 60, 50], [0, 0, 0, 0]],
         [[10, 10, 50, 60], [0, 0, 0, 0], [0, 0, 0, 0]]], jnp.float32,
    )
    gt_labels = jnp.asarray([[1, 3, 0], [2, 0, 0]], jnp.int32)
    gt_valid = jnp.asarray([[True, True, False], [True, False, False]])
    # rectangular masks filling each gt box (at M = 32 = 64 // 2)
    gm = np.zeros((2, 3, 32, 32), np.float32)
    for b in range(2):
        for g in range(3):
            if gt_valid[b, g]:
                x1, y1, x2, y2 = (np.asarray(gt_boxes[b, g]) / 2).astype(int)
                gm[b, g, y1:y2, x1:x2] = 1.0
    return images, gt_boxes, gt_labels, gt_valid, jnp.asarray(gm)


@pytest.fixture(scope="module")
def tiny_mask_detector():
    cfg = _tiny_cfg(with_mask=True)
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


@pytest.mark.slow  # >60s on the 1-core host (measured round 5)
def test_detector_loss_with_mask(tiny_mask_detector):
    cfg, params = tiny_mask_detector
    images, gt_boxes, gt_labels, gt_valid, gt_masks = _tiny_batch()
    losses = detector_loss(
        params, jax.random.PRNGKey(1), images, gt_boxes, gt_labels,
        gt_valid, cfg, gt_masks=gt_masks,
    )
    assert "loss_mask" in losses
    assert np.isfinite(float(losses["loss_mask"]))
    assert float(losses["loss_mask"]) > 0


def test_mask_branch_does_not_change_base_losses(tiny_mask_detector):
    # same PRNG key: the mask head is init'd via fold_in, so the shared
    # params are bit-identical and the four reference losses must match
    # the no-mask model exactly
    cfg_m, params_m = tiny_mask_detector
    cfg0 = _tiny_cfg(with_mask=False)
    params0 = init_detector_params(jax.random.PRNGKey(0), cfg0)
    images, gt_boxes, gt_labels, gt_valid, gt_masks = _tiny_batch()
    l0 = detector_loss(
        params0, jax.random.PRNGKey(1), images, gt_boxes, gt_labels,
        gt_valid, cfg0,
    )
    lm = detector_loss(
        params_m, jax.random.PRNGKey(1), images, gt_boxes, gt_labels,
        gt_valid, cfg_m, gt_masks=gt_masks,
    )
    for k in l0:
        assert float(l0[k]) == float(lm[k]), k


def test_mask_loss_requires_masks(tiny_mask_detector):
    cfg, params = tiny_mask_detector
    images, gt_boxes, gt_labels, gt_valid, _ = _tiny_batch()
    with pytest.raises(ValueError, match="gt_masks"):
        detector_loss(
            params, jax.random.PRNGKey(1), images, gt_boxes, gt_labels,
            gt_valid, cfg,
        )


@pytest.mark.slow  # >60s on the 1-core host (measured round 5)
def test_mask_grads_flow(tiny_mask_detector):
    cfg, params = tiny_mask_detector
    images, gt_boxes, gt_labels, gt_valid, gt_masks = _tiny_batch()

    def mask_loss(p):
        return detector_loss(
            p, jax.random.PRNGKey(1), images, gt_boxes, gt_labels,
            gt_valid, cfg, gt_masks=gt_masks,
        )["loss_mask"]

    grads = jax.grad(mask_loss)(params)
    g_head = np.concatenate([
        np.asarray(x).ravel()
        for x in jax.tree_util.tree_leaves(grads["mask_head"])
    ])
    assert np.abs(g_head).sum() > 0
    # the mask loss backprops into the trunk too (shared features)
    g_bb = np.concatenate([
        np.asarray(x).ravel()
        for x in jax.tree_util.tree_leaves(grads["backbone"])
    ])
    assert np.abs(g_bb).sum() > 0


def test_detector_predict_with_masks(tiny_mask_detector):
    cfg, params = tiny_mask_detector
    images, *_ = _tiny_batch()
    dets, probs = detector_predict(params, images, cfg, with_masks=True)
    d = cfg.budget.box_detections_per_img
    p2 = 2 * cfg.mask_roi_output_size
    assert probs.shape == (2, d, p2, p2)
    probs = np.asarray(probs)
    assert (probs >= 0).all() and (probs <= 1).all()
    invalid = ~np.asarray(dets.valid)
    assert np.abs(probs[invalid]).sum() == 0

    # without the flag the return type is unchanged (API stability)
    dets_only = detector_predict(params, images, cfg)
    np.testing.assert_array_equal(
        np.asarray(dets_only.boxes), np.asarray(dets.boxes)
    )


@pytest.mark.slow  # >60s on the 1-core host (measured round 5)
def test_mask_train_and_segm_eval_e2e(tmp_path):
    """Full production path with the mask branch on: fixture (polygon
    segmentations) -> Trainer (loss_mask in the jitted sum) ->
    Evaluator.score() reporting BOTH bbox and segm 12-metric sets."""
    import json

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config

    root = str(tmp_path / "maskfix")
    make_fixture(root, n_images=6, split="samples", seed=7)
    write_fixture_config(root, epochs=1, batch_size=3, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(root + "/cfg.json")))
    cfg.run_name = "maskfix"
    cfg.train_config.steps_per_dispatch = 1
    cfg.detection_model_config.with_mask = True
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        assert "mask_head" in model.params
        trainer = Trainer(cfg, model)
        trainer.train()
        assert np.isfinite(trainer.loss_history[0])

        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
        assert metrics is not None
        assert np.isfinite(metrics["mAP"])
        assert "segm_mAP" in metrics and np.isfinite(metrics["segm_mAP"])
        assert "segm_AP50" in metrics
    finally:
        set_layout_dit_config(None)
