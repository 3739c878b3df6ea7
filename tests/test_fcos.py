"""FCOS anchor-free family tests: linear box coder + GIoU primitives,
head init/ordering, the torchvision-FCOS assignment rule (center
sampling, inside-box, scale ranges, smallest-area ties), loss vs a numpy
transcription, postprocess goldens, detector-level integration.
torchvision is not installed here; semantics transcribed by hand (see
models/detection/fcos.py docstring).
"""

import json
import math
import os

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
from layoutdit_tpu.models.detection.fcos import (
    fcos_head_forward,
    fcos_loss,
    fcos_match_single,
    fcos_postprocess_single,
    init_fcos_head_params,
)
from layoutdit_tpu.models.vit import ViTConfig
from layoutdit_tpu.ops.boxes import (
    decode_boxes_linear,
    encode_boxes_linear,
    generalized_box_iou,
)

# -------------------------------------------------------------- primitives


def test_linear_coder_roundtrip_and_known_values():
    anchors = jnp.asarray([[8.0, 8.0, 16.0, 16.0]])  # ctr (12, 12), size 8
    target = jnp.asarray([[4.0, 6.0, 20.0, 30.0]])
    enc = encode_boxes_linear(anchors, target)
    # ltrb distances from (12,12): l=8, t=6, r=8, b=18, over size 8
    np.testing.assert_allclose(np.asarray(enc[0]), [1.0, 0.75, 1.0, 2.25])
    dec = decode_boxes_linear(enc, anchors)
    np.testing.assert_allclose(np.asarray(dec), np.asarray(target), atol=1e-5)


def test_generalized_box_iou_known_values():
    a = jnp.asarray([0.0, 0.0, 10.0, 10.0])
    # identical boxes: GIoU 1
    assert float(generalized_box_iou(a, a)) == pytest.approx(1.0)
    # disjoint with enclosure 20x10: iou 0, giou = -(200-200)/200 ... union=200
    b = jnp.asarray([10.0, 0.0, 20.0, 10.0])
    assert float(generalized_box_iou(a, b)) == pytest.approx(0.0)
    # separated: [0,0,10,10] vs [20,0,30,10]: enclosure 300, union 200
    c = jnp.asarray([20.0, 0.0, 30.0, 10.0])
    assert float(generalized_box_iou(a, c)) == pytest.approx(-1.0 / 3.0)
    # half overlap: [0,0,10,10] vs [5,0,15,10]: inter 50, union 150,
    # enclosure 150 -> giou = 1/3
    d = jnp.asarray([5.0, 0.0, 15.0, 10.0])
    assert float(generalized_box_iou(a, d)) == pytest.approx(1.0 / 3.0)


# ------------------------------------------------------------------- head


def test_head_init_shapes_and_prior_bias():
    p = init_fcos_head_params(jax.random.PRNGKey(0), 32, 6)
    assert p["cls_logits"]["kernel"].shape == (6, 32, 3, 3)
    assert p["bbox_reg"]["kernel"].shape == (4, 32, 3, 3)
    assert p["ctrness"]["kernel"].shape == (1, 32, 3, 3)
    np.testing.assert_allclose(
        np.asarray(p["cls_logits"]["bias"]), -math.log(99.0), rtol=1e-6
    )
    for t in ("cls_tower", "reg_tower"):
        for i in (1, 2, 3, 4):
            c = p[t][f"conv{i}"]
            assert c["kernel"].shape == (32, 32, 3, 3)
            np.testing.assert_array_equal(np.asarray(c["gn_scale"]), 1.0)


def test_head_forward_shapes_and_relu_regression():
    p = init_fcos_head_params(jax.random.PRNGKey(0), 8, 6, num_convs=1)
    feats = [jnp.ones((2, 8, 4, 4)), jnp.ones((2, 8, 2, 2))]
    cls, ltrb, ctr = fcos_head_forward(p, feats)
    assert cls.shape == (2, 20, 6)
    assert ltrb.shape == (2, 20, 4)
    assert ctr.shape == (2, 20)
    assert float(ltrb.min()) >= 0.0  # FCOSRegressionHead applies ReLU


# --------------------------------------------------------------- matching


def test_match_center_sampling_and_inside():
    # stride-8 level: 4 cells at centers (4,4), (12,4), (4,12), (12,12)
    anchors = jnp.asarray(
        [[0, 0, 8, 8], [8, 0, 16, 8], [0, 8, 8, 16], [8, 8, 16, 16]],
        jnp.float32,
    )
    # gt centered at (4.5, 4.5): only cell (4,4) is close AND inside
    gt = jnp.asarray([[1, 1, 8, 8]], jnp.float32)
    m = fcos_match_single(anchors, (4,), gt, jnp.asarray([True]), 1.5)
    np.testing.assert_array_equal(np.asarray(m), [0, -1, -1, -1])
    # no valid gt -> everything background
    m0 = fcos_match_single(anchors, (4,), gt, jnp.asarray([False]), 1.5)
    np.testing.assert_array_equal(np.asarray(m0), [-1, -1, -1, -1])


def test_match_scale_range_routes_levels():
    """A large gt must match the coarse level, not the fine one: the fine
    level's max-ltrb exceeds size*8."""
    # level 0: one stride-8 cell at center (4,4); level 1: one stride-64
    # cell at center (32,32)
    anchors = jnp.asarray([[0, 0, 8, 8], [0, 0, 64, 64]], jnp.float32)
    gt = jnp.asarray([[0, 0, 64, 64]], jnp.float32)  # center (32,32)
    m = fcos_match_single(
        anchors, (1, 1), gt, jnp.asarray([True]), center_sampling_radius=8.0
    )
    # fine cell: max ltrb from (4,4) = 60 > 8*8=64? 60 < 64 BUT the first
    # level has lower bound 0 and upper 8*8=64: 60 < 64 -> matches?!
    # center sampling with radius 8: |(4,4)-(32,32)|_inf = 28 < 8*8 ok.
    # Use the exact torchvision arithmetic to derive the expectation:
    # fine cell max dist 60 in (0, 64) -> match; coarse cell max dist 32
    # in (0*4=256?...). For the LAST level lower=64*4=256, max dist 32
    # < 256 -> no match. So the fine cell wins here.
    np.testing.assert_array_equal(np.asarray(m), [0, -1])
    # shrink the fine cell's reach: radius 1.5 -> center sampling fails
    # (28 > 1.5*8=12) -> no match anywhere
    m2 = fcos_match_single(
        anchors, (1, 1), gt, jnp.asarray([True]), center_sampling_radius=1.5
    )
    np.testing.assert_array_equal(np.asarray(m2), [-1, -1])


def test_match_prefers_smallest_area_on_ties():
    anchors = jnp.asarray([[8, 8, 16, 16]], jnp.float32)  # center (12,12)
    gts = jnp.asarray(
        [[0, 0, 24, 24], [4, 4, 20, 20]], jnp.float32
    )  # both contain (12,12); second is smaller
    m = fcos_match_single(
        anchors, (1,), gts, jnp.asarray([True, True]), 1.5
    )
    np.testing.assert_array_equal(np.asarray(m), [1])


# ------------------------------------------------------------------- loss


def test_fcos_loss_vs_numpy_transcription():
    """Hand-built single-level case where the assignment is known; verify
    all three loss terms against independent numpy arithmetic."""
    anchors_np = np.asarray(
        [[0, 0, 8, 8], [8, 0, 16, 8], [0, 8, 8, 16], [8, 8, 16, 16]],
        np.float32,
    )
    gt_boxes = np.asarray([[[1, 1, 8, 8], [0, 0, 0, 0]]], np.float32)
    gt_labels = np.asarray([[2, 0]], np.int32)
    gt_valid = np.asarray([[True, False]])
    rng = np.random.default_rng(7)
    k_bg = 6
    logits = rng.normal(size=(1, 4, k_bg)).astype(np.float32)
    ltrb = np.abs(rng.normal(size=(1, 4, 4))).astype(np.float32)
    ctrness = rng.normal(size=(1, 4)).astype(np.float32)

    budget = DetectionBudget()
    got_cls, got_reg, got_ctr = fcos_loss(
        jnp.asarray(logits), jnp.asarray(ltrb), jnp.asarray(ctrness),
        jnp.asarray(anchors_np), (4,),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        budget,
    )

    # expected assignment (test_match_center_sampling_and_inside): cell 0
    # -> gt 0, rest background; num_fg = 1
    def focal(x, t, alpha=0.25, gamma=2.0):
        p = 1 / (1 + np.exp(-x))
        ce = np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))
        pt = p * t + (1 - p) * (1 - t)
        return (alpha * t + (1 - alpha) * (1 - t)) * (1 - pt) ** gamma * ce

    onehot = np.zeros((1, 4, k_bg), np.float32)
    onehot[0, 0, 2] = 1.0
    exp_cls = focal(logits, onehot).sum()

    # regression: GIoU(decoded cell-0 box, gt) — decode: ctr (4,4), size 8
    l, t, r, b = ltrb[0, 0] * 8.0
    pred = np.array([4 - l, 4 - t, 4 + r, 4 + b])
    gt0 = gt_boxes[0, 0]

    def giou(a, b):
        ax1, ay1, ax2, ay2 = a
        bx1, by1, bx2, by2 = b
        iw = max(0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        area_a = (ax2 - ax1) * (ay2 - ay1)
        area_b = (bx2 - bx1) * (by2 - by1)
        union = area_a + area_b - inter
        iou = inter / union if union > 0 else 0.0
        ew = max(ax2, bx2) - min(ax1, bx1)
        eh = max(ay2, by2) - min(ay1, by1)
        enc = ew * eh
        return iou - (enc - union) / enc

    exp_reg = 1.0 - giou(pred, gt0)

    # centerness target at cell 0: ltrb distances from (4,4) to gt over
    # size 8 -> l=3/8, t=3/8, r=4/8, b=4/8
    lr, tb = (3 / 8, 4 / 8), (3 / 8, 4 / 8)
    ctr_t = math.sqrt((min(lr) / max(lr)) * (min(tb) / max(tb)))
    x = ctrness[0, 0]
    exp_ctr = max(x, 0) - x * ctr_t + math.log1p(math.exp(-abs(x)))

    assert float(got_cls) == pytest.approx(exp_cls, rel=1e-5)
    assert float(got_reg) == pytest.approx(exp_reg, rel=1e-4)
    assert float(got_ctr) == pytest.approx(exp_ctr, rel=1e-5)


# ------------------------------------------------------------- postprocess


def test_postprocess_golden():
    budget = DetectionBudget(
        fcos_score_thresh=0.3, fcos_nms_thresh=0.5,
        fcos_detections_per_img=4, fcos_topk_candidates=8,
    )
    anchors = jnp.asarray(
        [[0, 0, 8, 8], [40, 40, 48, 48]], jnp.float32
    )

    def logit(p):
        return math.log(p / (1 - p))

    k_bg = 3
    logits = np.full((2, k_bg), logit(0.01), np.float32)
    logits[0, 1] = logit(0.81)
    logits[1, 2] = logit(0.64)
    ctr = np.asarray([logit(0.81), logit(0.25)], np.float32)
    # scores: sqrt(0.81*0.81)=0.81; sqrt(0.64*0.25)=0.4
    ltrb = np.zeros((2, 4), np.float32)
    ltrb[0] = [0.5, 0.5, 0.5, 0.5]  # box around (4,4) +- 4 -> [0,0,8,8]
    dets = fcos_postprocess_single(
        jnp.asarray(logits), jnp.asarray(ltrb), jnp.asarray(ctr),
        anchors, (2,), (64, 64), budget,
    )
    got = [
        (int(l), round(float(s), 3))
        for l, s, v in zip(dets.labels, dets.scores, dets.valid) if bool(v)
    ]
    assert got == [(1, 0.81), (2, 0.4)]
    np.testing.assert_allclose(np.asarray(dets.boxes[0]), [0, 0, 8, 8], atol=1e-5)


# --------------------------------------------------------------- detector


def _tiny_fcos_cfg(**kw):
    tiny_vit = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=64,
    )
    budget = DetectionBudget(
        fcos_topk_candidates=64, fcos_detections_per_img=10,
        fcos_score_thresh=0.001,
    )
    return DetectorConfig(
        backbone=BackboneConfig(vit=tiny_vit, fpn_out_channels=32),
        image_size=64, budget=budget, detector_kind="fcos", **kw,
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
    return images, gt_boxes, gt_labels, gt_valid


@pytest.fixture(scope="module")
def tiny_fcos():
    cfg = _tiny_fcos_cfg()
    return cfg, init_detector_params(jax.random.PRNGKey(0), cfg)


def test_detector_loss_keys_and_grads(tiny_fcos):
    cfg, params = tiny_fcos
    assert set(params) == {"backbone", "fcos_head"}
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()
    losses = jax.jit(
        lambda p, r: detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
    )(params, jax.random.PRNGKey(1))
    assert set(losses) == {
        "loss_classification", "loss_bbox_reg", "loss_bbox_ctrness"
    }
    assert all(np.isfinite(float(v)) for v in losses.values())

    g = jax.jit(jax.grad(
        lambda p, r: sum(
            detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg).values()
        )
    ))(params, jax.random.PRNGKey(1))
    zeros = [
        path for path, leaf in jax.tree_util.tree_leaves_with_path(g)
        if float(jnp.abs(leaf).sum()) == 0
    ]
    assert all("fpn" in jax.tree_util.keystr(p) for p in zeros), zeros
    assert len(zeros) == 4  # p2's unused FPN convs


def test_detector_predict_and_no_gt(tiny_fcos):
    cfg, params = tiny_fcos
    images, gt_boxes, gt_labels, _ = _tiny_batch()
    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    assert dets.boxes.shape == (2, 10, 4)
    lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
    if lab.size:
        assert ((lab >= 1) & (lab <= cfg.num_classes)).all()
    losses = jax.jit(
        lambda p, r: detector_loss(
            p, r, images, gt_boxes, gt_labels,
            jnp.zeros_like(gt_labels, bool), cfg,
        )
    )(params, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_config_validation():
    import dataclasses

    with pytest.raises(ValueError, match="cascade"):
        _tiny_fcos_cfg(cascade_iou_threshs=(0.5, 0.6))
    with pytest.raises(ValueError, match="mask"):
        _tiny_fcos_cfg(with_mask=True)
    with pytest.raises(ValueError, match="out of range"):
        _tiny_fcos_cfg(fcos_levels=(7,))
    # faster_rcnn ignores fcos_levels bounds
    dataclasses.replace(
        _tiny_fcos_cfg(), detector_kind="faster_rcnn", fcos_levels=(7,)
    )


@pytest.mark.slow
def test_fcos_overfits_tiny_batch():
    import optax

    cfg = _tiny_fcos_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()

    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    def step(carry, r):
        p, s = carry

        def total(p_):
            d = detector_loss(p_, r, images, gt_boxes, gt_labels, gt_valid, cfg)
            return sum(d.values())

        loss, g = jax.value_and_grad(total)(p)
        updates, s = tx.update(g, s, p)
        return (optax.apply_updates(p, updates), s), loss

    @jax.jit
    def run(p, s, key):
        return jax.lax.scan(step, (p, s), jax.random.split(key, 150))

    (params, _), losses = run(params, opt_state, jax.random.PRNGKey(42))
    losses = np.asarray(losses)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    from layoutdit_tpu.ops.boxes import box_iou

    top = dets.boxes[0, 0]
    ious = box_iou(top[None], gt_boxes[0][:2])
    assert float(ious.max()) > 0.25, np.asarray(ious)


@pytest.mark.slow
def test_fcos_trainer_eval_e2e(tmp_path):
    """config(detector=fcos) -> Trainer -> Evaluator, production path."""
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config

    root = str(tmp_path)
    make_fixture(root, n_images=8, split="samples", seed=1)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.detection_model_config.detector = "fcos"
    cfg.detection_model_config.detection_budget.fcos_topk_candidates = 200
    cfg.detection_model_config.detection_budget.fcos_detections_per_img = 50
    cfg.detection_model_config.detection_budget.fcos_score_thresh = 1e-3
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        assert np.isfinite(trainer.loss_history[0])
        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
        assert metrics is not None and np.isfinite(metrics["mAP"])
    finally:
        set_layout_dit_config(None)
