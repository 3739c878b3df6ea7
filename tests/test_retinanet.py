"""RetinaNet single-stage family tests: head init/ordering, focal loss,
loss normalization (numpy transcription oracle of torchvision
RetinaNetClassificationHead/RetinaNetRegressionHead.compute_loss —
torchvision is not installed here; semantics transcribed by hand, see
models/detection/retinanet.py docstring), postprocess goldens, config
validation, detector-level integration, and a trainer/evaluator e2e.
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
from layoutdit_tpu.models.detection.retinanet import (
    init_retinanet_head_params,
    retinanet_head_forward,
    retinanet_loss,
    retinanet_postprocess_single,
    sigmoid_focal_loss,
)
from layoutdit_tpu.models.vit import ViTConfig

# ------------------------------------------------------------------- head


def test_head_init_shapes_and_prior_bias():
    p = init_retinanet_head_params(jax.random.PRNGKey(0), 32, 3, 6)
    assert p["cls"]["final"]["kernel"].shape == (18, 32, 3, 3)
    assert p["reg"]["final"]["kernel"].shape == (12, 32, 3, 3)
    # focal prior bias -log((1-0.01)/0.01)
    np.testing.assert_allclose(
        np.asarray(p["cls"]["final"]["bias"]), -math.log(99.0), rtol=1e-6
    )
    np.testing.assert_array_equal(np.asarray(p["reg"]["final"]["bias"]), 0.0)
    for i in (1, 2, 3, 4):
        assert p["cls"][f"conv{i}"]["kernel"].shape == (32, 32, 3, 3)


def test_head_flatten_order_matches_anchor_grid():
    """The (level, y, x, anchor) flatten must match anchors.grid_anchors:
    flat index n = (y*W + x)*A + a, class channel k = torch channel
    a*K + k (torchvision RetinaNetHead view/permute)."""
    a_cells, k_cls = 2, 3
    c, h, w = 4, 2, 3
    # head with NO hidden convs: logits[o] = sum_c kernel[o,c,1,1]*feat[c]
    p = init_retinanet_head_params(
        jax.random.PRNGKey(0), c, a_cells, k_cls, num_convs=0
    )
    kern = np.zeros((a_cells * k_cls, c, 3, 3), np.float32)
    for o in range(a_cells * k_cls):
        kern[o, 0, 1, 1] = float(o + 1)  # logits[o] = (o+1) * feat[0]
    p["cls"]["final"] = {
        "kernel": jnp.asarray(kern),
        "bias": jnp.zeros((a_cells * k_cls,), jnp.float32),
    }
    feat = np.zeros((1, c, h, w), np.float32)
    for y in range(h):
        for x in range(w):
            feat[0, 0, y, x] = 1 + y * w + x  # position code
    cls_out, _ = retinanet_head_forward(p, [jnp.asarray(feat)], a_cells)
    assert cls_out.shape == (1, h * w * a_cells, k_cls)
    out = np.asarray(cls_out[0])
    for y in range(h):
        for x in range(w):
            for a in range(a_cells):
                n = (y * w + x) * a_cells + a
                for k in range(k_cls):
                    o = a * k_cls + k
                    assert out[n, k] == pytest.approx(
                        (o + 1) * feat[0, 0, y, x]
                    ), (y, x, a, k)


# ------------------------------------------------------------------- loss


def test_sigmoid_focal_loss_known_values():
    # logits 0, target 1: p=0.5, ce=log 2, focal = 0.25 * 0.5^2 * log 2
    got = float(sigmoid_focal_loss(jnp.asarray([0.0]), jnp.asarray([1.0]))[0])
    assert got == pytest.approx(0.25 * 0.25 * math.log(2.0), rel=1e-6)
    # logits 0, target 0: alpha 0.75 branch
    got0 = float(sigmoid_focal_loss(jnp.asarray([0.0]), jnp.asarray([0.0]))[0])
    assert got0 == pytest.approx(0.75 * 0.25 * math.log(2.0), rel=1e-6)
    # well-classified positive contributes ~0
    big = float(sigmoid_focal_loss(jnp.asarray([12.0]), jnp.asarray([1.0]))[0])
    assert big < 1e-8


def _focal_ref(x, t, alpha=0.25, gamma=2.0):
    p = 1.0 / (1.0 + np.exp(-x))
    ce = np.maximum(x, 0) - x * t + np.log1p(np.exp(-np.abs(x)))
    p_t = p * t + (1 - p) * (1 - t)
    return (alpha * t + (1 - alpha) * (1 - t)) * (1 - p_t) ** gamma * ce


def test_retinanet_loss_vs_numpy_transcription():
    """Full loss (matcher 0.5/0.4 + low-quality, per-image normalization,
    batch mean) vs an independent numpy transcription on explicit anchors."""
    anchors = np.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 11], [100, 100, 110, 110],
         [0, 0, 30, 30], [98, 98, 112, 112]], np.float32,
    )
    gt_boxes = np.asarray(
        [[[0, 0, 10, 10], [100, 100, 110, 110]],
         [[0, 0, 30, 30], [0, 0, 0, 0]]], np.float32,
    )
    gt_labels = np.asarray([[2, 5], [1, 0]], np.int32)
    gt_valid = np.asarray([[True, True], [True, False]])
    rng = np.random.default_rng(3)
    k_bg = 6
    logits = rng.normal(size=(2, 5, k_bg)).astype(np.float32)
    deltas = rng.normal(scale=0.1, size=(2, 5, 4)).astype(np.float32)
    budget = DetectionBudget()

    got_cls, got_reg = retinanet_loss(
        jnp.asarray(logits), jnp.asarray(deltas), jnp.asarray(anchors),
        jnp.asarray(gt_boxes), jnp.asarray(gt_labels), jnp.asarray(gt_valid),
        budget,
    )

    # ---- independent numpy oracle
    def iou(a, b):
        ax1, ay1, ax2, ay2 = a
        bx1, by1, bx2, by2 = b
        iw = max(0.0, min(ax2, bx2) - max(ax1, bx1))
        ih = max(0.0, min(ay2, by2) - max(ay1, by1))
        inter = iw * ih
        ua = (ax2 - ax1) * (ay2 - ay1) + (bx2 - bx1) * (by2 - by1) - inter
        return inter / ua if ua > 0 else 0.0

    exp_cls, exp_reg = [], []
    for b in range(2):
        gts = [g for g, v in zip(gt_boxes[b], gt_valid[b]) if v]
        m = np.array([[iou(g, a) for a in anchors] for g in gts])  # [G, N]
        vals, idx = m.max(0), m.argmax(0)
        lab = np.where(vals >= 0.5, 1, np.where(vals < 0.4, 0, -1))
        # low-quality: anchors tying each gt's best IoU become positive
        for g in range(len(gts)):
            best = m[g].max()
            for a in range(5):
                if m[g, a] == best:
                    lab[a] = 1
        fg = lab == 1
        nfg = max(1, int(fg.sum()))
        onehot = np.zeros((5, k_bg), np.float32)
        for a in range(5):
            if fg[a]:
                onehot[a, gt_labels[b][idx[a]]] = 1.0
        focal = _focal_ref(logits[b], onehot)
        exp_cls.append(focal[lab != -1].sum() / nfg)
        # regression: encode matched gt vs anchor, weights (1,1,1,1)
        reg = 0.0
        for a in range(5):
            if not fg[a]:
                continue
            g = gts[idx[a]]
            aw, ah = anchors[a][2] - anchors[a][0], anchors[a][3] - anchors[a][1]
            acx, acy = anchors[a][0] + aw / 2, anchors[a][1] + ah / 2
            gw, gh = g[2] - g[0], g[3] - g[1]
            gcx, gcy = g[0] + gw / 2, g[1] + gh / 2
            t = np.array(
                [(gcx - acx) / aw, (gcy - acy) / ah,
                 np.log(gw / aw), np.log(gh / ah)]
            )
            reg += np.abs(deltas[b, a] - t).sum()
        exp_reg.append(reg / nfg)

    assert float(got_cls) == pytest.approx(np.mean(exp_cls), rel=1e-5)
    assert float(got_reg) == pytest.approx(np.mean(exp_reg), rel=1e-5)


def test_retinanet_loss_no_gt_is_finite():
    anchors = jnp.asarray([[0, 0, 10, 10], [5, 5, 20, 20]], jnp.float32)
    logits = jnp.zeros((1, 2, 6))
    deltas = jnp.zeros((1, 2, 4))
    gt_boxes = jnp.zeros((1, 2, 4))
    gt_labels = jnp.zeros((1, 2), jnp.int32)
    gt_valid = jnp.zeros((1, 2), bool)
    lc, lr = retinanet_loss(
        logits, deltas, anchors, gt_boxes, gt_labels, gt_valid,
        DetectionBudget(),
    )
    assert np.isfinite(float(lc)) and float(lr) == 0.0


# ------------------------------------------------------------- postprocess


def test_postprocess_golden_small_case():
    """One level, two anchors: score threshold, per-class NMS isolation,
    background-channel exclusion, final ordering."""
    budget = DetectionBudget(
        retinanet_score_thresh=0.05, retinanet_nms_thresh=0.5,
        retinanet_detections_per_img=4, retinanet_topk_candidates=8,
    )
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [1, 1, 11, 11], [40, 40, 60, 60]], jnp.float32
    )
    k_bg = 3  # background + 2 classes

    def logit(p):
        return math.log(p / (1 - p))

    logits = np.full((3, k_bg), logit(0.01), np.float32)
    logits[0, 1] = logit(0.9)  # anchor0 class1 0.9
    logits[1, 1] = logit(0.8)  # anchor1 class1 0.8 -> IoU with anchor0 ~0.68 suppressed
    logits[1, 2] = logit(0.7)  # anchor1 class2 survives (other class)
    logits[2, 2] = logit(0.6)  # anchor2 class2, far away, survives
    logits[0, 0] = logit(0.99)  # background channel must be ignored
    dets = retinanet_postprocess_single(
        jnp.asarray(logits), jnp.zeros((3, 4)), anchors, (3,), (64, 64), budget
    )
    got = [
        (int(l), round(float(s), 4))
        for l, s, v in zip(dets.labels, dets.scores, dets.valid) if bool(v)
    ]
    assert got == [(1, 0.9), (2, 0.7), (2, 0.6)]
    # suppressed anchor1-class1 and sub-threshold rows are invalid padding
    assert int(dets.valid.sum()) == 3
    np.testing.assert_allclose(np.asarray(dets.boxes[0]), [0, 0, 10, 10])


def test_postprocess_respects_score_threshold_and_clip():
    budget = DetectionBudget(
        retinanet_score_thresh=0.5, retinanet_detections_per_img=4,
        retinanet_topk_candidates=4,
    )
    anchors = jnp.asarray([[-5, -5, 200, 200]], jnp.float32)
    logits = np.full((1, 3), -10.0, np.float32)
    logits[0, 1] = 2.0  # sigmoid ~0.88 > 0.5
    dets = retinanet_postprocess_single(
        jnp.asarray(logits), jnp.zeros((1, 4)), anchors, (1,), (64, 64), budget
    )
    assert int(dets.valid.sum()) == 1
    np.testing.assert_allclose(np.asarray(dets.boxes[0]), [0, 0, 64, 64])


# --------------------------------------------------------------- detector


def _tiny_retina_cfg(**kw):
    tiny_vit = ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=64,
    )
    budget = DetectionBudget(
        retinanet_topk_candidates=64, retinanet_detections_per_img=10,
    )
    return DetectorConfig(
        backbone=BackboneConfig(vit=tiny_vit, fpn_out_channels=32),
        image_size=64, budget=budget, detector_kind="retinanet", **kw,
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
def tiny_retina():
    cfg = _tiny_retina_cfg()
    return cfg, init_detector_params(jax.random.PRNGKey(0), cfg)


def test_detector_loss_keys_and_grads(tiny_retina):
    cfg, params = tiny_retina
    assert set(params) == {"backbone", "retinanet_head"}
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()
    losses = jax.jit(
        lambda p, r: detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
    )(params, jax.random.PRNGKey(1))
    assert set(losses) == {"loss_classification", "loss_bbox_reg"}
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
    # only p2's FPN convs (level 0, excluded by retinanet_levels) are dead
    assert all("fpn" in jax.tree_util.keystr(p) for p in zeros), zeros
    assert len(zeros) == 4


def test_detector_predict_shapes_and_labels(tiny_retina):
    cfg, params = tiny_retina
    images, *_ = _tiny_batch()
    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    assert dets.boxes.shape == (2, 10, 4)
    assert float(dets.boxes.min()) >= 0 and float(dets.boxes.max()) <= 64
    lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
    assert ((lab >= 1) & (lab <= cfg.num_classes)).all()


def test_detector_no_gt_does_not_nan(tiny_retina):
    cfg, params = tiny_retina
    images, gt_boxes, gt_labels, _ = _tiny_batch()
    losses = jax.jit(
        lambda p, r: detector_loss(
            p, r, images, gt_boxes, gt_labels,
            jnp.zeros_like(gt_labels, bool), cfg,
        )
    )(params, jax.random.PRNGKey(1))
    assert all(np.isfinite(float(v)) for v in losses.values())


def test_config_validation():
    with pytest.raises(ValueError, match="cascade"):
        _tiny_retina_cfg(cascade_iou_threshs=(0.5, 0.6))
    with pytest.raises(ValueError, match="mask"):
        _tiny_retina_cfg(with_mask=True)
    with pytest.raises(ValueError, match="out of range"):
        _tiny_retina_cfg(retinanet_levels=(1, 9))
    import dataclasses

    with pytest.raises(ValueError, match="detector_kind"):
        dataclasses.replace(_tiny_retina_cfg(), detector_kind="yolo")


def test_from_model_config_roundtrip():
    from layoutdit_tpu.config.constructs import ModelConfig

    mc = ModelConfig(
        detector="retinanet", retinanet_levels=[0, 1, 2, 3, 4],
        vit_overrides={
            "hidden_size": 32, "num_hidden_layers": 2,
            "num_attention_heads": 2, "intermediate_size": 64,
        },
        image_size=64, fpn_out_channels=32,
    )
    cfg = DetectorConfig.from_model_config(mc)
    assert cfg.detector_kind == "retinanet"
    assert cfg.retinanet_levels == (0, 1, 2, 3, 4)
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    assert "retinanet_head" in params


@pytest.mark.slow
def test_retinanet_overfits_tiny_batch():
    """Single-stage counterpart of test_detector_overfits_tiny_batch."""
    import optax

    cfg = _tiny_retina_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()

    tx = optax.adamw(1e-3)
    opt_state = tx.init(params)

    def step(carry, r):
        p, s = carry

        def total(p):
            d = detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
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


# ---------------------------------------------------------------- e2e


@pytest.mark.slow
def test_retinanet_trainer_eval_e2e(tmp_path):
    """config(detector=retinanet) -> Trainer -> checkpoint -> Evaluator
    through the production path."""
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.tools.make_fixture import make_fixture, write_fixture_config

    root = str(tmp_path)
    make_fixture(root, n_images=8, split="samples", seed=1)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    cfg.detection_model_config.detector = "retinanet"
    cfg.detection_model_config.detection_budget.retinanet_topk_candidates = 200
    cfg.detection_model_config.detection_budget.retinanet_detections_per_img = 50
    # a 1-epoch random-init head still scores near the focal prior (~0.01);
    # drop the serving threshold so the scorer sees predictions
    cfg.detection_model_config.detection_budget.retinanet_score_thresh = 1e-3
    set_layout_dit_config(cfg)
    try:
        from layoutdit_tpu.eval.evaluator import Evaluator
        from layoutdit_tpu.models.model import build_model
        from layoutdit_tpu.train.trainer import Trainer

        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        assert len(trainer.loss_history) == 1
        assert np.isfinite(trainer.loss_history[0])
        run_dir = os.path.join(root, "fixture")
        assert os.path.exists(
            os.path.join(run_dir, "model_checkpoints", "epoch_1.msgpack")
        )

        metrics = Evaluator(model=model, layout_dit_config=cfg).score()
        assert metrics is not None and np.isfinite(metrics["mAP"])
    finally:
        set_layout_dit_config(None)
