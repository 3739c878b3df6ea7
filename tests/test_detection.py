"""Detection-stack tests: anchors, matcher/sampler, full detector
loss/grad/inference, and a tiny overfit run (behavioral parity evidence,
SURVEY.md §4)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.anchors import cell_anchors, grid_anchors
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_loss,
    detector_predict,
    init_detector_params,
    rescale_detections,
)
from layoutdit_tpu.models.detection.rpn import (
    balanced_sample,
    match_anchors_to_gt,
)
from layoutdit_tpu.models.vit import ViTConfig

# ------------------------------------------------------------------ anchors


def test_cell_anchors_known_values():
    # torchvision: size 32, ratio 1.0 -> [-16, -16, 16, 16]
    base = cell_anchors((32.0,), (0.5, 1.0, 2.0))
    np.testing.assert_array_equal(base[1], [-16, -16, 16, 16])
    # ratio 0.5: h = 32*sqrt(0.5) ~ 22.6 -> w = 32/sqrt(0.5) ~ 45.25
    np.testing.assert_array_equal(base[0], [-23, -11, 23, 11])
    np.testing.assert_array_equal(base[2], [-11, -23, 11, 23])


def test_grid_anchors_layout():
    anchors, counts = grid_anchors(
        (224, 224), ((56, 56), (28, 28), (14, 14), (7, 7), (4, 4)),
        ((32.0,), (64.0,), (128.0,), (256.0,), (512.0,)),
        ((0.5, 1.0, 2.0),) * 5,
    )
    assert counts == (9408, 2352, 588, 147, 48)
    assert anchors.shape == (12543, 4)
    # first cell of p2 is centered at (0, 0): square anchor [-16,-16,16,16]
    np.testing.assert_array_equal(anchors[1], [-16, -16, 16, 16])
    # second cell center shifts by stride 4 in x
    np.testing.assert_array_equal(anchors[4], [-12, -16, 20, 16])


# ---------------------------------------------------------- matcher/sampler


def test_matcher_thresholds_and_low_quality():
    anchors = jnp.asarray(
        [[0, 0, 10, 10], [0, 0, 9, 11], [50, 50, 60, 60], [0, 0, 4, 4]],
        jnp.float32,
    )
    gt = jnp.asarray([[0, 0, 10, 10], [52, 50, 60, 61]], jnp.float32)
    gt_valid = jnp.asarray([True, True])
    midx, labels = match_anchors_to_gt(anchors, gt, gt_valid, 0.7, 0.3, True)
    labels = np.asarray(labels)
    midx = np.asarray(midx)
    assert labels[0] == 1 and midx[0] == 0  # IoU 1.0
    assert labels[1] == 1  # IoU ~0.8
    assert labels[2] == 1 and midx[2] == 1  # best for gt2 (low-quality allowed)
    assert labels[3] == 0  # IoU 0.16 < 0.3 -> background


def test_matcher_between_is_ignored():
    anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gt = jnp.asarray([[0, 0, 10, 5], [20, 20, 30, 30]], jnp.float32)  # IoU 0.5
    # second gt keeps anchor from being the global best of gt1? it is best
    # for gt1 -> low-quality promotes it; disable to test the ignore band.
    _, labels = match_anchors_to_gt(
        anchors, gt, jnp.asarray([True, True]), 0.7, 0.3, False
    )
    assert int(labels[0]) == -1


def test_matcher_no_gt_all_background():
    anchors = jnp.asarray([[0, 0, 10, 10]], jnp.float32)
    gt = jnp.zeros((2, 4), jnp.float32)
    _, labels = match_anchors_to_gt(
        anchors, gt, jnp.asarray([False, False]), 0.7, 0.3, True
    )
    assert int(labels[0]) == 0


def test_balanced_sample_counts():
    labels = jnp.asarray([1] * 300 + [0] * 1000 + [-1] * 200)
    mask = balanced_sample(labels, jax.random.PRNGKey(0), 256, 0.5)
    mask = np.asarray(mask)
    assert mask.sum() == 256
    assert mask[:300].sum() == 128  # capped positives
    assert mask[1300:].sum() == 0  # ignored never sampled

    labels2 = jnp.asarray([1] * 10 + [0] * 1000)
    mask2 = np.asarray(balanced_sample(labels2, jax.random.PRNGKey(1), 256, 0.5))
    assert mask2[:10].sum() == 10
    assert mask2.sum() == 256  # backfilled with negatives


# ------------------------------------------------------------ full detector


def _tiny_cfg():
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
        image_size=64, budget=budget,
    )


@pytest.fixture(scope="module")
def tiny_detector():
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


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


def test_detector_loss_keys_and_finiteness(tiny_detector):
    cfg, params = tiny_detector
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()
    losses = jax.jit(
        lambda p, r: detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
    )(params, jax.random.PRNGKey(1))
    # same four keys the reference trainer sums (trainer.py:111-117)
    assert set(losses) == {
        "loss_objectness", "loss_rpn_box_reg", "loss_classifier", "loss_box_reg"
    }
    for v in losses.values():
        assert np.isfinite(float(v))
    # classifier starts near log(NC+1), objectness near log(2)
    assert abs(float(losses["loss_objectness"]) - np.log(2)) < 0.1
    assert abs(float(losses["loss_classifier"]) - np.log(6)) < 0.5


def test_detector_grads_flow_everywhere(tiny_detector):
    cfg, params = tiny_detector
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()

    def total(p, r):
        return sum(
            detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg).values()
        )

    g = jax.jit(jax.grad(total))(params, jax.random.PRNGKey(1))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(l).all()) for l in leaves)
    nonzero = sum(float(jnp.abs(l).sum()) > 0 for l in leaves)
    assert nonzero == len(leaves)


def test_detector_no_gt_does_not_nan(tiny_detector):
    cfg, params = tiny_detector
    images, gt_boxes, gt_labels, _ = _tiny_batch()
    gt_valid = jnp.zeros_like(gt_labels, dtype=bool)
    losses = jax.jit(
        lambda p, r: detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
    )(params, jax.random.PRNGKey(1))
    for v in losses.values():
        assert np.isfinite(float(v))
    assert float(losses["loss_rpn_box_reg"]) == 0.0
    assert float(losses["loss_box_reg"]) == 0.0


def test_detector_predict_shapes(tiny_detector):
    cfg, params = tiny_detector
    images, *_ = _tiny_batch()
    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    d = cfg.budget.box_detections_per_img
    assert dets.boxes.shape == (2, d, 4)
    assert dets.scores.shape == (2, d)
    assert dets.labels.shape == (2, d)
    assert bool(jnp.isfinite(dets.boxes).all())
    # boxes clipped to image
    assert float(dets.boxes.min()) >= 0 and float(dets.boxes.max()) <= 64
    # labels in 1..NC for valid slots
    lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
    assert ((lab >= 1) & (lab <= cfg.num_classes)).all()


def test_rescale_detections(tiny_detector):
    cfg, params = tiny_detector
    images, *_ = _tiny_batch()
    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    orig = jnp.asarray([[128.0, 256.0], [64.0, 64.0]])
    out = rescale_detections(dets, orig, cfg.image_size)
    np.testing.assert_allclose(
        np.asarray(out.boxes[0, :, 0]), np.asarray(dets.boxes[0, :, 0]) * 4.0,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.boxes[0, :, 1]), np.asarray(dets.boxes[0, :, 1]) * 2.0,
        rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(out.boxes[1]), np.asarray(dets.boxes[1]), rtol=1e-6
    )


@pytest.mark.slow
def test_detector_overfits_tiny_batch():
    """Behavioral check: SGD on one batch drives total loss sharply down and
    the top detection localizes a gt box."""
    import optax

    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, gt_boxes, gt_labels, gt_valid = _tiny_batch()

    tx = optax.adamw(3e-4)
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
        return jax.lax.scan(step, (p, s), jax.random.split(key, 120))

    (params, opt_state), losses = run(params, opt_state, jax.random.PRNGKey(42))
    losses = np.asarray(losses)
    assert losses[-1] < 0.5 * losses[0], (losses[0], losses[-1])

    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    from layoutdit_tpu.ops.boxes import box_iou

    top = dets.boxes[0, 0]
    ious = box_iou(top[None], gt_boxes[0][:2])
    assert float(ious.max()) > 0.25, np.asarray(ious)
