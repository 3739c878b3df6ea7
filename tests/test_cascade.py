"""Cascade R-CNN head tests (BASELINE config #3: DiT + cascade head).

The reference has no cascade capability (plain torchvision FasterRCNN,
model.py:45-55); parity targets here are the Cascade R-CNN formulation
itself (per-stage relabeling, class-agnostic refinement, score averaging)
plus wiring invariants against the base detector.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget, MeshConfig
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection import cascade as cascade_mod
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_loss,
    detector_predict,
    init_detector_params,
)
from layoutdit_tpu.models.vit import ViTConfig


def _cfg(cascade=(0.5, 0.6, 0.7), **kw):
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
        image_size=64, budget=budget, cascade_iou_threshs=cascade, **kw,
    )


def _batch():
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
def cascade_detector():
    cfg = _cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


# ------------------------------------------------------------- unit pieces


def test_params_structure(cascade_detector):
    cfg, params = cascade_detector
    assert "box_head" not in params and "box_predictor" not in params
    stages = params["cascade_heads"]
    assert set(stages) == {"s0", "s1", "s2"}
    for s in stages.values():
        # class-agnostic regression: 4 outputs, not (NC+1)*4
        assert s["box_predictor"]["bbox"]["kernel"].shape == (1024, 4)
        assert s["box_predictor"]["cls"]["kernel"].shape == (1024, 6)


def test_match_boxes_to_gt_semantics():
    gt = jnp.asarray([[10, 10, 30, 30], [50, 50, 70, 70]], jnp.float32)
    gt_labels = jnp.asarray([2, 4], jnp.int32)
    gt_valid = jnp.asarray([True, False])  # second gt is padding
    boxes = jnp.asarray(
        [[10, 10, 30, 30],   # exact hit on gt0
         [50, 50, 70, 70],   # exact hit on the INVALID gt -> background
         [0, 0, 5, 5],       # no overlap -> background
         [11, 11, 30, 30]],  # high IoU on gt0
        jnp.float32,
    )
    valid = jnp.asarray([True, True, True, False])
    t = cascade_mod.match_boxes_to_gt_single(
        boxes, valid, gt, gt_labels, gt_valid, 0.6, (10.0, 10.0, 5.0, 5.0)
    )
    np.testing.assert_array_equal(np.asarray(t.labels), [2, 0, 0, 0])
    # positive slot carries encoded regression target; background slots zero
    assert float(jnp.abs(t.reg_targets[0]).sum()) == 0.0  # exact match -> 0 deltas
    assert float(jnp.abs(t.reg_targets[1:]).sum()) == 0.0


def test_refine_boxes_identity_and_clip():
    boxes = jnp.asarray([[10.0, 10.0, 30.0, 30.0]])
    same = cascade_mod.refine_boxes(
        boxes, jnp.zeros((1, 4)), (10.0, 10.0, 5.0, 5.0), (64, 64)
    )
    np.testing.assert_allclose(np.asarray(same), np.asarray(boxes), atol=1e-5)
    # a large positive dx pushes the box right; clip keeps it inside
    moved = cascade_mod.refine_boxes(
        boxes, jnp.asarray([[100.0, 0, 0, 0]]), (10.0, 10.0, 5.0, 5.0), (64, 64)
    )
    assert float(moved[0, 0]) >= 0 and float(moved[0, 2]) <= 64


# ---------------------------------------------------------- full loss/pred


def test_cascade_loss_keys_finite_grads(cascade_detector):
    cfg, params = cascade_detector
    images, gt_boxes, gt_labels, gt_valid = _batch()

    def total(p, r):
        d = detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
        assert set(d) == {
            "loss_objectness", "loss_rpn_box_reg",
            "loss_classifier", "loss_box_reg",
        }
        return sum(d.values()), d

    (tot, d), g = jax.jit(jax.value_and_grad(total, has_aux=True))(
        params, jax.random.PRNGKey(1)
    )
    assert np.isfinite(float(tot))
    for v in d.values():
        assert np.isfinite(float(v))
    # every stage's head must receive gradient
    for s in ("s0", "s1", "s2"):
        leaves = jax.tree_util.tree_leaves(g["cascade_heads"][s])
        assert all(bool(jnp.isfinite(l).all()) for l in leaves)
        assert sum(float(jnp.abs(l).sum()) for l in leaves) > 0


def test_cascade_predict_shapes_and_bounds(cascade_detector):
    cfg, params = cascade_detector
    images, *_ = _batch()
    dets = jax.jit(lambda p: detector_predict(p, images, cfg))(params)
    d = cfg.budget.box_detections_per_img
    assert dets.boxes.shape == (2, d, 4)
    assert dets.scores.shape == (2, d)
    assert dets.labels.shape == (2, d)
    assert dets.valid.dtype == jnp.bool_
    b = np.asarray(dets.boxes)
    assert (b >= 0).all() and (b <= 64).all()
    lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
    assert ((lab >= 1) & (lab <= 5)).all()
    s = np.asarray(dets.scores)
    assert (s >= 0).all() and (s <= 1).all()


def test_single_stage_classifier_matches_plain_head():
    """With one stage at the budget's threshold/weights and the SAME head
    params, cascade stage-0 CE must equal the plain path's
    loss_classifier (the sampled set and cls branch are identical; only
    the regression parameterisation differs)."""
    plain_cfg = _cfg(cascade=())
    plain_params = init_detector_params(jax.random.PRNGKey(0), plain_cfg)

    cas_cfg = _cfg(cascade=(0.5,), cascade_stage_loss_weights=(1.0,))
    cas_params = init_detector_params(jax.random.PRNGKey(0), cas_cfg)
    # graft the plain head's weights into stage 0 (cls branch shapes match)
    cas_params = dict(cas_params)
    cas_params["backbone"] = plain_params["backbone"]
    cas_params["rpn_head"] = plain_params["rpn_head"]
    s0 = cas_params["cascade_heads"]["s0"]
    s0["box_head"] = plain_params["box_head"]
    s0["box_predictor"] = {
        "cls": plain_params["box_predictor"]["cls"],
        "bbox": s0["box_predictor"]["bbox"],
    }

    images, gt_boxes, gt_labels, gt_valid = _batch()
    r = jax.random.PRNGKey(7)
    plain = jax.jit(
        lambda p: detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, plain_cfg)
    )(plain_params)
    cas = jax.jit(
        lambda p: detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cas_cfg)
    )(cas_params)
    np.testing.assert_allclose(
        float(cas["loss_classifier"]), float(plain["loss_classifier"]), rtol=1e-5
    )
    np.testing.assert_allclose(
        float(cas["loss_objectness"]), float(plain["loss_objectness"]), rtol=1e-5
    )


def test_cascade_checkpoint_roundtrip(tmp_path, cascade_detector):
    """The per-stage param tree survives a full-state msgpack round-trip."""
    from layoutdit_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    cfg, params = cascade_detector
    path = str(tmp_path / "cas.msgpack")
    save_checkpoint(path, params=params, opt_state=None, epoch=3)
    state = load_checkpoint(path, params_template=params)
    restored = state["params"]
    for a, b in zip(
        jax.tree_util.tree_leaves(params), jax.tree_util.tree_leaves(restored)
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert state["epoch"] == 3


def test_cascade_param_specs_tp():
    """TP sharding rules cover every cascade stage's TwoMLPHead (each is
    the same big fc6/fc7 GEMM pair as the plain head — Megatron column/
    row split) while the tiny per-stage predictors stay replicated."""
    from jax.sharding import PartitionSpec as P

    from layoutdit_tpu.parallel.mesh import build_mesh
    from layoutdit_tpu.parallel.sharding import detector_param_specs

    cfg = _cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    specs = detector_param_specs(params, mesh)
    for stage in specs["cascade_heads"].values():
        assert stage["box_head"]["fc6"]["kernel"][-1] == "model"
        assert stage["box_head"]["fc7"]["kernel"] == P("model", None)
        for leaf in jax.tree_util.tree_leaves(
            stage["box_predictor"], is_leaf=lambda x: isinstance(x, P)
        ):
            assert leaf == P()
    # encoder is still TP-sharded
    flat = jax.tree_util.tree_leaves(
        specs["backbone"], is_leaf=lambda x: isinstance(x, P)
    )
    assert any(leaf != P() for leaf in flat)


def test_cascade_tp_loss_matches_single_device():
    """Cascade loss with TP-sharded stage heads == unsharded numerics."""
    import numpy as _np

    from layoutdit_tpu.parallel.mesh import (
        batch_sharding,
        build_mesh,
    )
    from layoutdit_tpu.parallel.sharding import shard_params

    cfg = _cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, gt_boxes, gt_labels, gt_valid = _batch()
    rng = jax.random.PRNGKey(3)
    ref = jax.jit(
        lambda p: sum(detector_loss(
            p, rng, images, gt_boxes, gt_labels, gt_valid, cfg
        ).values())
    )(params)
    mesh = build_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    sharded = shard_params(params, mesh)
    data = batch_sharding(mesh)
    got = jax.jit(
        lambda p, im, gb, gl, gv: sum(detector_loss(
            p, rng, im, gb, gl, gv, cfg
        ).values()),
        in_shardings=(None, data, data, data, data),
    )(sharded, images, gt_boxes, gt_labels, gt_valid)
    _np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


# ----------------------------------------------------------- dp-mesh step


def test_cascade_dp_mesh_train_step():
    """One cascade train step data-parallel over the 8-device CPU mesh
    (BASELINE config #3's dp-over-mesh requirement, scaled down)."""
    from layoutdit_tpu.parallel.mesh import batch_sharding, build_mesh_for_batch
    from layoutdit_tpu.parallel.sharding import shard_params

    cfg = _cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh_for_batch(MeshConfig(data_parallel=-1), batch_size=2)
    params = shard_params(params, mesh)
    images, gt_boxes, gt_labels, gt_valid = _batch()
    bs = batch_sharding(mesh)
    images = jax.device_put(images, bs)

    @jax.jit
    def step(p, r):
        d = detector_loss(p, r, images, gt_boxes, gt_labels, gt_valid, cfg)
        return sum(d.values())

    loss = step(params, jax.random.PRNGKey(1))
    assert np.isfinite(float(loss))
