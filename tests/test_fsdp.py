"""FSDP (ZeRO-3 style) parameter sharding over the data axis.

Params/grads/optimizer state live sharded at rest; GSPMD inserts the
all-gathers at use sites and reduce-scatters for gradients. These tests
pin the at-rest layout rules and prove numerics neutrality vs the
replicated baseline on the virtual 8-device CPU mesh (SURVEY.md §2.3 —
the reference scales only via torch DDP; FSDP is the TPU-native lever
for models whose optimizer state exceeds one chip's HBM)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from layoutdit_tpu.config.constructs import DetectionBudget, MeshConfig
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_loss,
    init_detector_params,
)
from layoutdit_tpu.models.vit import ViTConfig
from layoutdit_tpu.parallel import sharding as sharding_mod
from layoutdit_tpu.parallel.mesh import batch_sharding, build_mesh
from layoutdit_tpu.parallel.sharding import (
    _fsdp_spec,
    detector_param_specs,
    init_opt_state_sharded,
    shard_params,
)


def _tiny_cfg():
    return DetectorConfig(
        backbone=BackboneConfig(
            vit=ViTConfig(hidden_size=32, num_hidden_layers=2,
                          num_attention_heads=4, intermediate_size=64,
                          image_size=64),
            fpn_out_channels=32,
        ),
        image_size=64,
        budget=DetectionBudget(
            rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=64,
            rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=64,
            box_batch_size_per_image=16, box_detections_per_img=8,
        ),
    )


def _batch(b=8):
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (b, 3, 64, 64)), jnp.float32)
    gt_boxes = jnp.asarray(
        np.tile(np.array([[[5, 5, 30, 40], [20, 10, 60, 50]]], np.float32),
                (b, 1, 1))
    )
    gt_labels = jnp.asarray(np.tile([[1, 3]], (b, 1)), jnp.int32)
    gt_valid = jnp.ones((b, 2), bool)
    return images, gt_boxes, gt_labels, gt_valid


@pytest.fixture
def small_fsdp_threshold(monkeypatch):
    """The production threshold (2**14) targets dit-base-sized leaves;
    the tiny test model's leaves are all smaller, so lower it to make
    the layout rules observable."""
    monkeypatch.setattr(sharding_mod, "_FSDP_MIN_ELEMENTS", 256)


def test_fsdp_spec_rules():
    big = jnp.zeros((512, 96))
    # largest dim that divides dp takes the data axis
    assert _fsdp_spec(big, P(), "data", 8) == P("data")
    assert _fsdp_spec(big, P(), "data", 3) == P(None, "data")
    # TP dim occupied -> data axis lands on the next-largest free dim
    assert _fsdp_spec(big, P("model"), "data", 8) == P("model", "data")
    # composes into 2D sharding when dim0 is free
    assert _fsdp_spec(big, P(None, "model"), "data", 8) == P("data", "model")
    # no dim divisible -> untouched
    assert _fsdp_spec(jnp.zeros((509, 97)), P(), "data", 8) == P()
    # small leaves stay replicated
    assert _fsdp_spec(jnp.zeros((64,)), P(), "data", 8) == P()


def test_fsdp_param_specs(small_fsdp_threshold):
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    specs = detector_param_specs(params, mesh, fsdp=True)
    layer0 = specs["backbone"]["vit"]["layers"][0]
    # mlp_in kernel [32, 64]: 2048 elems >= 256 -> sharded on dim 1 (64 % 8 == 0)
    assert layer0["mlp_in"]["kernel"] == P(None, "data")
    # LN scale [32]: 32 elems < 256 -> replicated
    assert layer0["ln1"]["scale"] == P()
    # fsdp=False must leave the pure-DP layout fully replicated
    specs_off = detector_param_specs(params, mesh, fsdp=False)
    assert specs_off["backbone"]["vit"]["layers"][0]["mlp_in"]["kernel"] == P()


def test_fsdp_composes_with_tp(small_fsdp_threshold):
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    specs = detector_param_specs(params, mesh, fsdp=True)
    layer0 = specs["backbone"]["vit"]["layers"][0]
    # Megatron column-parallel kernel [32, 64] P(None, 'model') gains the
    # data axis on its free dim 0 (32 % 4 == 0) -> fully 2D-sharded
    assert layer0["mlp_in"]["kernel"] == P("data", "model")
    assert layer0["mlp_out"]["kernel"] == P("model", "data")


def test_fsdp_loss_matches_replicated(small_fsdp_threshold):
    """At-rest sharding must be numerics-neutral: GSPMD's all-gathers
    reconstruct the exact replicated weights."""
    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images, gt_boxes, gt_labels, gt_valid = _batch(8)
    rng = jax.random.PRNGKey(7)

    ref = jax.jit(
        lambda p: sum(
            detector_loss(p, rng, images, gt_boxes, gt_labels, gt_valid, cfg).values()
        )
    )(params)

    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    sharded = shard_params(params, mesh, fsdp=True)
    data = batch_sharding(mesh)
    got = jax.jit(
        lambda p, im, gb, gl, gv: sum(
            detector_loss(p, rng, im, gb, gl, gv, cfg).values()
        ),
        in_shardings=(None, data, data, data, data),
    )(sharded, images, gt_boxes, gt_labels, gt_valid)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_fsdp_train_step_keeps_shardings(small_fsdp_threshold):
    """One optimizer step: moment buffers inherit the FSDP layout via a
    jitted tx.init, and the updated params come back still sharded (no
    silent re-replication — that would defeat the memory win)."""
    import optax

    cfg = _tiny_cfg()
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    mesh = build_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    params = shard_params(params, mesh, fsdp=True)
    tx = optax.adamw(1e-4)
    opt_state = init_opt_state_sharded(tx, params, mesh)

    fsdp_spec = P(None, "data")
    mu = opt_state[0].mu["backbone"]["vit"]["layers"][0]["mlp_in"]["kernel"]
    assert mu.sharding.spec == fsdp_spec  # optimizer state sharded at rest

    data = batch_sharding(mesh)

    def step(p, s, rng, *batch):
        loss, g = jax.value_and_grad(
            lambda p: sum(detector_loss(p, rng, *batch, cfg).values())
        )(p)
        u, s = tx.update(g, s, p)
        return optax.apply_updates(p, u), s, loss

    train = jax.jit(
        step, in_shardings=(None, None, None, data, data, data, data)
    )
    p2, s2, loss = train(params, opt_state, jax.random.PRNGKey(1), *_batch(8))
    assert np.isfinite(float(loss))
    k2 = p2["backbone"]["vit"]["layers"][0]["mlp_in"]["kernel"]
    assert k2.sharding.spec == fsdp_spec
    mu2 = s2[0].mu["backbone"]["vit"]["layers"][0]["mlp_in"]["kernel"]
    assert mu2.sharding.spec == fsdp_spec
