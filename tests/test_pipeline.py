"""Pipeline-parallel encoder tests on the virtual 8-device CPU mesh.

The GPipe schedule (parallel/pipeline.py) must be numerics-identical to the
sequential layer loop in vit_forward — forward taps AND gradients — for
every bias flavor the encoder supports, alone and composed with data
parallelism. The reference has no pipeline parallelism (SURVEY.md §2.3);
these tests pin down the new capability's correctness.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from layoutdit_tpu.parallel.pipeline import (
    PipelineConfig,
    pipeline_encoder,
    shard_stacked_layers,
    stack_layer_params,
)


def _tiny_cfg(**kw):
    base = dict(
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=48,
        patch_size=4,
        image_size=16,
    )
    base.update(kw)
    return ViTConfig(**base)


def _mesh(pipe, data=1):
    devs = np.array(jax.devices()[: pipe * data]).reshape(data, pipe)
    return Mesh(devs, ("data", "pipe"))


def _pixels(b=8, size=16, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(b, 3, size, size)), jnp.float32)


@pytest.mark.parametrize("n_microbatches", [1, 2, 4])
def test_pipeline_forward_matches_sequential(n_microbatches):
    cfg = _tiny_cfg()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = _pixels()
    taps = (0, 1, 2, 3, 4)
    ref = vit_forward(params, pixels, cfg, taps=taps)
    pcfg = PipelineConfig(mesh=_mesh(pipe=4), n_microbatches=n_microbatches)
    got = vit_forward(params, pixels, cfg, taps=taps, pipeline=pcfg)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


def test_pipeline_with_relative_position_bias():
    """Per-layer + shared rel-pos tables exercise the in-stage bias gather."""
    cfg = _tiny_cfg(
        use_relative_position_bias=True,
        use_shared_relative_position_bias=True,
        use_absolute_position_embeddings=False,
    )
    params = init_vit_params(jax.random.PRNGKey(1), cfg)
    pixels = _pixels(seed=1)
    ref = vit_forward(params, pixels, cfg, taps=(2, 4))
    pcfg = PipelineConfig(mesh=_mesh(pipe=2), n_microbatches=4)
    got = vit_forward(params, pixels, cfg, taps=(2, 4), pipeline=pcfg)
    for r, g in zip(ref, got):
        np.testing.assert_allclose(np.asarray(g), np.asarray(r), atol=1e-5)


@pytest.mark.parametrize("remat", [False, True])
def test_pipeline_gradients_match_sequential(remat):
    cfg = _tiny_cfg()
    params = init_vit_params(jax.random.PRNGKey(2), cfg)
    pixels = _pixels(seed=2)
    pcfg = PipelineConfig(mesh=_mesh(pipe=4), n_microbatches=2, remat=remat)

    def loss(p, pipeline):
        out = vit_forward(p, pixels, cfg, taps=(4,), pipeline=pipeline)[0]
        return jnp.sum(out * out)

    ref_l, ref_g = jax.value_and_grad(loss)(params, None)
    got_l, got_g = jax.jit(
        jax.value_and_grad(lambda p: loss(p, pcfg))
    )(params)
    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    flat_r, _ = jax.tree_util.tree_flatten(ref_g)
    flat_g, treedef = jax.tree_util.tree_flatten(got_g)
    assert len(flat_r) == len(flat_g)
    for r, g in zip(flat_r, flat_g):
        np.testing.assert_allclose(
            np.asarray(g), np.asarray(r), atol=2e-4, rtol=1e-4
        )


def test_pipeline_composes_with_data_parallelism():
    cfg = _tiny_cfg()
    params = init_vit_params(jax.random.PRNGKey(3), cfg)
    pixels = _pixels(b=8, seed=3)
    ref = vit_forward(params, pixels, cfg, taps=(4,))[0]
    pcfg = PipelineConfig(mesh=_mesh(pipe=4, data=2), n_microbatches=2)
    got = vit_forward(params, pixels, cfg, taps=(4,), pipeline=pcfg)[0]
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)


def test_pipeline_encoder_prestacked_sharded_params():
    """The production layout: stack once, shard the layer axis over 'pipe',
    and call pipeline_encoder directly."""
    cfg = _tiny_cfg()
    params = init_vit_params(jax.random.PRNGKey(4), cfg)
    mesh = _mesh(pipe=4)
    pcfg = PipelineConfig(mesh=mesh, n_microbatches=2)
    stacked = shard_stacked_layers(stack_layer_params(params["layers"]), pcfg)

    # Embed manually (mirror vit_forward's front half) on a token input.
    pixels = _pixels(b=4, seed=4)
    ref = vit_forward(params, pixels, cfg, taps=(1, 4))

    from layoutdit_tpu.models.vit import _pos_embed_for_grid, patchify, _linear

    x = patchify(pixels, cfg.patch_size)
    x = _linear(x, params["patch_embed"])
    cls = jnp.broadcast_to(params["cls_token"], (x.shape[0], 1, cfg.hidden_size))
    x = jnp.concatenate([cls, x], axis=1)
    x = x + _pos_embed_for_grid(params["pos_embed"], 4, 4)

    hs = jax.jit(
        lambda s, x: pipeline_encoder(s, x, cfg, pcfg)
    )(stacked, x)
    assert hs.shape == (4, 4, 17, 32)
    np.testing.assert_allclose(np.asarray(hs[0]), np.asarray(ref[0]), atol=1e-5)
    np.testing.assert_allclose(np.asarray(hs[3]), np.asarray(ref[1]), atol=1e-5)


def test_pipeline_detector_loss_matches_single_device():
    """detector_loss with a dp2 x pp2 mesh pipeline must reproduce
    single-device numerics (same rng, fp32) — mirrors the TP/SP parity
    tests in test_parallel.py."""
    from layoutdit_tpu.config.constructs import DetectionBudget, MeshConfig
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        detector_loss,
        init_detector_params,
    )
    from layoutdit_tpu.parallel.mesh import build_mesh, pipeline_config

    cfg = DetectorConfig(
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
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.uniform(0, 1, (4, 3, 64, 64)), jnp.float32)
    gt_boxes = jnp.asarray(
        np.tile(np.array([[[5, 5, 30, 40], [20, 10, 60, 50]]], np.float32),
                (4, 1, 1))
    )
    gt_labels = jnp.asarray(np.tile([[1, 3]], (4, 1)), jnp.int32)
    gt_valid = jnp.ones((4, 2), bool)
    key = jax.random.PRNGKey(7)

    ref = jax.jit(
        lambda p: sum(
            detector_loss(p, key, images, gt_boxes, gt_labels,
                          gt_valid, cfg).values()
        )
    )(params)

    mcfg = MeshConfig(data_parallel=2, model_parallel=1,
                      pipeline_parallel=2, pipeline_microbatches=2)
    mesh = build_mesh(mcfg, devices=jax.devices()[:4])
    assert mesh.shape == {"data": 2, "model": 1, "pipe": 2}
    pcfg = pipeline_config(mesh, mcfg)
    assert pcfg is not None and pcfg.n_stages == 2
    got = jax.jit(
        lambda p: sum(
            detector_loss(p, key, images, gt_boxes, gt_labels, gt_valid,
                          cfg, pipeline=pcfg).values()
        )
    )(params)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_trainer_with_pp_mesh(tmp_path):
    """Trainer end-to-end on a dp=2 x pp=2 mesh (tiny fixture) — mirrors
    test_parallel.py::test_trainer_with_tp_mesh for the pipeline axis."""
    import json

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.config.constructs import MeshConfig
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import (
        make_fixture,
        write_fixture_config,
    )
    from layoutdit_tpu.train.trainer import Trainer

    make_fixture(str(tmp_path), n_images=8, split="samples", seed=0)
    write_fixture_config(str(tmp_path), epochs=1, batch_size=4,
                         tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(tmp_path / "cfg.json")))
    cfg.mesh_config = MeshConfig(
        data_parallel=2, model_parallel=1,
        pipeline_parallel=2, pipeline_microbatches=2,
    )
    cfg.train_config.steps_per_dispatch = 1
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        trainer = Trainer(cfg, model)
        trainer.train()
        assert len(trainer.loss_history) == 1
        assert np.isfinite(trainer.loss_history[0])
    finally:
        set_layout_dit_config(None)


def test_pipeline_config_trivial_mesh_is_none():
    from layoutdit_tpu.config.constructs import MeshConfig
    from layoutdit_tpu.parallel.mesh import build_mesh, pipeline_config

    mcfg = MeshConfig(data_parallel=8)
    mesh = build_mesh(mcfg)
    assert pipeline_config(mesh, mcfg) is None


def test_pipeline_validates_divisibility():
    cfg = _tiny_cfg(num_hidden_layers=3)
    params = init_vit_params(jax.random.PRNGKey(5), cfg)
    pcfg = PipelineConfig(mesh=_mesh(pipe=2), n_microbatches=2)
    with pytest.raises(ValueError, match="not divisible"):
        vit_forward(params, _pixels(b=4), cfg, taps=(3,), pipeline=pcfg)

    cfg4 = _tiny_cfg()
    params4 = init_vit_params(jax.random.PRNGKey(5), cfg4)
    bad_mb = PipelineConfig(mesh=_mesh(pipe=4), n_microbatches=3)
    with pytest.raises(ValueError, match="microbatches"):
        vit_forward(params4, _pixels(b=4), cfg4, taps=(4,), pipeline=bad_mb)

    with pytest.raises(ValueError, match="mutually exclusive"):
        vit_forward(
            params4, _pixels(b=4), cfg4, taps=(4,),
            pipeline=PipelineConfig(mesh=_mesh(pipe=4), n_microbatches=2),
            seq_sharding="anything",
        )
