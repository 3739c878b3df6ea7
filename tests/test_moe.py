"""Mixture-of-Experts MLP + expert parallelism (ops/moe.py).

New capability beyond the reference (SURVEY.md §2.3: expert parallelism
absent upstream). Covers routing/capacity semantics, dense-parity in the
degenerate single-expert case, the encoder integration (aux loss through
detector_loss), and EP-sharded parity on the 8-device CPU mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from layoutdit_tpu.ops.moe import init_moe_mlp_params, moe_capacity, moe_mlp


def _dense_mlp(y, w_in, b_in, w_out, b_out):
    h = jax.nn.gelu(y @ w_in + b_in, approximate=False)
    return h @ w_out + b_out


def test_single_expert_equals_dense_mlp():
    """E=1, top-1: router prob is exactly 1.0 and capacity >= S, so the
    MoE layer must reproduce the dense GELU MLP bit-for-fp32."""
    key = jax.random.PRNGKey(0)
    d, f = 16, 32
    p = init_moe_mlp_params(key, d, f, num_experts=1)
    y = jax.random.normal(jax.random.PRNGKey(1), (2, 11, d), jnp.float32)
    out, aux = moe_mlp(y, p, num_experts=1, top_k=1, capacity_factor=2.0)
    ref = _dense_mlp(
        y, p["moe_in"]["kernel"][0], p["moe_in"]["bias"][0],
        p["moe_out"]["kernel"][0], p["moe_out"]["bias"][0],
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)
    # single expert: f=1, P=1 -> aux = E * 1 * 1 = 1
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-6)


def test_capacity_drops_overflow_tokens():
    """With capacity 1 slot and a router forced to send every token to
    expert 0, only the first token is processed; dropped tokens output 0
    (the residual connection carries them in the encoder)."""
    d, f, e, s = 8, 16, 4, 6
    p = init_moe_mlp_params(jax.random.PRNGKey(0), d, f, e)
    # force expert 0: router kernel all zeros except a huge column bias via
    # the input itself — simplest is a kernel whose column 0 is large.
    kernel = np.zeros((d, e), np.float32)
    kernel[:, 0] = 10.0
    p["router"]["kernel"] = jnp.asarray(kernel)
    y = jnp.ones((1, s, d), jnp.float32)  # all-positive -> logit0 = 80
    # capacity_factor tuned so c = 1: ceil(6 * 1 * cf / 4) = 1 -> cf = 0.5
    out, _ = moe_mlp(y, p, num_experts=e, top_k=1, capacity_factor=0.5)
    assert moe_capacity(s, e, 1, 0.5) == 1
    out = np.asarray(out)
    assert np.abs(out[0, 0]).max() > 0  # first token processed
    np.testing.assert_array_equal(out[0, 1:], 0.0)  # overflow dropped


def test_top2_routing_mixes_two_experts():
    """top-2 with ample capacity: output = g1*E_a(y) + g2*E_b(y) with the
    gates renormalized over the chosen pair."""
    d, f, e = 8, 16, 3
    p = init_moe_mlp_params(jax.random.PRNGKey(2), d, f, e)
    y = jax.random.normal(jax.random.PRNGKey(3), (1, 1, d), jnp.float32)
    out, _ = moe_mlp(y, p, num_experts=e, top_k=2, capacity_factor=e * 2.0)

    logits = np.asarray(y[0, 0] @ p["router"]["kernel"])
    probs = np.exp(logits - logits.max())
    probs /= probs.sum()
    order = np.argsort(-probs)
    a, b = int(order[0]), int(order[1])
    ga, gb = probs[a], probs[b]
    ga, gb = ga / (ga + gb), gb / (ga + gb)
    ref = ga * _dense_mlp(
        y[0], p["moe_in"]["kernel"][a], p["moe_in"]["bias"][a],
        p["moe_out"]["kernel"][a], p["moe_out"]["bias"][a],
    ) + gb * _dense_mlp(
        y[0], p["moe_in"]["kernel"][b], p["moe_in"]["bias"][b],
        p["moe_out"]["kernel"][b], p["moe_out"]["bias"][b],
    )
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(ref), atol=1e-5)


def test_aux_loss_uniform_routing_is_one():
    """A zero router gives uniform probs; aux = E * sum(f_e * 1/E) = 1
    regardless of how argmax ties break."""
    d, f, e = 8, 16, 4
    p = init_moe_mlp_params(jax.random.PRNGKey(4), d, f, e)
    p["router"]["kernel"] = jnp.zeros((d, e), jnp.float32)
    y = jax.random.normal(jax.random.PRNGKey(5), (2, 8, d), jnp.float32)
    _, aux = moe_mlp(y, p, num_experts=e)
    np.testing.assert_allclose(float(aux), 1.0, atol=1e-6)


def _tiny_moe_vit(num_experts=4, moe_every_n=2):
    from layoutdit_tpu.models.vit import ViTConfig

    return ViTConfig(
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        intermediate_size=64, image_size=64,
        num_experts=num_experts, moe_every_n=moe_every_n,
        moe_capacity_factor=2.0,
    )


def test_encoder_moe_layers_and_aux():
    """moe_every_n=2 on a 2-layer encoder: layer 2 is MoE (router params),
    layer 1 dense; vit_forward surfaces the summed aux loss."""
    from layoutdit_tpu.models.vit import init_vit_params, vit_forward

    cfg = _tiny_moe_vit()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    assert "mlp_in" in params["layers"][0] and "router" not in params["layers"][0]
    assert "router" in params["layers"][1] and "mlp_in" not in params["layers"][1]
    assert params["layers"][1]["moe_in"]["kernel"].shape == (4, 32, 64)

    pixels = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64))
    aux_out = {}
    hs = vit_forward(params, pixels, cfg, taps=(1, 2), aux_out=aux_out)
    assert hs[0].shape == (2, 17, 32)
    aux = float(aux_out["moe_aux"])
    assert np.isfinite(aux) and aux >= 1.0 - 1e-5  # 1 MoE layer, aux >= 1


def test_detector_loss_has_moe_aux_and_grads_flow():
    from layoutdit_tpu.config.constructs import DetectionBudget
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        detector_loss,
        init_detector_params,
    )

    cfg = DetectorConfig(
        backbone=BackboneConfig(vit=_tiny_moe_vit(), fpn_out_channels=32),
        image_size=64,
        budget=DetectionBudget(
            rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
            rpn_post_nms_top_n_train=64, rpn_post_nms_top_n_test=64,
            box_batch_size_per_image=16, box_detections_per_img=8,
        ),
    )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64))
    gt_boxes = jnp.asarray([[[5, 5, 30, 40], [20, 10, 60, 50]]] * 2, jnp.float32)
    gt_labels = jnp.asarray([[1, 3]] * 2, jnp.int32)
    gt_valid = jnp.ones((2, 2), bool)

    def total(p):
        losses = detector_loss(
            p, jax.random.PRNGKey(2), images, gt_boxes, gt_labels, gt_valid, cfg
        )
        assert "loss_moe_aux" in losses
        return sum(losses.values())

    loss, grads = jax.jit(jax.value_and_grad(total))(params)
    assert np.isfinite(float(loss))
    moe_layer = grads["backbone"]["vit"]["layers"][1]
    for key in ("router", "moe_in", "moe_out"):
        g = jax.tree_util.tree_reduce(
            lambda a, l: a + float(jnp.abs(l).sum()), moe_layer[key], 0.0
        )
        assert np.isfinite(g) and g > 0, f"no gradient through {key}"


def test_expert_parallel_loss_matches_single_device():
    """dp=2 x ep=4 mesh: expert kernels sharded over 'model' on their E
    dim; the sharded loss must match the unsharded one."""
    from jax.sharding import PartitionSpec as P

    from layoutdit_tpu.config.constructs import DetectionBudget, MeshConfig
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        detector_loss,
        init_detector_params,
    )
    from layoutdit_tpu.parallel.mesh import (
        batch_sharding,
        build_mesh,
        replicated_sharding,
    )
    from layoutdit_tpu.parallel.sharding import (
        detector_param_specs,
        shard_params,
    )

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")

    cfg = DetectorConfig(
        backbone=BackboneConfig(
            vit=_tiny_moe_vit(num_experts=4, moe_every_n=1), fpn_out_channels=32
        ),
        image_size=64,
        budget=DetectionBudget(
            rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
            rpn_post_nms_top_n_train=64, rpn_post_nms_top_n_test=64,
            box_batch_size_per_image=16, box_detections_per_img=8,
        ),
    )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (4, 3, 64, 64))
    gt_boxes = jnp.asarray([[[5, 5, 30, 40], [20, 10, 60, 50]]] * 4, jnp.float32)
    gt_labels = jnp.asarray([[1, 3]] * 4, jnp.int32)
    gt_valid = jnp.ones((4, 2), bool)

    def total(p, im):
        return sum(
            detector_loss(
                p, jax.random.PRNGKey(2), im, gt_boxes, gt_labels, gt_valid, cfg
            ).values()
        )

    ref = jax.jit(total)(params, images)

    mesh = build_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    specs = detector_param_specs(params, mesh)
    moe_spec = specs["backbone"]["vit"]["layers"][0]["moe_in"]["kernel"]
    assert moe_spec == P("model", None, None)  # EP layout active

    sharded = shard_params(params, mesh)
    got = jax.jit(
        total,
        in_shardings=(None, batch_sharding(mesh)),
        out_shardings=replicated_sharding(mesh),
    )(sharded, images)
    np.testing.assert_allclose(float(got), float(ref), rtol=2e-5)


def test_moe_rejects_pipeline():
    from layoutdit_tpu.config.constructs import MeshConfig
    from layoutdit_tpu.models.vit import init_vit_params, vit_forward
    from layoutdit_tpu.parallel.mesh import build_mesh, pipeline_config

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    mcfg = MeshConfig(data_parallel=4, model_parallel=1,
                      pipeline_parallel=2, pipeline_microbatches=2)
    pcfg = pipeline_config(build_mesh(mcfg), mcfg)
    cfg = _tiny_moe_vit()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    pixels = jnp.zeros((2, 3, 64, 64))
    with pytest.raises(ValueError, match="MoE"):
        vit_forward(params, pixels, cfg, pipeline=pcfg)
