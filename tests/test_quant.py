"""Int8 serving-path tests (ops/quant.py + the vit.py int8 dispatch)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from layoutdit_tpu.ops import quant


def test_quantize_linear_roundtrip():
    rng = np.random.default_rng(0)
    w = jnp.asarray(rng.standard_normal((64, 32)), jnp.float32)
    p = quant.quantize_linear({"kernel": w, "bias": jnp.zeros((32,))})
    assert p["kernel_q"].dtype == jnp.int8
    deq = p["kernel_q"].astype(jnp.float32) * p["kernel_scale"][None, :]
    # per-channel int8: max error is scale/2 per entry
    err = np.abs(np.asarray(deq - w))
    bound = np.asarray(p["kernel_scale"])[None, :] * 0.5 + 1e-6
    assert (err <= bound).all()


def test_int8_linear_close_to_fp32():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((128, 64)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((64, 32)) * 0.05, jnp.float32)
    b = jnp.asarray(rng.standard_normal((32,)) * 0.01, jnp.float32)
    ref = x @ w + b
    got = quant.int8_linear(x, quant.quantize_linear({"kernel": w, "bias": b}))
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.02, rel


def test_qkv_must_quantize_together():
    cfg = ViTConfig(hidden_size=32, num_hidden_layers=1,
                    num_attention_heads=2, intermediate_size=64, image_size=32)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    with pytest.raises(ValueError):
        quant.quantize_vit_params(params, keys=("q", "mlp_in"))


@pytest.mark.parametrize("keys", [None, quant._VIT_LINEAR_KEYS])
def test_vit_forward_int8_parity(keys):
    """Quantized encoder output stays close to fp32 (W8A8 dynamic error
    budget) for both the default selective subset and all-linear int8."""
    cfg = ViTConfig(hidden_size=64, num_hidden_layers=3,
                    num_attention_heads=4, intermediate_size=128,
                    image_size=64)
    key = jax.random.PRNGKey(0)
    params = init_vit_params(key, cfg)
    # non-trivial weights (init is trunc-normal already; scale pos_embed)
    params["pos_embed"] = jax.random.normal(key, params["pos_embed"].shape) * 0.02
    pixels = jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64))

    ref = vit_forward(params, pixels, cfg)[-1]
    qparams = quant.quantize_vit_params(params, keys=keys)
    got = vit_forward(qparams, pixels, cfg)[-1]
    rel = float(jnp.linalg.norm(got - ref) / jnp.linalg.norm(ref))
    assert rel < 0.03, rel


def test_serving_engine_int8():
    """BatchInferenceEngine(int8=True) runs and returns detections of the
    same shape/count behavior as the bf16 engine."""
    from layoutdit_tpu.config.constructs import DetectionBudget
    from layoutdit_tpu.eval.serving import BatchInferenceEngine
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        init_detector_params,
    )

    class M:
        cfg = DetectorConfig(
            backbone=BackboneConfig(
                vit=ViTConfig(hidden_size=32, num_hidden_layers=2,
                              num_attention_heads=2, intermediate_size=64,
                              image_size=64),
                fpn_out_channels=32,
            ),
            image_size=64,
            budget=DetectionBudget(
                rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=50,
                box_detections_per_img=10,
            ),
        )
        params = init_detector_params(jax.random.PRNGKey(0), cfg)

    model = M()
    rng = np.random.default_rng(0)
    pages = [rng.uniform(0, 255, (60, 50, 3)).astype(np.float32) for _ in range(2)]
    ref = BatchInferenceEngine(model, image_sizes=(64,), batch_size=2,
                               score_thresh=0.0).predict_pages(pages)
    got = BatchInferenceEngine(model, image_sizes=(64,), batch_size=2,
                               score_thresh=0.0, int8=True).predict_pages(pages)
    assert len(got) == len(ref) == 2
    for g, r in zip(got, ref):
        assert len(g.boxes) == len(r.boxes)


def test_detector_predict_int8_close():
    """End-to-end: int8-encoder detections match bf16 within tolerance on
    a tiny detector (scores drift slightly; top boxes must agree)."""
    from layoutdit_tpu.config.constructs import DetectionBudget
    from layoutdit_tpu.models.backbone import BackboneConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        detector_predict,
        init_detector_params,
    )

    tiny_vit = ViTConfig(hidden_size=32, num_hidden_layers=2,
                         num_attention_heads=2, intermediate_size=64,
                         image_size=64)
    cfg = DetectorConfig(
        backbone=BackboneConfig(vit=tiny_vit, fpn_out_channels=32),
        image_size=64,
        budget=DetectionBudget(
            rpn_pre_nms_top_n_test=50, rpn_post_nms_top_n_test=50,
            box_detections_per_img=10,
        ),
    )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    images = jax.random.uniform(jax.random.PRNGKey(1), (1, 3, 64, 64))
    ref = detector_predict(params, images, cfg)
    got = detector_predict(quant.quantize_detector_params(params), images, cfg)
    # same detection count and similar top boxes
    assert int(got.valid.sum()) == int(ref.valid.sum())
    if bool(ref.valid[0, 0]):
        np.testing.assert_allclose(
            np.asarray(got.boxes[0, 0]), np.asarray(ref.boxes[0, 0]), atol=2.0
        )
