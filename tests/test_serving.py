"""Serving engine + high-res (pos-embed interpolation) tests."""

import io

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import DetectorConfig, init_detector_params
from layoutdit_tpu.models.vit import ViTConfig
from layoutdit_tpu.ops.interpolate import resize_bicubic


def test_bicubic_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    x = rng.standard_normal((1, 4, 14, 14)).astype(np.float32)
    for size in [(7, 7), (28, 28), (20, 13)]:
        want = F.interpolate(
            torch.from_numpy(x), size=size, mode="bicubic", align_corners=False
        ).numpy()
        got = np.asarray(resize_bicubic(jnp.asarray(x), *size))
        np.testing.assert_allclose(got, want, atol=2e-4, rtol=1e-3)


def test_pos_embed_interpolation_matches_hf(rng):
    """Feed a BEiT trained at 32px an input at 64px; HF bicubically
    interpolates pos embeddings — so do we."""
    import torch
    from transformers import BeitConfig, BeitModel

    hf_cfg = BeitConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32, patch_size=16,
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
        hidden_dropout_prob=0.0, attention_probs_dropout_prob=0.0,
        drop_path_rate=0.0, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = BeitModel(hf_cfg, add_pooling_layer=False).eval()
    g = torch.Generator().manual_seed(0)
    model.load_state_dict({
        k: torch.randn(v.shape, generator=g) * 0.02 if v.is_floating_point() else v
        for k, v in model.state_dict().items()
    })

    from layoutdit_tpu.models.vit import ViTConfig, vit_forward
    from layoutdit_tpu.models.weights_io import beit_state_dict_to_params

    vit_cfg = ViTConfig(
        hidden_size=64, num_hidden_layers=2, num_attention_heads=4,
        intermediate_size=128, image_size=32,
        use_absolute_position_embeddings=True, layer_scale_init_value=0.1,
    )
    params = beit_state_dict_to_params(model.state_dict(), vit_cfg)

    x = rng.standard_normal((1, 3, 64, 64)).astype(np.float32)
    with torch.no_grad():
        want = model(torch.from_numpy(x), output_hidden_states=True
                     ).hidden_states[2].numpy()
    got = np.asarray(vit_forward(params, jnp.asarray(x), vit_cfg, taps=[2])[0])
    assert got.shape == want.shape == (1, 17, 64)  # 4x4 grid + CLS
    np.testing.assert_allclose(got, want, atol=5e-5, rtol=1e-3)


@pytest.fixture(scope="module")
def tiny_model():
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

    return M()


def test_serving_buckets_and_padding(tiny_model):
    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    engine = BatchInferenceEngine(
        tiny_model, image_sizes=(64, 128), batch_size=4, score_thresh=0.0
    )
    rng = np.random.default_rng(0)
    # 5 pages of mixed sizes (HWC uint8-style arrays) -> 2 buckets, padding
    pages = [rng.uniform(0, 255, (60, 50, 3)).astype(np.float32) for _ in range(3)]
    pages += [rng.uniform(0, 255, (120, 100, 3)).astype(np.float32) for _ in range(2)]
    results = engine.predict_pages(pages)
    assert len(results) == 5
    for (h, w), r in zip([(60, 50)] * 3 + [(120, 100)] * 2, results):
        assert r.boxes.shape[1] == 4 if len(r.boxes) else True
        if len(r.boxes):
            assert r.boxes[:, 2].max() <= w + 1e-3
            assert r.boxes[:, 3].max() <= h + 1e-3
    assert set(engine._compiled) == {64, 128}  # both buckets compiled


def test_serving_jpeg_input(tiny_model):
    from PIL import Image

    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    engine = BatchInferenceEngine(tiny_model, image_sizes=(64,), batch_size=2,
                                  score_thresh=0.0)
    rng = np.random.default_rng(1)
    buf = io.BytesIO()
    Image.fromarray(rng.integers(0, 255, (90, 70, 3), np.uint8)).save(
        buf, format="JPEG"
    )
    results = engine.predict_pages([buf.getvalue()])
    assert len(results) == 1
    if len(results[0].boxes):
        assert results[0].boxes[:, 2].max() <= 70 + 1e-3


@pytest.mark.slow
def test_serving_high_res_bucket(tiny_model):
    """A >=896 px serving bucket end to end (VERDICT r2 item 3 tail): a
    large page routes to the 896 bucket, the ViT resamples its pos
    embeddings to the 56x56 grid (3137 tokens), and anchors/proposal
    budgets/NMS all run at that grid's static shapes."""
    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    engine = BatchInferenceEngine(
        tiny_model, image_sizes=(64, 896), batch_size=1, score_thresh=0.0
    )
    rng = np.random.default_rng(3)
    page = rng.uniform(0, 255, (700, 640, 3)).astype(np.float32)
    (result,) = engine.predict_pages([page])
    assert set(engine._compiled) == {896}
    if len(result.boxes):
        # boxes are rescaled back to the original page's coordinates
        assert result.boxes[:, 2].max() <= 640 + 1e-2
        assert result.boxes[:, 3].max() <= 700 + 1e-2


def test_serving_pipeline_window(tiny_model):
    """The async in-flight window returns identical detections regardless
    of depth (pure pipelining, no numerics/order change)."""
    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    rng = np.random.default_rng(5)
    pages = [rng.uniform(0, 255, (60 + i, 50, 3)).astype(np.float32)
             for i in range(10)]
    ref = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=2, score_thresh=0.0,
        max_in_flight=1,
    ).predict_pages(pages)
    got = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=2, score_thresh=0.0,
        max_in_flight=8, decode_workers=4,
    ).predict_pages(pages)
    assert len(got) == len(ref) == 10
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g.boxes, r.boxes, atol=1e-5)
        np.testing.assert_allclose(g.scores, r.scores, atol=1e-6)
        np.testing.assert_array_equal(g.labels, r.labels)


def test_serving_mesh_data_parallel(tiny_model):
    """Mesh-sharded serving (multi-chip dp) matches the single-device
    engine exactly: batches shard over all 8 virtual devices, weights
    replicate, no semantic change."""
    from jax.sharding import Mesh

    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("dp", "tp"))
    rng = np.random.default_rng(6)
    pages = [rng.uniform(0, 255, (70, 50 + i, 3)).astype(np.float32)
             for i in range(11)]
    ref = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=8, score_thresh=0.0
    ).predict_pages(pages)
    got = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=8, score_thresh=0.0,
        mesh=mesh,
    ).predict_pages(pages)
    assert len(got) == len(ref) == 11
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g.boxes, r.boxes, atol=1e-4)
        np.testing.assert_array_equal(g.labels, r.labels)

    with pytest.raises(ValueError):
        BatchInferenceEngine(tiny_model, batch_size=6, mesh=mesh)


def test_serving_corrupt_page(tiny_model):
    """A corrupt JPEG in a batch zeroes its slot (empty detections) and
    does not take down the batch — same semantics as the native loader."""
    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    rng = np.random.default_rng(7)
    good = rng.uniform(0, 255, (60, 50, 3)).astype(np.float32)
    results = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=2, score_thresh=0.0
    ).predict_pages([good, b"\xff\xd8not-a-real-jpeg"])
    assert len(results) == 2
    assert len(results[1].boxes) == 0  # corrupt slot: no detections


def test_serving_mesh_tensor_parallel(tiny_model):
    """Tensor-parallel serving: a mesh with a 'model' axis shards the
    weights Megatron-style (encoder + box head) and batches over 'data'
    only — detections must match the single-device engine exactly.
    int8 + TP is rejected loudly."""
    from jax.sharding import Mesh

    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    mesh = Mesh(np.asarray(jax.devices()).reshape(4, 2), ("data", "model"))
    rng = np.random.default_rng(7)
    pages = [rng.uniform(0, 255, (60, 44 + i, 3)).astype(np.float32)
             for i in range(9)]
    ref = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=8, score_thresh=0.0
    ).predict_pages(pages)
    eng = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=8, score_thresh=0.0,
        mesh=mesh,
    )
    # params really are sharded over 'model'
    import jax as _jax

    specs = {
        k.sharding.spec
        for k in _jax.tree_util.tree_leaves(eng.params)
        if hasattr(k, "sharding")
    }
    assert any("model" in str(s) for s in specs), specs
    got = eng.predict_pages(pages)
    assert len(got) == len(ref) == 9
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g.boxes, r.boxes, atol=1e-4)
        np.testing.assert_array_equal(g.labels, r.labels)

    # batch must divide the data section (4), not the whole mesh (8)
    BatchInferenceEngine(tiny_model, batch_size=4, image_sizes=(64,),
                         mesh=mesh)
    with pytest.raises(ValueError):
        BatchInferenceEngine(tiny_model, batch_size=6, mesh=mesh)
    with pytest.raises(ValueError, match="int8"):
        BatchInferenceEngine(tiny_model, batch_size=8, mesh=mesh, int8=True)


def test_serving_tp_only_mesh_actually_shards(tiny_model):
    """A Mesh(devs, ('model',)) engine must deliver real TP: before the
    axis resolution was unified (parallel/mesh.py::model_axis_name) the
    engine detected TP by NAME while the param specs resolved it by
    POSITION — this mesh got replicated weights and no error."""
    from jax.sharding import Mesh

    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    mesh = Mesh(np.asarray(jax.devices()[:2]), ("model",))
    rng = np.random.default_rng(11)
    pages = [rng.uniform(0, 255, (60, 44 + i, 3)).astype(np.float32)
             for i in range(3)]
    ref = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=2, score_thresh=0.0
    ).predict_pages(pages)
    eng = BatchInferenceEngine(
        tiny_model, image_sizes=(64,), batch_size=2, score_thresh=0.0,
        mesh=mesh,
    )
    assert any(
        "model" in str(leaf.sharding.spec)
        for leaf in jax.tree_util.tree_leaves(eng.params)
        if hasattr(leaf, "sharding")
    ), "TP mesh produced fully replicated params"
    got = eng.predict_pages(pages)
    for g, r in zip(got, ref):
        np.testing.assert_allclose(g.boxes, r.boxes, atol=1e-4)
        np.testing.assert_array_equal(g.labels, r.labels)


def test_serving_with_masks(tiny_model):
    """Mask R-CNN model: PageDetections carry per-detection bitmap
    windows clipped to the page; no-mask models keep masks=None."""
    import dataclasses as _dc

    from layoutdit_tpu.eval.serving import BatchInferenceEngine

    class M:
        cfg = _dc.replace(
            tiny_model.cfg, with_mask=True, mask_roi_output_size=7
        )
        params = init_detector_params(jax.random.PRNGKey(0), cfg)

    engine = BatchInferenceEngine(M(), image_sizes=(64,), batch_size=2,
                                  score_thresh=0.0)
    rng = np.random.default_rng(0)
    pages = [rng.uniform(0, 255, (60, 50, 3)).astype(np.float32)
             for _ in range(3)]
    results = engine.predict_pages(pages)
    for r in results:
        assert r.masks is not None
        assert len(r.masks) == len(r.boxes)
        for x0, y0, bm in r.masks:
            assert bm.dtype == np.uint8
            assert 0 <= x0 and 0 <= y0
            assert y0 + bm.shape[0] <= 60 and x0 + bm.shape[1] <= 50

    plain = BatchInferenceEngine(tiny_model, image_sizes=(64,), batch_size=2)
    assert plain.predict_pages(pages[:1])[0].masks is None
