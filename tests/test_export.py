"""AOT export artifact tests (layoutdit_tpu/export.py)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.export import ExportedDetector, export_detector
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_predict,
    init_detector_params,
    rescale_detections,
)
from layoutdit_tpu.models.vit import ViTConfig


@pytest.fixture(scope="module")
def tiny():
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
    return cfg, init_detector_params(jax.random.PRNGKey(0), cfg)


def test_export_roundtrip(tiny, tmp_path):
    """Serialized artifact reproduces in-process predictions exactly and
    carries no dependency on the model code (flat leaves + StableHLO)."""
    cfg, params = tiny
    path = str(tmp_path / "artifact")
    manifest = export_detector(params, cfg, path, image_sizes=(64,),
                               batch_size=2)
    assert manifest["image_sizes"] == [64]

    art = ExportedDetector(path)
    # weights must land on device ONCE at load — host numpy leaves would
    # re-transfer the whole parameter set on every .call (serving path)
    assert all(isinstance(leaf, jax.Array) for leaf in art._leaves)
    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(1), (2, 3, 64, 64)), np.float32
    )
    orig = np.asarray([[60, 50], [64, 64]], np.float32)

    got = art.predict(images, orig)
    want = rescale_detections(
        detector_predict(params, jnp.asarray(images), cfg),
        jnp.asarray(orig), 64,
    )
    np.testing.assert_allclose(got["boxes"], np.asarray(want.boxes), atol=1e-5)
    np.testing.assert_allclose(got["scores"], np.asarray(want.scores), atol=1e-6)
    np.testing.assert_array_equal(got["labels"], np.asarray(want.labels))
    np.testing.assert_array_equal(got["valid"], np.asarray(want.valid))


def test_export_size_routing(tiny, tmp_path):
    cfg, params = tiny
    path = str(tmp_path / "artifact")
    export_detector(params, cfg, path, image_sizes=(64,), batch_size=1)
    art = ExportedDetector(path)
    with pytest.raises(ValueError, match="no exported bucket"):
        art.predict(np.zeros((1, 3, 128, 128), np.float32),
                    np.ones((1, 2), np.float32))


def test_export_cli_smoke(tmp_path):
    """tools/export_model.py end to end: config + checkpoint -> artifact
    directory loadable by ExportedDetector (the deployment handoff the
    reference lacks, main.py:12-43)."""
    import json
    import os

    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.export_model import main
    from layoutdit_tpu.tools.make_fixture import write_fixture_config

    root = str(tmp_path)
    write_fixture_config(root, epochs=1, batch_size=2, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        model = build_model(cfg)
        ckpt = model.save_checkpoint(root, "run", 1)
        out = os.path.join(root, "artifact")
        main(["--out", out, "--checkpoint", ckpt,
              "--sizes", "64", "--batch-size", "2"])

        art = ExportedDetector(out)
        got = art.predict(
            np.zeros((2, 3, 64, 64), np.float32),
            np.asarray([[64, 64], [48, 56]], np.float32),
        )
        assert got["boxes"].shape[0] == 2
    finally:
        set_layout_dit_config(None)


def test_export_bad_artifact(tmp_path):
    (tmp_path / "manifest.json").write_text('{"format": "something-else"}')
    with pytest.raises(ValueError, match="not a layoutdit_tpu export"):
        ExportedDetector(str(tmp_path))


def test_exported_engine_matches_live_engine(tiny, tmp_path):
    """ExportedInferenceEngine (the serving pipeline over a frozen
    StableHLO artifact) returns the same detections as the live-model
    engine: same bucketing, padding, corrupt-slot and score-threshold
    semantics — with zero model code involved."""
    from layoutdit_tpu.eval.serving import (
        BatchInferenceEngine,
        ExportedInferenceEngine,
    )

    cfg, params = tiny
    path = str(tmp_path / "artifact")
    export_detector(params, cfg, path, image_sizes=(64,), batch_size=2)

    class M:
        pass

    M.cfg, M.params = cfg, params
    rng = np.random.default_rng(3)
    pages = [rng.uniform(0, 255, (50, 40 + i, 3)).astype(np.float32)
             for i in range(5)]
    live = BatchInferenceEngine(
        M, image_sizes=(64,), batch_size=2, score_thresh=0.1
    ).predict_pages(pages)
    frozen_eng = ExportedInferenceEngine(path, score_thresh=0.1)
    assert frozen_eng.batch_size == 2  # from the manifest
    frozen = frozen_eng.predict_pages(pages)
    assert len(frozen) == len(live) == 5
    for f, l in zip(frozen, live):
        np.testing.assert_allclose(f.boxes, l.boxes, atol=1e-5)
        np.testing.assert_allclose(f.scores, l.scores, atol=1e-6)
        np.testing.assert_array_equal(f.labels, l.labels)


def test_export_int8_bakes_quantization_in(tiny, tmp_path):
    """--int8 export: the artifact's leaves are the int8 weights+scales
    and the StableHLO program carries the dynamic-quant matmuls — its
    predictions match the in-process quantized model exactly, and the
    serving box never runs a quantization pass."""
    from layoutdit_tpu.ops.quant import quantize_detector_params

    cfg, params = tiny
    qparams = quantize_detector_params(params)
    path = str(tmp_path / "artifact_int8")
    export_detector(qparams, cfg, path, image_sizes=(64,), batch_size=2)

    art = ExportedDetector(path)
    assert any(
        leaf.dtype == np.int8 for leaf in art._leaves
    ), "int8 weights did not land in the artifact"

    images = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(2), (2, 3, 64, 64)), np.float32
    )
    orig = np.asarray([[60, 50], [64, 64]], np.float32)
    got = art.predict(images, orig)
    want = rescale_detections(
        detector_predict(qparams, jnp.asarray(images), cfg),
        jnp.asarray(orig), 64,
    )
    np.testing.assert_allclose(got["boxes"], np.asarray(want.boxes), atol=1e-5)
    np.testing.assert_array_equal(got["labels"], np.asarray(want.labels))
