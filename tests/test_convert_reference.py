"""Full-detector reference-checkpoint importer
(weights_io.detector_state_dict_to_params + the conversion CLI):
a synthetic reference-shaped state_dict (torchvision FasterRCNN key
layout over a tiny HF BeitModel) converts into a working detector, with
the box head differentially verified against torch TwoMLPHead
semantics."""

import json
import os

import numpy as np
import pytest
import torch

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.backbone import BackboneConfig
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_predict,
)
from layoutdit_tpu.models.vit import ViTConfig
from layoutdit_tpu.models.weights_io import detector_state_dict_to_params


def _cfg():
    return DetectorConfig(
        backbone=BackboneConfig(
            vit=ViTConfig(hidden_size=64, num_hidden_layers=4,
                          num_attention_heads=4, intermediate_size=128,
                          image_size=64,
                          use_absolute_position_embeddings=True,
                          layer_scale_init_value=0.1),
            fpn_out_channels=32,
        ),
        image_size=64,
        num_classes=5,
        budget=DetectionBudget(
            rpn_pre_nms_top_n_train=64, rpn_post_nms_top_n_train=64,
            rpn_pre_nms_top_n_test=64, rpn_post_nms_top_n_test=64,
            box_batch_size_per_image=16, box_detections_per_img=8,
        ),
    )


def _reference_state_dict(cfg, seed=0):
    """LayoutDetectionModel.state_dict() shape/key facsimile: the real
    keys a reference .pth contains (model. prefix, HF Beit encoder under
    backbone.backbone.dit, torchvision FPN/RPN/RoI-head names)."""
    from transformers import BeitConfig, BeitModel

    torch.manual_seed(seed)
    hf = BeitModel(
        BeitConfig(
            hidden_size=64, num_hidden_layers=4, num_attention_heads=4,
            intermediate_size=128, image_size=64, patch_size=16,
            use_absolute_position_embeddings=True,
            layer_scale_init_value=0.1, hidden_dropout_prob=0.0,
            attention_probs_dropout_prob=0.0, drop_path_rate=0.0,
            attn_implementation="eager",
        ),
        add_pooling_layer=False,
    ).eval()

    sd = {
        "model.backbone.backbone.dit." + k: v
        for k, v in hf.state_dict().items()
    }
    c = cfg.backbone.fpn_out_channels
    d = cfg.backbone.vit.hidden_size
    a = 3  # anchors per cell (one size x 3 aspect ratios)
    g = torch.Generator().manual_seed(seed + 1)

    def t(*shape):
        return torch.randn(*shape, generator=g) * 0.05

    for i in range(4):
        sd[f"model.backbone.fpn.inner_blocks.{i}.0.weight"] = t(c, d, 1, 1)
        sd[f"model.backbone.fpn.inner_blocks.{i}.0.bias"] = t(c)
        sd[f"model.backbone.fpn.layer_blocks.{i}.0.weight"] = t(c, c, 3, 3)
        sd[f"model.backbone.fpn.layer_blocks.{i}.0.bias"] = t(c)
    sd["model.rpn.head.conv.0.0.weight"] = t(c, c, 3, 3)
    sd["model.rpn.head.conv.0.0.bias"] = t(c)
    sd["model.rpn.head.cls_logits.weight"] = t(a, c, 1, 1)
    sd["model.rpn.head.cls_logits.bias"] = t(a)
    sd["model.rpn.head.bbox_pred.weight"] = t(4 * a, c, 1, 1)
    sd["model.rpn.head.bbox_pred.bias"] = t(4 * a)
    rep, p = 1024, cfg.roi_output_size
    sd["model.roi_heads.box_head.fc6.weight"] = t(rep, c * p * p)
    sd["model.roi_heads.box_head.fc6.bias"] = t(rep)
    sd["model.roi_heads.box_head.fc7.weight"] = t(rep, rep)
    sd["model.roi_heads.box_head.fc7.bias"] = t(rep)
    sd["model.roi_heads.box_predictor.cls_score.weight"] = t(6, rep)
    sd["model.roi_heads.box_predictor.cls_score.bias"] = t(6)
    sd["model.roi_heads.box_predictor.bbox_pred.weight"] = t(24, rep)
    sd["model.roi_heads.box_predictor.bbox_pred.bias"] = t(24)
    return sd


def test_convert_and_box_head_torch_parity():
    import jax

    cfg = _cfg()
    sd = _reference_state_dict(cfg)
    params = detector_state_dict_to_params(sd, cfg)

    # --- box head differential vs torch TwoMLPHead semantics:
    # torch: x.flatten(C, Py, Px row order) @ W6.T -> relu -> W7.T -> relu
    from layoutdit_tpu.models.detection.heads import box_head_forward

    rng = np.random.default_rng(0)
    c, p = cfg.backbone.fpn_out_channels, cfg.roi_output_size
    pooled_torch = torch.tensor(
        rng.normal(size=(5, c, p, p)).astype(np.float32)
    )
    w6 = sd["model.roi_heads.box_head.fc6.weight"]
    b6 = sd["model.roi_heads.box_head.fc6.bias"]
    w7 = sd["model.roi_heads.box_head.fc7.weight"]
    b7 = sd["model.roi_heads.box_head.fc7.bias"]
    ref = torch.relu(
        torch.relu(pooled_torch.flatten(1) @ w6.T + b6) @ w7.T + b7
    ).numpy()

    # ours consumes the RoIAlign-native [K, Px, Py, C] layout
    pooled_native = np.transpose(pooled_torch.numpy(), (0, 3, 2, 1))
    got = box_head_forward(params["box_head"], np.asarray(pooled_native))
    np.testing.assert_allclose(np.asarray(got), ref, rtol=1e-4, atol=1e-5)

    # --- predictor is a plain transposed linear
    np.testing.assert_allclose(
        np.asarray(params["box_predictor"]["cls"]["kernel"]),
        sd["model.roi_heads.box_predictor.cls_score.weight"].numpy().T,
    )

    # --- full converted detector runs end to end
    images = np.asarray(rng.uniform(0, 1, (2, 3, 64, 64)), np.float32)
    dets = jax.jit(lambda pa, im: detector_predict(pa, im, cfg))(
        params, images
    )
    assert np.isfinite(np.asarray(dets.boxes)).all()


def test_convert_validates_and_rejects():
    cfg = _cfg()
    sd = _reference_state_dict(cfg)

    missing = {k: v for k, v in sd.items() if "fc7" not in k}
    with pytest.raises(KeyError):
        detector_state_dict_to_params(missing, cfg)

    no_encoder = {k: v for k, v in sd.items() if ".dit." not in k}
    with pytest.raises(ValueError, match="no DiT encoder"):
        detector_state_dict_to_params(no_encoder, cfg)

    import dataclasses

    with pytest.raises(ValueError, match="cascade"):
        detector_state_dict_to_params(
            sd, dataclasses.replace(cfg, cascade_iou_threshs=(0.5, 0.6))
        )


def test_convert_cli_roundtrip(tmp_path):
    """CLI: .pth -> .msgpack, restorable by the model shell."""
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.convert_reference_checkpoint import main

    cfg = _cfg()
    sd = _reference_state_dict(cfg)
    pth = str(tmp_path / "epoch_3_cpu.pth")
    torch.save(sd, pth)

    partial = {
        "detection_model_config": {
            "image_size": 64,
            "fpn_out_channels": 32,
            "vit_overrides": {
                "hidden_size": 64, "num_hidden_layers": 4,
                "num_attention_heads": 4, "intermediate_size": 128,
                "image_size": 64,
                "use_absolute_position_embeddings": True,
                "layer_scale_init_value": 0.1,
            },
            "detection_budget": {
                "rpn_pre_nms_top_n_train": 64,
                "rpn_post_nms_top_n_train": 64,
                "rpn_pre_nms_top_n_test": 64,
                "rpn_post_nms_top_n_test": 64,
                "box_batch_size_per_image": 16,
                "box_detections_per_img": 8,
            },
        }
    }
    cfg_path = tmp_path / "cfg.json"
    cfg_path.write_text(json.dumps(partial))
    out = str(tmp_path / "converted.msgpack")
    set_layout_dit_config(None)
    try:
        main(["--torch", pth, "--out", out, "--config", str(cfg_path)])
        assert os.path.exists(out)
        lcfg = LayoutDitConfig(**partial)
        set_layout_dit_config(lcfg)
        model = build_model(lcfg)
        model.restore_checkpoint(out)
        np.testing.assert_allclose(
            np.asarray(model.params["box_head"]["fc7"]["kernel"]),
            sd["model.roi_heads.box_head.fc7.weight"].numpy().T,
        )
    finally:
        set_layout_dit_config(None)


def test_params_only_checkpoint_resumes_training(tmp_path):
    """The documented migrate-then-train path: a converted (params-only)
    checkpoint loads through Trainer.resume — weights restored, fresh
    optimizer state, epoch 0 — and training proceeds."""
    from layoutdit_tpu.config import LayoutDitConfig, set_layout_dit_config
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.tools.make_fixture import (
        make_fixture,
        write_fixture_config,
    )
    from layoutdit_tpu.train.checkpoint import save_checkpoint
    from layoutdit_tpu.train.trainer import Trainer

    root = str(tmp_path)
    make_fixture(root, n_images=4, split="samples", seed=21)
    write_fixture_config(root, epochs=1, batch_size=4, tiny_model=True)
    cfg = LayoutDitConfig(**json.load(open(os.path.join(root, "cfg.json"))))
    set_layout_dit_config(cfg)
    try:
        donor = build_model(cfg)
        ckpt = os.path.join(root, "converted.msgpack")
        save_checkpoint(ckpt, params=donor.params, opt_state=None, epoch=0,
                        extra={"source": "ref.pth"})

        model = build_model(cfg, seed=1)
        trainer = Trainer(cfg, model)
        trainer.resume(ckpt)  # must not raise on the missing opt_state
        assert trainer.epoch == 0
        np.testing.assert_array_equal(
            np.asarray(model.params["box_head"]["fc7"]["kernel"]),
            np.asarray(donor.params["box_head"]["fc7"]["kernel"]),
        )
        trainer.train()
        assert np.isfinite(trainer.loss_history[0])
    finally:
        set_layout_dit_config(None)
