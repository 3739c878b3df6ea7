"""ResNet-50 FPN backbone tests (reference alternative backbone,
model.py:72-84)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from layoutdit_tpu.models.resnet import (
    init_resnet50_params,
    init_resnet_fpn_params,
    resnet50_forward,
    resnet_fpn_forward,
    resnet50_state_dict_to_params,
)


def test_resnet50_feature_shapes_and_param_count():
    params = init_resnet50_params(jax.random.PRNGKey(0))
    n = sum(x.size for x in jax.tree_util.tree_leaves(params))
    # torchvision resnet50 minus fc (2048*1000+1000) and with BN stats
    # counted twice (mean/var alongside weight/bias): 23.51M weights +
    # 2x BN stats (~0.11M)
    assert 23.4e6 < n < 23.8e6
    x = jnp.zeros((1, 3, 224, 224))
    feats = jax.jit(resnet50_forward)(params, x)
    assert [f.shape for f in feats] == [
        (1, 256, 56, 56), (1, 512, 28, 28), (1, 1024, 14, 14), (1, 2048, 7, 7)
    ]


def test_resnet_fpn_pyramid():
    params = init_resnet_fpn_params(jax.random.PRNGKey(0))
    feats = jax.jit(resnet_fpn_forward)(params, jnp.zeros((2, 3, 224, 224)))
    assert [f.shape for f in feats] == [
        (2, 256, 56, 56), (2, 256, 28, 28), (2, 256, 14, 14),
        (2, 256, 7, 7), (2, 256, 4, 4),
    ]
    assert all(bool(jnp.isfinite(f).all()) for f in feats)


def test_torch_state_dict_roundtrip():
    """Importer consumes the exact torchvision resnet50 key layout."""
    import torch

    params = init_resnet50_params(jax.random.PRNGKey(0))

    # build a synthetic state_dict with torchvision names from our params
    sd = {}
    sd["conv1.weight"] = torch.randn(64, 3, 7, 7)
    sd["bn1.weight"] = torch.randn(64); sd["bn1.bias"] = torch.randn(64)
    sd["bn1.running_mean"] = torch.randn(64); sd["bn1.running_var"] = torch.rand(64)
    from layoutdit_tpu.models.resnet import STAGE_BLOCKS, STAGE_CHANNELS
    in_ch = 64
    for si, (blocks, out_ch) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS), 1):
        mid = out_ch // 4
        for bi in range(blocks):
            pre = f"layer{si}.{bi}"
            cin = in_ch if bi == 0 else out_ch
            sd[pre + ".conv1.weight"] = torch.randn(mid, cin, 1, 1)
            sd[pre + ".conv2.weight"] = torch.randn(mid, mid, 3, 3)
            sd[pre + ".conv3.weight"] = torch.randn(out_ch, mid, 1, 1)
            for b in ("bn1", "bn2", "bn3"):
                ch = mid if b != "bn3" else out_ch
                sd[f"{pre}.{b}.weight"] = torch.randn(ch)
                sd[f"{pre}.{b}.bias"] = torch.randn(ch)
                sd[f"{pre}.{b}.running_mean"] = torch.randn(ch)
                sd[f"{pre}.{b}.running_var"] = torch.rand(ch)
            if bi == 0:
                sd[pre + ".downsample.0.weight"] = torch.randn(out_ch, cin, 1, 1)
                sd[pre + ".downsample.1.weight"] = torch.randn(out_ch)
                sd[pre + ".downsample.1.bias"] = torch.randn(out_ch)
                sd[pre + ".downsample.1.running_mean"] = torch.randn(out_ch)
                sd[pre + ".downsample.1.running_var"] = torch.rand(out_ch)
        in_ch = out_ch

    imported = resnet50_state_dict_to_params(sd)
    # same tree structure, same shapes
    ref_shapes = jax.tree_util.tree_map(lambda x: x.shape, params)
    got_shapes = jax.tree_util.tree_map(lambda x: x.shape, imported)
    assert ref_shapes == got_shapes
    # forward runs
    out = jax.jit(resnet50_forward)(imported, jnp.zeros((1, 3, 64, 64)))
    assert out[-1].shape == (1, 2048, 2, 2)


@pytest.mark.slow
def test_resnet_detector_end_to_end():
    from layoutdit_tpu.config.constructs import (
        BackboneType, DetectionBudget, ModelConfig,
    )
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig, detector_loss, detector_predict, init_detector_params,
    )

    mc = ModelConfig(
        backbone_type=BackboneType.RESNET50,
        image_size=64,
        detection_budget=DetectionBudget(
            rpn_pre_nms_top_n_train=64, rpn_pre_nms_top_n_test=64,
            rpn_post_nms_top_n_train=64, rpn_post_nms_top_n_test=64,
            box_batch_size_per_image=16, box_detections_per_img=8,
        ),
    )
    cfg = DetectorConfig.from_model_config(mc)
    assert cfg.backbone_kind == "resnet50"
    params = init_detector_params(jax.random.PRNGKey(0), cfg)

    images = jnp.asarray(
        np.random.default_rng(0).uniform(0, 1, (1, 3, 64, 64)), jnp.float32
    )
    gt_boxes = jnp.asarray([[[5.0, 5.0, 30.0, 40.0]]])
    gt_labels = jnp.asarray([[1]], jnp.int32)
    gt_valid = jnp.asarray([[True]])
    # jit both paths: one (persistently cached) compile instead of
    # thousands of eager op dispatches on the 1-core CI host
    losses = jax.jit(
        lambda p, k, im: detector_loss(
            p, k, im, gt_boxes, gt_labels, gt_valid, cfg
        )
    )(params, jax.random.PRNGKey(1), images)
    assert all(np.isfinite(float(v)) for v in losses.values())
    dets = jax.jit(lambda p, im: detector_predict(p, im, cfg))(params, images)
    assert dets.boxes.shape[1] == 8
