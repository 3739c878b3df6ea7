"""ResNet-50 + FPN backbone (the reference's alternative backbone).

Parity target: ``resnet_fpn_backbone("resnet50", trainable_layers=5,
extra_blocks=LastLevelMaxPool())`` in /root/reference/src/layoutdit/
modeling/model.py:72-84 — torchvision's ImageNet ResNet-50 trunk with
returned layers C2..C5 feeding a 256-channel FPN (feature names
"0".."3" + "pool").

TPU-native notes:
  * BatchNorm is FROZEN (affine transform with baked running stats), as in
    torchvision's detection models — pure function, no state, and it folds
    into the preceding conv at compile time;
  * convs run in NCHW/OIHW so torch checkpoints import 1:1 (ImageNet
    weights can't be downloaded in this environment, but the importer
    accepts a torch resnet50 state_dict);
  * stride-2 3x3 convs use explicit torch "pad 1" semantics.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from layoutdit_tpu.models.fpn import fpn_forward, init_fpn_params

STAGE_BLOCKS = (3, 4, 6, 3)  # resnet50
STAGE_CHANNELS = (256, 512, 1024, 2048)


def _conv(x, p, stride=1, padding=0):
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(stride, stride),
        padding=((padding, padding), (padding, padding)),
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y


def _frozen_bn(x, p):
    """y = (x - mean) / sqrt(var + eps) * weight + bias, stats frozen.
    Precomputed as a single scale/shift."""
    scale = (p["weight"] / jnp.sqrt(p["var"] + 1e-5)).astype(x.dtype)
    shift = (p["bias"] - p["mean"] * p["weight"] / jnp.sqrt(p["var"] + 1e-5)).astype(x.dtype)
    return x * scale[None, :, None, None] + shift[None, :, None, None]


def _kaiming_conv(key, out_ch, in_ch, k):
    """torch resnet init: kaiming_normal_(fan_out, relu)."""
    fan_out = out_ch * k * k
    std = math.sqrt(2.0 / fan_out)
    return jax.random.normal(key, (out_ch, in_ch, k, k), jnp.float32) * std


def _bn_params(ch):
    return {
        "weight": jnp.ones((ch,), jnp.float32),
        "bias": jnp.zeros((ch,), jnp.float32),
        "mean": jnp.zeros((ch,), jnp.float32),
        "var": jnp.ones((ch,), jnp.float32),
    }


def init_resnet50_params(key: jax.Array) -> dict:
    keys = jax.random.split(key, 200)
    ki = iter(range(200))

    params: dict = {
        "stem": {
            "conv": {"kernel": _kaiming_conv(keys[next(ki)], 64, 3, 7)},
            "bn": _bn_params(64),
        },
        "stages": [],
    }
    in_ch = 64
    for si, (blocks, out_ch) in enumerate(zip(STAGE_BLOCKS, STAGE_CHANNELS)):
        mid = out_ch // 4
        stage = []
        for bi in range(blocks):
            stride = 2 if (bi == 0 and si > 0) else 1
            block = {
                "conv1": {"kernel": _kaiming_conv(keys[next(ki)], mid, in_ch, 1)},
                "bn1": _bn_params(mid),
                "conv2": {"kernel": _kaiming_conv(keys[next(ki)], mid, mid, 3)},
                "bn2": _bn_params(mid),
                "conv3": {"kernel": _kaiming_conv(keys[next(ki)], out_ch, mid, 1)},
                "bn3": _bn_params(out_ch),
            }
            if bi == 0:
                block["downsample"] = {
                    "conv": {"kernel": _kaiming_conv(keys[next(ki)], out_ch, in_ch, 1)},
                    "bn": _bn_params(out_ch),
                }
            stage.append(block)
            in_ch = out_ch
        params["stages"].append(stage)
    return params


def _bottleneck(x, p, stride):
    identity = x
    out = jax.nn.relu(_frozen_bn(_conv(x, p["conv1"]), p["bn1"]))
    out = jax.nn.relu(
        _frozen_bn(_conv(out, p["conv2"], stride=stride, padding=1), p["bn2"])
    )
    out = _frozen_bn(_conv(out, p["conv3"]), p["bn3"])
    if "downsample" in p:
        identity = _frozen_bn(
            _conv(x, p["downsample"]["conv"], stride=stride), p["downsample"]["bn"]
        )
    return jax.nn.relu(out + identity)


def resnet50_forward(params: dict, pixels: jnp.ndarray) -> list[jnp.ndarray]:
    """[B, 3, H, W] -> [C2, C3, C4, C5] (strides 4/8/16/32)."""
    x = _conv(pixels, params["stem"]["conv"], stride=2, padding=3)
    x = jax.nn.relu(_frozen_bn(x, params["stem"]["bn"]))
    # torch maxpool 3x3 stride 2 pad 1
    x = jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2),
        ((0, 0), (0, 0), (1, 1), (1, 1)),
    )
    feats = []
    for si, stage in enumerate(params["stages"]):
        for bi, block in enumerate(stage):
            stride = 2 if (bi == 0 and si > 0) else 1
            x = _bottleneck(x, block, stride)
        feats.append(x)
    return feats


def init_resnet_fpn_params(key: jax.Array, out_channels: int = 256) -> dict:
    k1, k2 = jax.random.split(key)
    return {
        "resnet": init_resnet50_params(k1),
        "fpn": init_fpn_params(k2, list(STAGE_CHANNELS), out_channels),
    }


def resnet_fpn_forward(
    params: dict, pixels: jnp.ndarray, compute_dtype=jnp.float32, **_unused
) -> list[jnp.ndarray]:
    """[B,3,H,W] -> [p2, p3, p4, p5, pool] with out_channels each
    (torchvision resnet_fpn_backbone + LastLevelMaxPool)."""
    feats = resnet50_forward(params["resnet"], pixels.astype(compute_dtype))
    return fpn_forward(params["fpn"], feats, extra_max_pool=True)


# ------------------------------------------------------------- torch import


def resnet50_state_dict_to_params(state_dict) -> dict:
    """torchvision resnet50 state_dict -> pytree (ImageNet warm start)."""

    def np_(t):
        return np.asarray(t.detach().cpu().numpy() if hasattr(t, "detach") else t,
                          dtype=np.float32)

    def bn(prefix):
        return {
            "weight": jnp.asarray(np_(state_dict[prefix + ".weight"])),
            "bias": jnp.asarray(np_(state_dict[prefix + ".bias"])),
            "mean": jnp.asarray(np_(state_dict[prefix + ".running_mean"])),
            "var": jnp.asarray(np_(state_dict[prefix + ".running_var"])),
        }

    params = {
        "stem": {
            "conv": {"kernel": jnp.asarray(np_(state_dict["conv1.weight"]))},
            "bn": bn("bn1"),
        },
        "stages": [],
    }
    for si, blocks in enumerate(STAGE_BLOCKS, start=1):
        stage = []
        for bi in range(blocks):
            pre = f"layer{si}.{bi}"
            block = {
                "conv1": {"kernel": jnp.asarray(np_(state_dict[pre + ".conv1.weight"]))},
                "bn1": bn(pre + ".bn1"),
                "conv2": {"kernel": jnp.asarray(np_(state_dict[pre + ".conv2.weight"]))},
                "bn2": bn(pre + ".bn2"),
                "conv3": {"kernel": jnp.asarray(np_(state_dict[pre + ".conv3.weight"]))},
                "bn3": bn(pre + ".bn3"),
            }
            if pre + ".downsample.0.weight" in state_dict:
                block["downsample"] = {
                    "conv": {"kernel": jnp.asarray(np_(state_dict[pre + ".downsample.0.weight"]))},
                    "bn": bn(pre + ".downsample.1"),
                }
            stage.append(block)
        params["stages"].append(stage)
    return params
