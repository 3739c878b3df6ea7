"""Feature Pyramid Network (torchvision-parity, pure JAX).

The reference wraps its DiT pyramid with torchvision's
``FeaturePyramidNetwork(in_channels=[768]x4, out_channels=256,
extra_blocks=LastLevelMaxPool())`` (dit_backbone.py:78-85). This is the
same computation as pure functions: 1x1 lateral convs, top-down nearest
upsample + add, 3x3 output convs, and a stride-2 "pool" extra level.

Convs run via lax.conv_general_dilated in NCHW; weight layout is torch's
OIHW so checkpoints can be ported 1:1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def conv2d(x: jnp.ndarray, p: dict, padding: str | int = 0) -> jnp.ndarray:
    """NCHW conv with OIHW kernel + bias (torch Conv2d semantics)."""
    pad = ((padding, padding), (padding, padding)) if isinstance(padding, int) else padding
    # no preferred_element_type: jax 0.9's conv transpose rejects the
    # resulting mixed-dtype cotangent; the MXU accumulates bf16 convs in
    # fp32 internally regardless.
    y = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype),
        window_strides=(1, 1), padding=pad,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return y + p["bias"].astype(x.dtype)[None, :, None, None]


def _kaiming_uniform_conv(key, out_ch, in_ch, k, a=1.0):
    """torchvision FPN conv init: kaiming_uniform_(a=1), bias zeros."""
    fan_in = in_ch * k * k
    bound = math.sqrt(6.0 / ((1 + a * a) * fan_in))
    return jax.random.uniform(
        key, (out_ch, in_ch, k, k), jnp.float32, -bound, bound
    )


def init_fpn_params(
    key: jax.Array, in_channels_list: list[int], out_channels: int = 256
) -> dict:
    keys = jax.random.split(key, 2 * len(in_channels_list))
    inner, layer = [], []
    for i, in_ch in enumerate(in_channels_list):
        inner.append({
            "kernel": _kaiming_uniform_conv(keys[2 * i], out_channels, in_ch, 1),
            "bias": jnp.zeros((out_channels,), jnp.float32),
        })
        layer.append({
            "kernel": _kaiming_uniform_conv(keys[2 * i + 1], out_channels, out_channels, 3),
            "bias": jnp.zeros((out_channels,), jnp.float32),
        })
    return {"inner": inner, "layer": layer}


def nearest_upsample_to(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """torch F.interpolate(mode='nearest') to an explicit size:
    src_idx = floor(dst * in/out)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    rows = np.floor(np.arange(out_h) * in_h / out_h).astype(np.int32)
    cols = np.floor(np.arange(out_w) * in_w / out_w).astype(np.int32)
    return x[..., rows, :][..., cols]


def fpn_forward_from_laterals(
    params: dict, laterals: list[jnp.ndarray], extra_max_pool: bool = True
) -> list[jnp.ndarray]:
    """Top-down + 3x3 stage only: callers that can apply the 1x1 lateral
    convs more cheaply (e.g. before upsampling — a 1x1 conv commutes with
    bilinear resize, see backbone_forward) pass the laterals directly."""
    layer = params["layer"]
    last_inner = laterals[-1]
    results = [conv2d(last_inner, layer[-1], padding=1)]
    for idx in range(len(laterals) - 2, -1, -1):
        top_down = nearest_upsample_to(
            last_inner, laterals[idx].shape[-2], laterals[idx].shape[-1]
        )
        last_inner = laterals[idx] + top_down
        results.insert(0, conv2d(last_inner, layer[idx], padding=1))
    if extra_max_pool:
        results.append(results[-1][..., ::2, ::2])
    return results


def fpn_forward(
    params: dict, feats: list[jnp.ndarray], extra_max_pool: bool = True
) -> list[jnp.ndarray]:
    """[p2..p5] inputs (fine->coarse) -> [p2..p5(,pool)] outputs.

    torchvision FeaturePyramidNetwork.forward: top-down accumulation of
    1x1 laterals with nearest upsampling, then per-level 3x3 convs;
    LastLevelMaxPool appends x[:, :, ::2, ::2] (kernel-1 stride-2 pool).
    """
    inner = params["inner"]
    laterals = [conv2d(f, p) for f, p in zip(feats, inner)]
    return fpn_forward_from_laterals(params, laterals, extra_max_pool)
