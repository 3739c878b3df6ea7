"""RPN head, TwoMLPHead box head, and FastRCNN predictor (pure JAX).

Parity targets are the torchvision modules instantiated implicitly by
``FasterRCNN(backbone, ...)`` in the reference (model.py:45-55):
  * RPNHead: shared 3x3 conv + ReLU, then 1x1 objectness / 4A deltas,
    weights normal(std=0.01), zero bias;
  * TwoMLPHead: flatten -> fc(12544, 1024) -> ReLU -> fc(1024, 1024) -> ReLU,
    default torch Linear init;
  * FastRCNNPredictor: fc -> class logits [NC+1], fc -> deltas [(NC+1)*4].

Prediction tensors are flattened to torchvision's (H, W, A) anchor order so
they align with anchors.grid_anchors.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from layoutdit_tpu.models.fpn import conv2d


def _normal_conv(key, out_ch, in_ch, k, std=0.01):
    return jax.random.normal(key, (out_ch, in_ch, k, k), jnp.float32) * std


def _torch_linear(key, in_f, out_f):
    """torch nn.Linear default init: kaiming_uniform(a=sqrt(5)) weight,
    uniform(+-1/sqrt(fan_in)) bias."""
    k_w, k_b = jax.random.split(key)
    bound_w = math.sqrt(6.0 / ((1 + 5.0) * in_f))
    bound_b = 1.0 / math.sqrt(in_f)
    return {
        "kernel": jax.random.uniform(k_w, (in_f, out_f), jnp.float32, -bound_w, bound_w),
        "bias": jax.random.uniform(k_b, (out_f,), jnp.float32, -bound_b, bound_b),
    }


def linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    return (y + p["bias"]).astype(x.dtype)


# ----------------------------------------------------------------- RPN head


def init_rpn_head_params(key: jax.Array, in_channels: int, num_anchors: int) -> dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "conv": {
            "kernel": _normal_conv(k1, in_channels, in_channels, 3),
            "bias": jnp.zeros((in_channels,), jnp.float32),
        },
        "cls": {
            "kernel": _normal_conv(k2, num_anchors, in_channels, 1),
            "bias": jnp.zeros((num_anchors,), jnp.float32),
        },
        "bbox": {
            "kernel": _normal_conv(k3, num_anchors * 4, in_channels, 1),
            "bias": jnp.zeros((num_anchors * 4,), jnp.float32),
        },
    }


def rpn_head_forward(
    params: dict, feats: list[jnp.ndarray], num_anchors: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Run the shared RPN head over all FPN levels.

    Returns (objectness [B, N], deltas [B, N, 4]) concatenated over levels
    in (level, y, x, anchor) order — torchvision
    concat_box_prediction_layers ordering.
    """
    logits_all, deltas_all = [], []
    for feat in feats:
        b = feat.shape[0]
        t = jax.nn.relu(conv2d(feat, params["conv"], padding=1))
        logits = conv2d(t, params["cls"])  # [B, A, H, W]
        deltas = conv2d(t, params["bbox"])  # [B, 4A, H, W]
        h, w = logits.shape[-2:]
        logits_all.append(
            logits.transpose(0, 2, 3, 1).reshape(b, h * w * num_anchors)
        )
        deltas_all.append(
            deltas.reshape(b, num_anchors, 4, h, w)
            .transpose(0, 3, 4, 1, 2)
            .reshape(b, h * w * num_anchors, 4)
        )
    return (
        jnp.concatenate(logits_all, axis=1),
        jnp.concatenate(deltas_all, axis=1),
    )


# ------------------------------------------------------------ box head/pred


def init_box_head_params(
    key: jax.Array,
    in_features: int,
    rep_size: int = 1024,
    pooled_shape: tuple[int, int, int] | None = None,
) -> dict:
    """TwoMLPHead params. With ``pooled_shape=(C, P, P)`` the fc6 kernel is
    stored in the RoIAlign contraction-native layout [P(x), P(y), C, rep]
    so the box head can contract the pooled 4D tensor directly (no
    flatten / relayout of the [K, 12544] activation stream). A torchvision
    state_dict import must permute fc6 rows (c, py, px) -> (px, py, c)
    to match (see weights_io notes)."""
    k1, k2 = jax.random.split(key)
    fc6 = _torch_linear(k1, in_features, rep_size)
    if pooled_shape is not None:
        c, p1, p2 = pooled_shape
        fc6["kernel"] = (
            fc6["kernel"].reshape(c, p1, p2, rep_size).transpose(2, 1, 0, 3)
        )  # [P(x), P(y), C, rep]
    return {"fc6": fc6, "fc7": _torch_linear(k2, rep_size, rep_size)}


def box_head_forward(params: dict, pooled: jnp.ndarray) -> jnp.ndarray:
    """Pooled RoIs -> [K, rep] (TwoMLPHead).

    pooled is [K, Px, Py, C] (RoIAlign native layout) when fc6's kernel
    is 4D [Px, Py, C, rep] — contracted directly with no flatten; or the
    legacy flattened path (pooled [K, C, Py, Px] row-major) when fc6 is
    2D."""
    fc6 = params["fc6"]
    if fc6["kernel"].ndim == 4:
        y = jax.lax.dot_general(
            pooled,
            fc6["kernel"].astype(pooled.dtype),
            dimension_numbers=(((1, 2, 3), (0, 1, 2)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        x = jax.nn.relu((y + fc6["bias"]).astype(pooled.dtype))
    else:
        x = jax.nn.relu(linear(pooled.reshape(pooled.shape[0], -1), fc6))
    return jax.nn.relu(linear(x, params["fc7"]))


def init_predictor_params(
    key: jax.Array,
    rep_size: int,
    num_classes_bg: int,
    reg_classes: int | None = None,
) -> dict:
    """FastRCNNPredictor params. ``reg_classes`` overrides the number of
    regression branches: the default (num_classes_bg) is torchvision's
    per-class regression; cascade stages pass 1 (class-agnostic)."""
    k1, k2 = jax.random.split(key)
    reg = num_classes_bg if reg_classes is None else reg_classes
    return {
        "cls": _torch_linear(k1, rep_size, num_classes_bg),
        "bbox": _torch_linear(k2, rep_size, reg * 4),
    }


def predictor_forward(params: dict, x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    return linear(x, params["cls"]), linear(x, params["bbox"])
