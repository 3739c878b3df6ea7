"""Int8 weight + dynamic-activation quantization for the serving path.

v5e's MXU runs s8xs8->s32 at 2x its bf16 rate, so at high-res token
counts (where the encoder GEMMs dominate inference) an int8 encoder is
the remaining speed-of-light lever. Scheme (standard W8A8 dynamic):

  * weights: per-output-channel symmetric int8, quantized once offline
    (``quantize_vit_params``);
  * activations: per-row (token) symmetric int8, computed on the fly
    inside the step (absmax / 127) — no calibration data needed;
  * accumulation in int32, dequantized by row_scale x col_scale.

Serving-only: the int8 path has no custom VJP (training stays bf16).
The quantized tree keeps the exact structure of the fp32 tree with each
linear's ``kernel`` replaced by ``kernel_q`` + ``kernel_scale`` so
checkpoint/sharding tooling keeps working; ``vit_forward`` dispatches on
the presence of ``kernel_q`` (models/vit.py).

No counterpart in the reference (fp16 AMP only, trainer.py:78-80).

MEASURED RESULT on v5e (scripts/bench_int8_gemm.py +
bench_int8_encoder.py): at the isolated GEMM level, dynamic int8 wins
only at K=768 shapes (qkv/mlp_in); through the REAL encoder it is
NEUTRAL — 1.00x at 224 px (bs16) and 0.99x at 1024 px (bs4, flash
attention dominates). The quant/absmax pass over activations plus the
int32->f32 dequant pass cancel the MXU-rate saving at dit-base shapes.
The path is kept (correctness-tested, ~1% output error) for models /
shapes where the GEMM share is larger, but the serving default stays
bf16.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Linear entries of a ViT layer that carry the encoder's GEMM FLOPs.
_VIT_LINEAR_KEYS = ("q", "k", "v", "attn_out", "mlp_in", "mlp_out")
# Sites where W8A8 *dynamic* quantization wins on v5e
# (scripts/bench_int8_gemm.py): the K=768 projections, where the
# per-row activation-quant pass is small next to the GEMM. attn_out and
# mlp_out lose (0.68x / 0.73x) — the quant pass over the [*, 3072] GELU
# output swamps the MXU saving — so the default leaves them bf16.
# q/k/v share one activation quantization (fused QKV, models/vit.py).
VIT_INT8_DEFAULT_KEYS = ("q", "k", "v", "mlp_in")


def quantize_linear(p: dict) -> dict:
    """{'kernel': f32 [K, N], ...} -> int8 weights + per-column scale."""
    if "lora_a" in p:
        raise ValueError(
            "unmerged LoRA adapters would be silently dropped by int8 "
            "quantization; fold them first (models/lora.py merge_lora)"
        )
    w = p["kernel"].astype(jnp.float32)
    scale = jnp.max(jnp.abs(w), axis=0) / 127.0  # [N]
    scale = jnp.maximum(scale, 1e-8)
    q = jnp.clip(jnp.round(w / scale[None, :]), -127, 127).astype(jnp.int8)
    out = {"kernel_q": q, "kernel_scale": scale}
    if "bias" in p:
        out["bias"] = p["bias"]
    return out


def quantize_activations(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-row symmetric int8: [..., K] -> (int8 [..., K], f32 [..., 1])."""
    s = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=-1, keepdims=True) / 127.0
    s = jnp.maximum(s, 1e-8)
    q = jnp.clip(jnp.round(x.astype(jnp.float32) / s), -127, 127).astype(jnp.int8)
    return q, s


def int8_linear(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    """W8A8 dynamic linear: y = (x_q @ w_q) * s_row * s_col + bias."""
    xq, xs = quantize_activations(x)
    y = jax.lax.dot_general(
        xq, p["kernel_q"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = y.astype(jnp.float32) * xs * p["kernel_scale"]
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(x.dtype)


def int8_matmul_quantized_rhs(
    xq: jnp.ndarray, xs: jnp.ndarray, w_q: jnp.ndarray, w_scale: jnp.ndarray
) -> jnp.ndarray:
    """Raw s8xs8 contraction for callers that pre-quantize (fused QKV)."""
    y = jax.lax.dot_general(
        xq, w_q,
        dimension_numbers=(((xq.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    return y.astype(jnp.float32) * xs * w_scale


def quantize_vit_params(params: dict, keys: tuple[str, ...] | None = None) -> dict:
    """Quantize transformer-layer linears of a ViT param tree.

    ``keys`` selects which linears go int8 (default: the measured-winning
    subset, VIT_INT8_DEFAULT_KEYS; pass _VIT_LINEAR_KEYS for all). Note
    q/k/v must be quantized together (the fused-QKV path assumes one
    layout). Patch embed, position tables, layer norms and layer-scales
    stay fp32 (negligible FLOPs, accuracy-sensitive). Returns a new tree;
    input is untouched.
    """
    keys = VIT_INT8_DEFAULT_KEYS if keys is None else keys
    if ("q" in keys) != ("k" in keys) or ("q" in keys) != ("v" in keys):
        raise ValueError("q/k/v must be quantized together (fused QKV)")
    out = dict(params)
    layers = []
    for layer in params["layers"]:
        new = dict(layer)
        for k in keys:
            if k in layer:
                new[k] = quantize_linear(layer[k])
        layers.append(new)
    out["layers"] = layers
    return out


def quantize_detector_params(params: dict, keys: tuple[str, ...] | None = None) -> dict:
    """Quantize the encoder inside a full detector param tree (the FPN,
    RPN and box heads stay bf16 — they are a small share of the step and
    detection-head numerics drive box coordinates directly)."""
    out = dict(params)
    bb = dict(params["backbone"])
    if "vit" in bb:
        bb["vit"] = quantize_vit_params(bb["vit"], keys)
    out["backbone"] = bb
    return out
