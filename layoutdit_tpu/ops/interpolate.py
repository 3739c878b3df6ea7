"""Bilinear resize with exact PyTorch ``align_corners=False`` semantics.

The reference resamples ViT feature maps with ``F.interpolate(...,
mode="bilinear", align_corners=False)`` (dit_backbone.py:56-61) and
resizes input images the same way inside GeneralizedRCNNTransform
(model.py:50-54). ``jax.image.resize`` antialiases on downsampling, so it
does NOT match; this module reproduces torch's formula exactly.

TPU-first design: 1-D interpolation is a (very) sparse linear map, so the
2-D resize is expressed as two dense matmuls ``A_h @ x @ A_w^T`` which XLA
tiles onto the MXU — no gathers, fully differentiable, and the interp
matrices are trace-time constants (static shapes). For the feature-map
sizes involved here (<= 224) the dense matrices are tiny.

The same matrix builder (numpy) drives the host-side image resize in the
input pipeline, guaranteeing host and device resizes are bit-identical in
formula.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def interp_matrix(in_size: int, out_size: int) -> np.ndarray:
    """[out_size, in_size] matrix M with (M @ v) = torch bilinear resize of v.

    torch (UpSampleBilinear2d, align_corners=False):
      src = max(0, (dst + 0.5) * in/out - 0.5)
      lo = floor(src); hi = min(lo+1, in-1); t = src - lo
      out = (1-t) * v[lo] + t * v[hi]
    """
    scale = in_size / out_size
    dst = np.arange(out_size, dtype=np.float64)
    src = np.maximum(0.0, (dst + 0.5) * scale - 0.5)
    lo = np.floor(src).astype(np.int64)
    lo = np.minimum(lo, in_size - 1)
    hi = np.minimum(lo + 1, in_size - 1)
    t = src - lo
    m = np.zeros((out_size, in_size), dtype=np.float64)
    m[np.arange(out_size), lo] += 1.0 - t
    m[np.arange(out_size), hi] += t
    return m.astype(np.float32)


def resize_bilinear(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [..., H, W] -> [..., out_h, out_w], torch bilinear semantics.

    Runs as two matmuls on the MXU; accumulation in float32.
    """
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    a_h = jnp.asarray(interp_matrix(in_h, out_h), dtype=dtype)
    a_w = jnp.asarray(interp_matrix(in_w, out_w), dtype=dtype)
    # [..., H, W] -> [..., out_h, W]
    y = jnp.einsum("oh,...hw->...ow", a_h, x, preferred_element_type=jnp.float32)
    # [..., out_h, W] -> [..., out_h, out_w]
    y = jnp.einsum("...ow,pw->...op", y, a_w, preferred_element_type=jnp.float32)
    return y.astype(dtype)


def resize_bilinear_np(x: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Host-side (numpy) resize [..., H, W], identical formula to device."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    a_h = interp_matrix(in_h, out_h)
    a_w = interp_matrix(in_w, out_w)
    y = np.einsum("oh,...hw->...ow", a_h, x.astype(np.float32))
    return np.einsum("...ow,pw->...op", y, a_w)


@functools.lru_cache(maxsize=None)
def interp_matrix_cubic(in_size: int, out_size: int) -> np.ndarray:
    """[out, in] bicubic (Catmull-Rom style, A=-0.75) interpolation matrix,
    torch align_corners=False semantics (UpSampleBicubic2d): 4 taps per
    output with indices clamped at the edges."""
    a = -0.75

    def w(t):
        t = abs(t)
        if t <= 1:
            return (a + 2) * t**3 - (a + 3) * t**2 + 1
        if t < 2:
            return a * t**3 - 5 * a * t**2 + 8 * a * t - 4 * a
        return 0.0

    scale = in_size / out_size
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for d in range(out_size):
        src = (d + 0.5) * scale - 0.5
        fl = np.floor(src)
        t = src - fl
        for k in range(-1, 3):
            idx = int(np.clip(fl + k, 0, in_size - 1))
            m[d, idx] += w(k - t)
    return m.astype(np.float32)


def resize_bicubic(x: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize [..., H, W] with torch bicubic align_corners=False semantics
    (used for BEiT position-embedding interpolation at non-native input
    sizes, HF interpolate_pos_encoding parity)."""
    in_h, in_w = x.shape[-2], x.shape[-1]
    if (in_h, in_w) == (out_h, out_w):
        return x
    dtype = x.dtype
    a_h = jnp.asarray(interp_matrix_cubic(in_h, out_h), dtype=jnp.float32)
    a_w = jnp.asarray(interp_matrix_cubic(in_w, out_w), dtype=jnp.float32)
    y = jnp.einsum("oh,...hw->...ow", a_h, x.astype(jnp.float32))
    y = jnp.einsum("...ow,pw->...op", y, a_w)
    return y.astype(dtype)


def max_pool_stride2(x: jnp.ndarray) -> jnp.ndarray:
    """kernel=1 stride=2 max pool (= strided slice) on [..., H, W].

    torchvision LastLevelMaxPool: F.max_pool2d(x, 1, 2, 0) — with kernel 1
    this is exactly x[..., ::2, ::2] (output size ceil(H/2) via floor((H-1)/2)+1).
    """
    return x[..., ::2, ::2]
