"""RoIAlign as dense matmuls on the MXU.

The reference uses torchvision's C++/CUDA ``roi_align`` through
``MultiScaleRoIAlign(output_size=7, sampling_ratio=2)``
(/root/reference/src/layoutdit/modeling/model.py:34-38). Bilinear sampling
is separable, so instead of per-sample gathers (slow on TPU) each RoI's
pooled output is computed as

    pooled[k] = Wy[k] @ feature @ Wx[k]^T

where ``Wy[k] : [S_h, H]`` / ``Wx[k] : [S_w, W]`` are the (2-nonzero-per-
row) bilinear sample-weight matrices for the RoI's sample grid, built with
one-hots. Sample-grid averaging (sampling_ratio^2 samples per bin) is a
reshape+mean. Two einsums → two MXU matmuls per level; fully
differentiable; invalid RoIs get zero weights so everything is
shape-static.

Numerics match torchvision ``aligned=False`` exactly (no half-pixel
offset, ``max(roi_size, 1)`` floor, out-of-range samples contribute 0).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from layoutdit_tpu.ops.boxes import box_area


def _bilinear_weight_matrix(coords: jnp.ndarray, size: int) -> jnp.ndarray:
    """[..., S] sample coords -> [..., S, size] bilinear row weights.

    torchvision bilinear_interpolate semantics: samples outside
    [-1, size] contribute zero; coords are clamped at 0; the top edge
    collapses to the last cell.
    """
    in_range = (coords >= -1.0) & (coords <= float(size))
    c = jnp.maximum(coords, 0.0)
    low = jnp.floor(c)
    # if low >= size-1: low = high = size-1, frac = 0
    top = low >= (size - 1)
    low = jnp.minimum(low, size - 1.0)
    frac = jnp.where(top, 0.0, c - low)
    high = jnp.where(top, low, low + 1.0)

    cells = jnp.arange(size, dtype=coords.dtype)
    onehot_low = (low[..., None] == cells).astype(coords.dtype)
    onehot_high = (high[..., None] == cells).astype(coords.dtype)
    w = onehot_low * (1.0 - frac)[..., None] + onehot_high * frac[..., None]
    return w * in_range[..., None].astype(coords.dtype)


def roi_align(
    feature: jnp.ndarray,
    rois: jnp.ndarray,
    spatial_scale: float,
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """RoIAlign one feature level.

    Args:
      feature: [C, H, W] single-image feature map.
      rois: [K, 4] xyxy boxes in image coordinates.
      spatial_scale: feature/image scale (e.g. 1/4 for p2).
      roi_mask: optional [K] bool; False rows produce zeros.

    Returns: [K, C, output_size, output_size] float32.
    """
    _, h, w = feature.shape
    k = rois.shape[0]
    p = output_size
    g = sampling_ratio
    dtype = jnp.float32
    rois = rois.astype(dtype)

    start_w = rois[:, 0] * spatial_scale
    start_h = rois[:, 1] * spatial_scale
    roi_w = jnp.maximum(rois[:, 2] * spatial_scale - start_w, 1.0)
    roi_h = jnp.maximum(rois[:, 3] * spatial_scale - start_h, 1.0)
    bin_w = roi_w / p
    bin_h = roi_h / p

    # sample coordinates: [K, p*g]
    grid = (
        jnp.arange(p * g, dtype=dtype) // g
        + (jnp.arange(p * g, dtype=dtype) % g + 0.5) / g
    )  # ph + (iy+0.5)/g, in bin units
    ys = start_h[:, None] + grid[None, :] * bin_h[:, None]
    xs = start_w[:, None] + grid[None, :] * bin_w[:, None]

    wy = _bilinear_weight_matrix(ys, h)  # [K, p*g, H]
    wx = _bilinear_weight_matrix(xs, w)  # [K, p*g, W]
    if roi_mask is not None:
        wy = wy * roi_mask[:, None, None].astype(dtype)

    feat = feature.astype(dtype)
    c = feat.shape[0]
    s_dim = p * g
    # Step 1 — one big MXU matmul: [K*S, H] @ [H, C*W] -> [K, S, C, W]
    t = jax.lax.dot_general(
        wy.reshape(k * s_dim, h),
        feat.transpose(1, 0, 2).reshape(h, c * w),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).reshape(k, s_dim, c, w)
    # Step 2 — batched GEMM over K: [K, S*C, W] x [K, S(W-contract)] ->
    # [K, S, C, S]. Explicit dot_general so XLA emits a batched matmul
    # (einsum here lowered to a broadcast-multiply-reduce and was ~1000x
    # slower on TPU).
    s = jax.lax.dot_general(
        t.reshape(k, s_dim * c, w),
        wx,  # [K, S, W]
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).reshape(k, s_dim, c, s_dim)
    # -> [K, C, S, S], then average the g x g samples per bin
    s = s.transpose(0, 2, 1, 3).reshape(k, c, p, g, p, g)
    return s.mean(axis=(3, 5))


def multiscale_roi_align(
    features: list[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: list[float],
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    roi_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """torchvision MultiScaleRoIAlign over FPN levels (model.py:34-38).

    Each RoI is assigned one level via the FPN level mapper
    ``lvl = floor(canonical_level + log2(sqrt(area)/canonical_scale))``;
    on TPU we run every level over all RoIs with non-assigned RoIs masked
    to zero weights and sum — shape-static, and the per-level einsums stay
    dense MXU work.

    Returns: [K, C, output_size, output_size].
    """
    num_levels = len(features)
    lvl_min = canonical_level - 2  # e.g. 2 for p2..p6
    area = jnp.maximum(box_area(rois.astype(jnp.float32)), 0.0)
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6)
    )
    lvl = jnp.clip(lvl, lvl_min, lvl_min + num_levels - 1).astype(jnp.int32)

    out = None
    for i, (feat, scale) in enumerate(zip(features, spatial_scales)):
        mask = lvl == (lvl_min + i)
        if roi_mask is not None:
            mask = mask & roi_mask
        pooled = roi_align(
            feat, rois, scale, output_size, sampling_ratio, roi_mask=mask
        )
        out = pooled if out is None else out + pooled
    return out
