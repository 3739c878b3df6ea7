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


def build_roi_weights(
    rois: jnp.ndarray,  # [K, 4]
    spatial_scale: float,
    size_hw: tuple[int, int],
    output_size: int = 7,
    sampling_ratio: int = 2,
    roi_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Per-roi separable bilinear weights (Wy [K, P, H], Wx [K, P, W]) with
    the g x g within-bin sample average folded in (the average of separable
    products factorizes). Rows of masked-out rois are zero."""
    h, w = size_hw
    p = output_size
    g = sampling_ratio
    wdtype = jnp.float32
    r = rois.astype(wdtype)

    start_w = r[:, 0] * spatial_scale
    start_h = r[:, 1] * spatial_scale
    roi_w = jnp.maximum(r[:, 2] * spatial_scale - start_w, 1.0)
    roi_h = jnp.maximum(r[:, 3] * spatial_scale - start_h, 1.0)

    grid = (
        jnp.arange(p * g, dtype=wdtype) // g
        + (jnp.arange(p * g, dtype=wdtype) % g + 0.5) / g
    )
    ys = start_h[:, None] + grid[None, :] * (roi_h / p)[:, None]
    xs = start_w[:, None] + grid[None, :] * (roi_w / p)[:, None]

    k = r.shape[0]
    wy = _bilinear_weight_matrix(ys, h).reshape(k, p, g, h).mean(axis=2)
    wx = _bilinear_weight_matrix(xs, w).reshape(k, p, g, w).mean(axis=2)
    if roi_mask is not None:
        wy = wy * roi_mask[:, None, None].astype(wdtype)
    return wy, wx


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
    wy, wx = build_roi_weights(
        rois, spatial_scale, feature.shape[-2:], output_size, sampling_ratio,
        roi_mask,
    )
    return pooled_from_weights(feature, wy, wx)


@jax.custom_vjp
def pooled_from_weights_native(
    feature: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray
) -> jnp.ndarray:
    """pooled[k, px, py, c] = (Wy[k] @ F @ Wx[k]^T) via two MXU
    contractions, in the contraction-NATIVE layout (no trailing
    transpose — the box head contracts this 4D tensor directly, see
    heads.box_head_forward). Custom VJP keeps the fat [K, P, C, W]
    backward intermediate in bf16 (autodiff would run it fp32 — it is
    the detector's largest gradient stream)."""
    feat = feature
    cdtype = feat.dtype  # bf16 in production: halves the HBM traffic of t
    # Multi-dim dot_generals with NO manual reshapes: profiler traces
    # showed explicit [K*P, C*W] <-> [K, P*C, W] reshapes forcing physical
    # tiled-layout conversions of the ~800MB `t` stream (~35ms each) —
    # XLA picks compatible layouts when given the contractions directly.
    # Step 1: t[k, p, c, w] = sum_h wy[k, p, h] featT[h, c, w]   (MXU)
    t = jax.lax.dot_general(
        wy.astype(cdtype),
        feat.transpose(1, 0, 2),  # [H, C, W]
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)
    # Step 2: s[k, px, py, c] = sum_w wx[k, px, w] t[k, py, c, w]
    # Operand order matters enormously on v5e: wx-as-lhs (M=P(x)=7,
    # N=(py,c)=1792) measured 3.9 ms vs 9.8 ms for t-as-lhs (M=1792,
    # N=7) at bs16 PubLayNet shapes (scripts/bench_gemm2.py) — the wide-N
    # form keeps the MXU lanes full.
    s = jax.lax.dot_general(
        wx.astype(cdtype),  # [K, P(x), W]
        t,
        dimension_numbers=(((2,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)  # [K, P(px), P(py), C]
    return s


def _pooled_fwd(feature, wy, wx):
    return pooled_from_weights_native(feature, wy, wx), (feature, wy, wx)


def _pooled_bwd(res, ds):
    """dfeat only (wy/wx derive from stop-gradient'd proposals).

    dT[k, p, c, w] = sum_px dS[k, p, c, px] Wx[k, px, w]   (batched GEMM)
    dF[c, h, w]    = sum_{k,p} Wy[(k,p), h]^T dT[(k,p), (c,w)]  (one GEMM)
    """
    feature, wy, wx = res
    cdtype = feature.dtype
    ds = ds.astype(cdtype)  # [K, P(px), P(py), C] — contraction-native
    # Multi-dim dot_generals, no manual reshapes (see forward).
    # dt[k, py, c, w] = sum_px ds[k, px, py, c] wx[k, px, w]
    dt = jax.lax.dot_general(
        ds,
        wx.astype(cdtype),  # [K, P(px), W]
        dimension_numbers=(((1,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(cdtype)  # [K, P(py), C, W]
    # df[h, c, w] = sum_{k, p} wy[k, p, h] dt[k, p, c, w]  (one big GEMM)
    df = jax.lax.dot_general(
        wy.astype(cdtype),
        dt,
        dimension_numbers=(((0, 1), (0, 1)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [H, C, W]
    df = df.transpose(1, 0, 2).astype(feature.dtype)
    return df, jnp.zeros_like(wy), jnp.zeros_like(wx)


pooled_from_weights_native.defvjp(_pooled_fwd, _pooled_bwd)


def pooled_from_weights(
    feature: jnp.ndarray, wy: jnp.ndarray, wx: jnp.ndarray
) -> jnp.ndarray:
    """torchvision-layout wrapper: [K, C, py, px]."""
    return pooled_from_weights_native(feature, wy, wx).transpose(0, 3, 2, 1)


def multiscale_roi_align(
    features: list[jnp.ndarray],
    rois: jnp.ndarray,
    spatial_scales: list[float],
    output_size: int = 7,
    sampling_ratio: int = 2,
    canonical_scale: float = 224.0,
    canonical_level: int = 4,
    roi_mask: jnp.ndarray | None = None,
    impl: str = "xla",
    native_layout: bool = False,
) -> jnp.ndarray:
    """torchvision MultiScaleRoIAlign over FPN levels (model.py:34-38).

    Each RoI is assigned one level via the FPN level mapper
    ``lvl = floor(canonical_level + log2(sqrt(area)/canonical_scale))``;
    on TPU we run every level over all RoIs with non-assigned RoIs masked
    to zero weights and sum — shape-static.

    impl: "xla" (level-atlas dot_generals, the production path),
    "xla_per_level" (five masked per-level contractions; kept as the
    reference formulation for parity tests) or "pallas"/"pallas_interpret"
    (fused VMEM-resident kernel, ops/roi_align_pallas.py).

    The atlas path stacks all FPN levels into ONE feature map along the
    H axis (W zero-padded to the widest level) and places each RoI's
    bilinear row-weights at its assigned level's row offset. One GEMM
    pair with a ~109-row contraction replaces five ragged masked ones:
    ~2x less HBM traffic (a single [K, P, C, W_max] intermediate instead
    of one per level) and a near-128 contraction dim for the MXU.

    Returns: [K, C, output_size, output_size], or [K, P(x), P(y), C] when
    ``native_layout=True`` (the contraction-native layout the box head
    consumes directly — saves two full relayouts of the pooled stream).
    """
    num_levels = len(features)
    lvl_min = canonical_level - 2  # e.g. 2 for p2..p6
    area = jnp.maximum(box_area(rois.astype(jnp.float32)), 0.0)
    lvl = jnp.floor(
        canonical_level + jnp.log2(jnp.sqrt(area) / canonical_scale + 1e-6)
    )
    lvl = jnp.clip(lvl, lvl_min, lvl_min + num_levels - 1).astype(jnp.int32)

    masks = []
    for i in range(num_levels):
        mask = lvl == (lvl_min + i)
        if roi_mask is not None:
            mask = mask & roi_mask
        masks.append(mask)

    if impl == "xla_per_level":
        out = None
        for feat, scale, mask in zip(features, spatial_scales, masks):
            pooled = roi_align(
                feat, rois, scale, output_size, sampling_ratio, roi_mask=mask
            )
            out = pooled if out is None else out + pooled
        return out

    # level-atlas path ("xla")
    w_max = max(int(f.shape[-1]) for f in features)
    f_cat = jnp.concatenate(
        [
            jnp.pad(f, ((0, 0), (0, 0), (0, w_max - f.shape[-1])))
            for f in features
        ],
        axis=1,
    )  # [C, sum(H_l), w_max]
    wy_parts = []
    wx_cat = None
    for feat, scale, mask in zip(features, spatial_scales, masks):
        wy, wx = build_roi_weights(
            rois, scale, feat.shape[-2:], output_size, sampling_ratio,
            roi_mask=mask,
        )
        wy_parts.append(wy)  # [K, P, H_l] — zero rows for other-level RoIs
        # wx must also be level-masked: padded columns of OTHER levels
        # overlap this level's [0, W_l) range in the shared T intermediate.
        wx = wx * mask[:, None, None].astype(wx.dtype)
        wx = jnp.pad(wx, ((0, 0), (0, 0), (0, w_max - wx.shape[-1])))
        wx_cat = wx if wx_cat is None else wx_cat + wx
    wy_cat = jnp.concatenate(wy_parts, axis=-1)  # [K, P, sum(H_l)]

    if impl.startswith("pallas"):
        # fused VMEM kernel over the SAME atlas operands (fwd + bwd never
        # materialize the [K, P, C, W] intermediate in HBM)
        from layoutdit_tpu.ops.roi_align_pallas import pooled_atlas_pallas

        out = pooled_atlas_pallas(
            f_cat, wy_cat, wx_cat, interpret=impl == "pallas_interpret"
        )  # [K, Py, Px, C]
        if native_layout:
            return out.transpose(0, 2, 1, 3)  # [K, Px, Py, C]
        return out.transpose(0, 3, 1, 2)  # [K, C, Py, Px]

    if native_layout:
        return pooled_from_weights_native(f_cat, wy_cat, wx_cat)
    return pooled_from_weights(f_cat, wy_cat, wx_cat)
