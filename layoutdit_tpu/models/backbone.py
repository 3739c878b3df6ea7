"""DiT backbone -> multi-scale pyramid -> FPN (the reference's DiTWithFPN).

Parity target: /root/reference/src/layoutdit/modeling/dit_backbone.py:16-90.
  * taps hidden states at layers [d//3, d//2, 2d//3, d]   (:33-34)
  * drops CLS, reshapes tokens to [B, D, H/16, W/16]      (:51-54)
  * bilinear resample by [4x, 2x, 1x, 0.5x] -> p2..p5     (:35, :56-61)
  * FPN(in=[D]x4, out=256) + LastLevelMaxPool -> "pool"   (:78-85)

TPU-first: the resamples are the MXU-matmul bilinear from ops.interpolate
(exact torch align_corners=False semantics), and the whole thing is a pure
function suitable for jit/vmap/grad.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from layoutdit_tpu.models import vit as vit_mod
from layoutdit_tpu.models.fpn import (
    conv2d,
    fpn_forward_from_laterals,
    init_fpn_params,
)
from layoutdit_tpu.models.vit import ViTConfig, init_vit_params, vit_forward
from layoutdit_tpu.ops.interpolate import resize_bilinear


@dataclasses.dataclass(frozen=True)
class BackboneConfig:
    vit: ViTConfig = vit_mod.DIT_BASE
    fpn_out_channels: int = 256
    scales: tuple[float, ...] = (4.0, 2.0, 1.0, 0.5)

    @property
    def taps(self) -> tuple[int, ...]:
        d = self.vit.num_hidden_layers
        return (d // 3, d // 2, 2 * d // 3, d)

    @property
    def feature_strides(self) -> tuple[int, ...]:
        """Image-pixel stride of each output level p2..p5 + pool."""
        p = self.vit.patch_size
        return tuple(int(p / s) for s in self.scales) + (
            int(p / self.scales[-1]) * 2,
        )

    @property
    def spatial_scales(self) -> tuple[float, ...]:
        return tuple(1.0 / s for s in self.feature_strides)


def init_backbone_params(key: jax.Array, cfg: BackboneConfig) -> dict:
    k_vit, k_fpn = jax.random.split(key)
    return {
        "vit": init_vit_params(k_vit, cfg.vit),
        "fpn": init_fpn_params(
            k_fpn, [cfg.vit.hidden_size] * 4, cfg.fpn_out_channels
        ),
    }


def backbone_forward(
    params: dict,
    pixels: jnp.ndarray,
    cfg: BackboneConfig,
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "xla",
    remat: bool = False,
    remat_policy: str = "full",
    seq_sharding=None,
    pipeline=None,
    aux_out: dict | None = None,
) -> list[jnp.ndarray]:
    """[B, 3, H, W] normalized pixels -> [p2, p3, p4, p5, pool] features.

    For the production 224x224 input the levels are 56/28/14/7/4 spatial
    with ``fpn_out_channels`` channels.
    """
    b, _, h, w = pixels.shape
    patch = cfg.vit.patch_size
    gh, gw = h // patch, w // patch

    hidden = vit_forward(
        params["vit"], pixels, cfg.vit, taps=cfg.taps,
        compute_dtype=compute_dtype, attention_impl=attention_impl,
        remat=remat, remat_policy=remat_policy,
        seq_sharding=seq_sharding, pipeline=pipeline,
        aux_out=aux_out,
    )

    # The reference resizes each 768-ch tap to its pyramid scale and THEN
    # applies the FPN's 1x1 lateral conv (dit_backbone.py:50-61 ->
    # FeaturePyramidNetwork). A 1x1 conv is pointwise over space and
    # bilinear resize is channelwise-independent, so they commute exactly;
    # applying the lateral at the native 14x14 grid first cuts the lateral
    # GEMMs ~16x for p2 (and the resized stream from 768 to 256 channels)
    # with identical results up to fp summation order.
    laterals = []
    for t, scale, inner in zip(hidden, cfg.scales, params["fpn"]["inner"]):
        # [B, 1+P, D] -> drop CLS -> [B, D, gh, gw]  (dit_backbone.py:50-54)
        x = t[:, 1:, :].transpose(0, 2, 1).reshape(b, cfg.vit.hidden_size, gh, gw)
        x = conv2d(x, inner)
        if scale != 1.0:
            x = resize_bilinear(x, int(gh * scale), int(gw * scale))
        laterals.append(x)

    return fpn_forward_from_laterals(params["fpn"], laterals, extra_max_pool=True)
