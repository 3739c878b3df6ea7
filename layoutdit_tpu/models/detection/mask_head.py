"""Mask R-CNN head: instance-segmentation branch over the RoI pipeline.

BEYOND-REFERENCE capability: the reference trains a pure Faster R-CNN
(`/root/reference/src/layoutdit/modeling/model.py:45-55`) and ignores
PubLayNet's `segmentation` polygons entirely. This branch adds the
standard Mask R-CNN extension (He et al., ICCV 2017) so layout regions
come back as pixel masks, not just boxes. Semantics follow torchvision's
`MaskRCNNHeads`/`MaskRCNNPredictor`/`maskrcnn_loss` (the library the
reference builds on), re-designed shape-static for TPU:

  * training runs the mask branch on the POSITIVE sampled proposals only
    (torchvision RoIHeads.forward does the same) — a static
    ``max_pos = box_batch_size_per_image * box_positive_fraction`` slot
    block, which is exactly the FIRST slots of ``TrainingSamples`` (the
    sampler packs positives first), so no gather is needed;
  * mask targets are projected by RoIAlign-ing each matched GT bitmask
    under its proposal box (torchvision ``project_masks_on_boxes``) —
    GT masks ride to the device as a fixed [B, G, M, M] uint8 block
    (M = ``mask_gt_size``, default image_size//2) instead of full-res
    to keep H2D traffic bounded;
  * the head is 4x (conv3x3 C->C, ReLU) -> deconv2x -> ReLU -> 1x1 to
    NC+1 channels; logits are indexed by class label (background channel
    0 is never trained/read, matching torchvision's
    ``mask_logits[arange, labels]``);
  * loss is BCE-with-logits averaged over the positives' 28x28 maps.

Checkpoint import note: torch ``ConvTranspose2d.weight`` is [in, out,
kH, kW]; this module stores the deconv kernel [out, in, kH, kW] (jax
``conv_transpose`` OIHW), so an import must transpose dims (0, 1).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from layoutdit_tpu.models.fpn import conv2d


def _kaiming_normal_conv(key, out_ch, in_ch, k):
    """torchvision mask-head init: kaiming_normal_(fan_out, relu)."""
    fan_out = out_ch * k * k
    std = (2.0 / fan_out) ** 0.5
    return jax.random.normal(key, (out_ch, in_ch, k, k), jnp.float32) * std


def init_mask_head_params(
    key: jax.Array,
    in_channels: int,
    num_classes_bg: int,
    hidden: int = 256,
    num_convs: int = 4,
) -> dict:
    """MaskRCNNHeads (num_convs x conv3x3) + MaskRCNNPredictor
    (deconv2x2/s2 -> 1x1 to NC+1)."""
    keys = jax.random.split(key, num_convs + 2)
    params: dict = {}
    c_in = in_channels
    for i in range(num_convs):
        params[f"fcn{i + 1}"] = {
            "kernel": _kaiming_normal_conv(keys[i], hidden, c_in, 3),
            "bias": jnp.zeros((hidden,), jnp.float32),
        }
        c_in = hidden
    params["deconv"] = {
        # [out, in, 2, 2] — jax conv_transpose OIHW (see module docstring)
        "kernel": _kaiming_normal_conv(keys[num_convs], hidden, c_in, 2),
        "bias": jnp.zeros((hidden,), jnp.float32),
    }
    params["logits"] = {
        "kernel": _kaiming_normal_conv(keys[num_convs + 1], num_classes_bg, hidden, 1),
        "bias": jnp.zeros((num_classes_bg,), jnp.float32),
    }
    return params


def mask_head_forward(params: dict, pooled: jnp.ndarray) -> jnp.ndarray:
    """[K, C, P, P] pooled RoI features -> [K, NC+1, 2P, 2P] mask logits."""
    x = pooled
    i = 1
    while f"fcn{i}" in params:
        x = jax.nn.relu(conv2d(x, params[f"fcn{i}"], padding=1))
        i += 1
    d = params["deconv"]
    x = jax.lax.conv_transpose(
        x,
        d["kernel"].astype(x.dtype),
        strides=(2, 2),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    x = jax.nn.relu(x + d["bias"].astype(x.dtype)[None, :, None, None])
    return conv2d(x, params["logits"]).astype(jnp.float32)


def project_masks_on_boxes(
    gt_masks: jnp.ndarray,  # [G, M, M] float or uint8 in {0,1}, M-space
    boxes: jnp.ndarray,  # [K, 4] xyxy in image space
    matched_gt: jnp.ndarray,  # [K] int index into G
    image_size: int,
    out_size: int,
) -> jnp.ndarray:
    """torchvision ``project_masks_on_boxes``: crop each matched GT mask
    under its proposal box to [out_size, out_size] via RoIAlign
    (sampling_ratio 1 on the single-channel mask), binarized at 0.5.

    The GT block is stored at M x M (model space downsampled by
    ``M / image_size``); the RoIAlign spatial_scale maps image-space
    boxes onto it exactly.
    """
    from layoutdit_tpu.ops.roi_align import roi_align

    m = gt_masks.shape[-1]
    per_roi = gt_masks[matched_gt].astype(jnp.float32)  # [K, M, M]
    scale = m / float(image_size)

    def one(mask, box):  # [M, M], [4] -> [P, P]
        return roi_align(
            mask[None], box[None], spatial_scale=scale,
            output_size=out_size, sampling_ratio=1,
        )[0, 0]

    pooled = jax.vmap(one)(per_roi, boxes)  # [K, P, P]
    return (pooled >= 0.5).astype(jnp.float32)


def maskrcnn_loss(
    mask_logits: jnp.ndarray,  # [K, NC+1, P, P] (positives-only slots)
    labels: jnp.ndarray,  # [K] int, 1..NC for real positives
    targets: jnp.ndarray,  # [K, P, P] float {0,1}
    pos_valid: jnp.ndarray,  # [K] bool
) -> jnp.ndarray:
    """torchvision ``maskrcnn_loss``: BCE-with-logits on each positive's
    own-class mask map, averaged over all positive pixels."""
    k, _, p, _ = mask_logits.shape
    cls = jnp.maximum(labels, 0)
    logit = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=1
    )[:, 0]  # [K, P, P]
    # numerically-stable BCE-with-logits
    bce = jnp.maximum(logit, 0.0) - logit * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logit))
    )
    bce = jnp.where(pos_valid[:, None, None], bce, 0.0)
    denom = jnp.maximum(pos_valid.sum(), 1) * p * p
    return bce.sum() / denom


def mask_probs_for_labels(
    mask_logits: jnp.ndarray,  # [K, NC+1, P, P]
    labels: jnp.ndarray,  # [K] int 1..NC
) -> jnp.ndarray:
    """Inference: sigmoid of each detection's own-class mask channel
    (torchvision ``maskrcnn_inference``). Returns [K, P, P] float32."""
    cls = jnp.maximum(labels.astype(jnp.int32), 0)
    logit = jnp.take_along_axis(
        mask_logits, cls[:, None, None, None], axis=1
    )[:, 0]
    return jax.nn.sigmoid(logit.astype(jnp.float32))
