"""LayoutDetectionModel, TPU-native: DiT/BEiT backbone + FPN + Faster R-CNN.

Functional parity with the reference's assembly (model.py:20-88):
``GeneralizedRCNNTransform(224, mean/std 0.5)`` -> DiTWithFPN -> RPN ->
MultiScaleRoIAlign(7, sampling_ratio 2) over [p2, p3, p4, p5, pool] ->
TwoMLPHead -> FastRCNNPredictor, with the four torchvision losses during
training and padded top-100 detections at inference.

The public surface is two pure functions over one parameter pytree:
  * ``detector_loss(params, rng, images, gt) -> loss dict``  (jit/grad-able)
  * ``detector_predict(params, images) -> Detections``       (jit-able)
Images arrive as [B, 3, 224, 224] float32 in [0, 1] (host pipeline already
resized); normalization happens on-device. Boxes live in 224x224 space;
rescaling back to original image sizes is ``rescale_detections``.
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from layoutdit_tpu.config.constructs import DetectionBudget, ModelConfig
from layoutdit_tpu.models import vit as vit_mod
from layoutdit_tpu.models.backbone import (
    BackboneConfig,
    backbone_forward,
    init_backbone_params,
)
from layoutdit_tpu.models.detection import rpn as rpn_mod
from layoutdit_tpu.models.detection.anchors import grid_anchors
from layoutdit_tpu.models.detection.heads import (
    box_head_forward,
    init_box_head_params,
    init_predictor_params,
    init_rpn_head_params,
    predictor_forward,
    rpn_head_forward,
)
from layoutdit_tpu.models.detection.roi_heads import (
    Detections,
    fastrcnn_loss,
    postprocess_detections_single,
    select_training_samples_single,
)
from layoutdit_tpu.ops.roi_align import multiscale_roi_align


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static (hashable) model description derived from the pydantic
    ModelConfig — this is what jit closes over."""

    backbone: BackboneConfig = BackboneConfig()
    num_classes: int = 5
    image_size: int = 224
    image_mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: tuple[float, float, float] = (0.5, 0.5, 0.5)
    anchor_sizes: tuple[tuple[float, ...], ...] = ((32,), (64,), (128,), (256,), (512,))
    aspect_ratios: tuple[tuple[float, ...], ...] = ((0.5, 1.0, 2.0),) * 5
    roi_output_size: int = 7
    roi_sampling_ratio: int = 2
    budget: DetectionBudget = dataclasses.field(default_factory=DetectionBudget)
    compute_dtype: str = "float32"
    attention_impl: str = "auto"
    remat: bool = False
    remat_policy: str = "full"  # "full" | "dots" — see vit_forward
    # "dit" (ViT pyramid, reference model.py:57-70) or "resnet50"
    # (reference :72-84). The resnet path pools RoIs from 4 levels
    # (featmap_names "0".."3", no pool level) as torchvision does.
    backbone_kind: str = "dit"
    # RoI pooler implementation: "xla" or "pallas" (fused VMEM kernel).
    roi_impl: str = "xla"
    # Cascade R-CNN head (BASELINE config #3): per-stage foreground IoU
    # thresholds, e.g. (0.5, 0.6, 0.7). Empty = plain Faster R-CNN head.
    cascade_iou_threshs: tuple[float, ...] = ()
    # Per-stage loss weights; () -> cascade.DEFAULT_STAGE_LOSS_WEIGHTS
    # truncated to the stage count.
    cascade_stage_loss_weights: tuple[float, ...] = ()
    # Mask R-CNN branch (beyond-reference; models/detection/mask_head.py):
    # adds a loss_mask term in training (requires gt_masks) and per-
    # detection mask probabilities at inference via
    # detector_predict(..., with_masks=True).
    with_mask: bool = False
    # RoI pool size feeding the mask head (masks come out at 2x this).
    mask_roi_output_size: int = 14
    # GT bitmask block side M ([B, G, M, M] ships to device); 0 = auto
    # (image_size // 2).
    mask_gt_size: int = 0
    # Detector family: "faster_rcnn" (two-stage, reference parity),
    # "retinanet" (single-stage; models/detection/retinanet.py),
    # "fcos" (anchor-free single-stage; models/detection/fcos.py), or
    # "detr" (NMS-free set prediction; models/detection/detr.py).
    detector_kind: str = "faster_rcnn"
    # Pyramid-level indices (into p2..p5+pool) the RetinaNet head runs on;
    # anchor_sizes/aspect_ratios rows are selected by the same indices.
    retinanet_levels: tuple[int, ...] = (1, 2, 3, 4)
    # Pyramid-level indices for the FCOS head (stride-sized square
    # reference points; anchor config not consulted).
    fcos_levels: tuple[int, ...] = (1, 2, 3, 4)
    # DETR decoder hyper-parameters (facebookresearch/detr defaults).
    detr_num_queries: int = 100
    detr_layers: int = 6
    detr_dim: int = 256
    detr_heads: int = 8
    detr_ffn_dim: int = 2048
    detr_eos_coef: float = 0.1
    detr_aux_loss: bool = True
    detr_level: int = 2
    # Solve the Hungarian match on the final decoder layer only and share
    # the assignment with every aux loss (matcher-latency mitigation;
    # quality cost measured in docs/convergence.md).
    detr_shared_matching: bool = False

    def __post_init__(self):
        object.__setattr__(self, "budget", _freeze_budget(self.budget))
        self.__post_init_validate__()

    @property
    def num_anchors_per_cell(self) -> int:
        return len(self.anchor_sizes[0]) * len(self.aspect_ratios[0])

    @property
    def gt_mask_size(self) -> int:
        return self.mask_gt_size or self.image_size // 2

    @property
    def grid_sizes(self) -> tuple[tuple[int, int], ...]:
        g = self.image_size // self.backbone.vit.patch_size
        sizes = [int(g * s) for s in self.backbone.scales]
        sizes.append((sizes[-1] + 1) // 2)  # pool level: ceil(p5/2)
        return tuple((s, s) for s in sizes)

    @property
    def dtype(self):
        return jnp.dtype(self.compute_dtype)

    @property
    def cascade_reg_weights(self) -> tuple[tuple[float, float, float, float], ...]:
        """Per-stage BoxCoder weights: paper defaults for the first three
        stages, the last set repeated beyond that."""
        from layoutdit_tpu.models.detection import cascade as cascade_mod

        d = cascade_mod.DEFAULT_STAGE_REG_WEIGHTS
        return tuple(
            d[min(i, len(d) - 1)] for i in range(len(self.cascade_iou_threshs))
        )

    @property
    def cascade_loss_weights(self) -> tuple[float, ...]:
        if self.cascade_stage_loss_weights:
            return self.cascade_stage_loss_weights
        from layoutdit_tpu.models.detection import cascade as cascade_mod

        d = cascade_mod.DEFAULT_STAGE_LOSS_WEIGHTS
        return tuple(
            d[min(i, len(d) - 1)] for i in range(len(self.cascade_iou_threshs))
        )

    @classmethod
    def from_model_config(cls, mc: ModelConfig, precision_dtype: str = "float32"):
        from layoutdit_tpu.config.constructs import BackboneType

        vit_cfg = (
            vit_mod.DIT_LARGE
            if mc.backbone_type == BackboneType.DIT_LARGE
            else vit_mod.DIT_BASE
        )
        if mc.vit_overrides:
            ov_size = mc.vit_overrides.get("image_size")
            if ov_size is not None and ov_size != mc.image_size:
                # a split-brain config (transform/anchors at one size,
                # encoder grid at another) fails deep inside the first
                # trace — reject it loudly here instead
                raise ValueError(
                    f"vit_overrides.image_size={ov_size} conflicts with "
                    f"detection_model_config.image_size={mc.image_size}"
                )
            overrides = {"image_size": mc.image_size, **mc.vit_overrides}
            for k in ("global_attn_layers", "lora_targets"):
                # JSON configs carry lists; ViTConfig stays hashable
                if k in overrides:
                    overrides[k] = tuple(overrides[k])
            vit_cfg = dataclasses.replace(vit_cfg, **overrides)
        elif mc.image_size != vit_cfg.image_size:
            vit_cfg = dataclasses.replace(vit_cfg, image_size=mc.image_size)
        if mc.window_size > 0:
            vit_cfg = dataclasses.replace(
                vit_cfg,
                window_size=mc.window_size,
                global_attn_layers=tuple(mc.window_global_layers),
            )
        if mc.lora_rank > 0:
            if mc.backbone_type == BackboneType.RESNET50:
                raise ValueError(
                    "lora_rank targets the pretrained DiT/BEiT encoder; "
                    "the resnet50 backbone has no LoRA support"
                )
            vit_cfg = dataclasses.replace(
                vit_cfg,
                lora_rank=mc.lora_rank,
                lora_alpha=mc.lora_alpha,
                lora_targets=tuple(mc.lora_targets),
            )
        backbone_kind = (
            "resnet50" if mc.backbone_type == BackboneType.RESNET50 else "dit"
        )
        return cls(
            backbone=BackboneConfig(vit=vit_cfg, fpn_out_channels=mc.fpn_out_channels),
            num_classes=mc.num_classes,
            image_size=mc.image_size,
            image_mean=tuple(mc.image_mean),
            image_std=tuple(mc.image_std),
            anchor_sizes=tuple(tuple(float(x) for x in s) for s in mc.anchor_sizes),
            aspect_ratios=tuple(tuple(float(x) for x in r) for r in mc.aspect_ratios),
            roi_output_size=mc.roi_output_size,
            roi_sampling_ratio=mc.roi_sampling_ratio,
            budget=mc.detection_budget,
            compute_dtype=precision_dtype,
            attention_impl=mc.attention_impl,
            roi_impl=mc.roi_impl,
            backbone_kind=backbone_kind,
            cascade_iou_threshs=tuple(mc.cascade_iou_threshs),
            remat=mc.remat,
            remat_policy=mc.remat_policy,
            with_mask=mc.with_mask,
            detector_kind=mc.detector,
            retinanet_levels=tuple(mc.retinanet_levels),
            fcos_levels=tuple(mc.fcos_levels),
            detr_num_queries=mc.detr_num_queries,
            detr_layers=mc.detr_layers,
            detr_dim=mc.detr_dim,
            detr_heads=mc.detr_heads,
            detr_ffn_dim=mc.detr_ffn_dim,
            detr_eos_coef=mc.detr_eos_coef,
            detr_aux_loss=mc.detr_aux_loss,
            detr_level=mc.detr_level,
            detr_shared_matching=mc.detr_shared_matching,
        )

    def __post_init_validate__(self):  # called from __post_init__
        kinds = ("faster_rcnn", "retinanet", "fcos", "detr")
        if self.detector_kind not in kinds:
            raise ValueError(f"unknown detector_kind {self.detector_kind!r}")
        if self.detector_kind != "faster_rcnn":
            if self.cascade_iou_threshs:
                raise ValueError(
                    "cascade_iou_threshs is a Faster R-CNN modifier; "
                    f"detector={self.detector_kind!r} has no cascade variant"
                )
            if self.with_mask:
                raise ValueError(
                    "with_mask requires the RoI pipeline; "
                    f"detector={self.detector_kind!r} has no mask branch"
                )
        n_levels = len(self.grid_sizes)
        if self.detector_kind in ("retinanet", "fcos"):
            levels = (
                self.retinanet_levels
                if self.detector_kind == "retinanet"
                else self.fcos_levels
            )
            bad = [i for i in levels if not 0 <= i < n_levels]
            if bad or not levels:
                raise ValueError(
                    f"{self.detector_kind}_levels {levels} out of range "
                    f"for the {n_levels}-level pyramid"
                )
        if self.detector_kind == "detr":
            if not 0 <= self.detr_level < n_levels:
                raise ValueError(
                    f"detr_level {self.detr_level} out of range for the "
                    f"{n_levels}-level pyramid"
                )
            if self.detr_dim % self.detr_heads:
                raise ValueError("detr_dim must divide by detr_heads")


class _FrozenBudget(DetectionBudget):
    """Hashable DetectionBudget so DetectorConfig works as a jit static."""

    model_config = {"frozen": True}


def _freeze_budget(b: DetectionBudget) -> "_FrozenBudget":
    return _FrozenBudget(**b.model_dump()) if not isinstance(b, _FrozenBudget) else b


def init_detector_params(key: jax.Array, cfg: DetectorConfig) -> dict:
    k_bb, k_rpn, k_head, k_pred = jax.random.split(key, 4)
    rep = 1024
    in_features = cfg.backbone.fpn_out_channels * cfg.roi_output_size**2
    if cfg.backbone_kind == "resnet50":
        from layoutdit_tpu.models.resnet import init_resnet_fpn_params

        bb_params = init_resnet_fpn_params(k_bb, cfg.backbone.fpn_out_channels)
    else:
        bb_params = init_backbone_params(k_bb, cfg.backbone)
    pooled_shape = (
        cfg.backbone.fpn_out_channels,
        cfg.roi_output_size,
        cfg.roi_output_size,
    )
    if cfg.detector_kind == "retinanet":
        from layoutdit_tpu.models.detection.retinanet import (
            init_retinanet_head_params,
        )

        return {
            "backbone": bb_params,
            "retinanet_head": init_retinanet_head_params(
                k_rpn, cfg.backbone.fpn_out_channels,
                cfg.num_anchors_per_cell, cfg.num_classes + 1,
            ),
        }
    if cfg.detector_kind == "fcos":
        from layoutdit_tpu.models.detection.fcos import init_fcos_head_params

        return {
            "backbone": bb_params,
            "fcos_head": init_fcos_head_params(
                k_rpn, cfg.backbone.fpn_out_channels, cfg.num_classes + 1
            ),
        }
    if cfg.detector_kind == "detr":
        from layoutdit_tpu.models.detection.detr import init_detr_params

        return {
            "backbone": bb_params,
            "detr": init_detr_params(
                k_rpn, cfg.backbone.fpn_out_channels, cfg.num_classes + 1,
                d_model=cfg.detr_dim, num_heads=cfg.detr_heads,
                num_layers=cfg.detr_layers, ffn_dim=cfg.detr_ffn_dim,
                num_queries=cfg.detr_num_queries,
            ),
        }
    params = {
        "backbone": bb_params,
        "rpn_head": init_rpn_head_params(
            k_rpn, cfg.backbone.fpn_out_channels, cfg.num_anchors_per_cell
        ),
    }
    if cfg.cascade_iou_threshs:
        # One TwoMLPHead + class-agnostic predictor per cascade stage.
        stages = {}
        for i in range(len(cfg.cascade_iou_threshs)):
            k_head, k_pred, k_h, k_p = jax.random.split(
                jax.random.fold_in(k_head, i), 4
            )
            stages[f"s{i}"] = {
                "box_head": init_box_head_params(
                    k_h, in_features, rep, pooled_shape=pooled_shape
                ),
                "box_predictor": init_predictor_params(
                    k_p, rep, cfg.num_classes + 1, reg_classes=1
                ),
            }
        params["cascade_heads"] = stages
    else:
        params["box_head"] = init_box_head_params(
            k_head, in_features, rep, pooled_shape=pooled_shape
        )
        params["box_predictor"] = init_predictor_params(
            k_pred, rep, cfg.num_classes + 1
        )
    if cfg.with_mask:
        from layoutdit_tpu.models.detection.mask_head import init_mask_head_params

        # fold_in rather than widening the 4-way split above: existing
        # no-mask configs keep bit-identical initial params
        params["mask_head"] = init_mask_head_params(
            jax.random.fold_in(key, 1001),
            cfg.backbone.fpn_out_channels,
            cfg.num_classes + 1,
        )
    return params


def _normalize(images: jnp.ndarray, cfg: DetectorConfig) -> jnp.ndarray:
    mean = jnp.asarray(cfg.image_mean, jnp.float32)[None, :, None, None]
    std = jnp.asarray(cfg.image_std, jnp.float32)[None, :, None, None]
    return (images - mean) / std


def _anchors(cfg: DetectorConfig) -> tuple[jnp.ndarray, tuple[int, ...]]:
    a, counts = grid_anchors(
        (cfg.image_size, cfg.image_size),
        cfg.grid_sizes,
        cfg.anchor_sizes,
        cfg.aspect_ratios,
    )
    return jnp.asarray(a), counts


def _retinanet_anchors(cfg: DetectorConfig) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """Anchors over the retinanet_levels subset of the pyramid; the
    anchor_sizes/aspect_ratios rows follow the same level indices."""
    lv = cfg.retinanet_levels
    a, counts = grid_anchors(
        (cfg.image_size, cfg.image_size),
        tuple(cfg.grid_sizes[i] for i in lv),
        tuple(cfg.anchor_sizes[i] for i in lv),
        tuple(cfg.aspect_ratios[i] for i in lv),
    )
    return jnp.asarray(a), counts


def _fcos_anchors(cfg: DetectorConfig) -> tuple[jnp.ndarray, tuple[int, ...]]:
    """FCOS reference points: ONE stride-sized square per cell over the
    fcos_levels subset (torchvision FCOS builds its AnchorGenerator with
    sizes == strides, one aspect ratio)."""
    lv = cfg.fcos_levels
    grids = tuple(cfg.grid_sizes[i] for i in lv)
    strides = tuple(float(cfg.image_size // g[0]) for g in grids)
    a, counts = grid_anchors(
        (cfg.image_size, cfg.image_size),
        grids,
        tuple((s,) for s in strides),
        ((1.0,),) * len(lv),
    )
    return jnp.asarray(a), counts


def _run_backbone(params, images, cfg: DetectorConfig, seq_sharding=None,
                  pipeline=None, aux_out: dict | None = None):
    x = _normalize(images, cfg).astype(cfg.dtype)
    if cfg.backbone_kind == "resnet50":
        from layoutdit_tpu.models.resnet import resnet_fpn_forward

        return resnet_fpn_forward(params["backbone"], x, compute_dtype=cfg.dtype)
    return backbone_forward(
        params["backbone"], x, cfg.backbone,
        compute_dtype=cfg.dtype, attention_impl=cfg.attention_impl,
        remat=cfg.remat, remat_policy=cfg.remat_policy,
        seq_sharding=seq_sharding, pipeline=pipeline,
        aux_out=aux_out,
    )


def _run_trunk(params, images, cfg: DetectorConfig, seq_sharding=None,
               pipeline=None, aux_out: dict | None = None):
    feats = _run_backbone(params, images, cfg, seq_sharding, pipeline, aux_out)
    objectness, deltas = rpn_head_forward(
        params["rpn_head"], feats, cfg.num_anchors_per_cell
    )
    return feats, objectness, deltas


def _pool_and_predict(head_params, feats, rois, roi_valid, cfg: DetectorConfig):
    """RoIs [B, K, 4] -> (class_logits [B, K, NC+1], box_deltas).

    head_params: {"box_head": ..., "box_predictor": ...} — the base
    detector's single head or one cascade stage's head.
    """
    scales = cfg.backbone.spatial_scales
    if cfg.backbone_kind == "resnet50":
        # torchvision resnet path pools from "0".."3" only (model.py:84)
        feats = feats[:4]
        scales = scales[:4]

    def single(feats_i, rois_i, valid_i):
        pooled = multiscale_roi_align(
            list(feats_i), rois_i, list(scales),
            output_size=cfg.roi_output_size,
            sampling_ratio=cfg.roi_sampling_ratio,
            canonical_scale=float(cfg.image_size),
            roi_mask=valid_i,
            impl=cfg.roi_impl,
            native_layout=True,  # box head contracts [K, Px, Py, C] directly
        )
        rep = box_head_forward(head_params["box_head"], pooled.astype(cfg.dtype))
        return predictor_forward(head_params["box_predictor"], rep)

    return jax.vmap(single)(tuple(feats), rois, roi_valid)


def _mask_logits(params, feats, rois, roi_valid, cfg: DetectorConfig):
    """Pool mask features at ``rois`` [B, K, 4] and run the mask head:
    -> [B, K, NC+1, 2P, 2P] logits (P = cfg.mask_roi_output_size)."""
    from layoutdit_tpu.models.detection.mask_head import mask_head_forward

    scales = cfg.backbone.spatial_scales
    if cfg.backbone_kind == "resnet50":
        feats = feats[:4]
        scales = scales[:4]

    def single(feats_i, rois_i, valid_i):
        return multiscale_roi_align(
            list(feats_i), rois_i, list(scales),
            output_size=cfg.mask_roi_output_size,
            sampling_ratio=cfg.roi_sampling_ratio,
            canonical_scale=float(cfg.image_size),
            roi_mask=valid_i,
            impl=cfg.roi_impl,
        )  # [K, C, P, P]

    pooled = jax.vmap(single)(tuple(feats), rois, roi_valid)
    b, k = pooled.shape[:2]
    logits = mask_head_forward(
        params["mask_head"],
        pooled.reshape(b * k, *pooled.shape[2:]).astype(cfg.dtype),
    )
    return logits.reshape(b, k, *logits.shape[1:])


def detector_loss(
    params: dict,
    rng: jax.Array,
    images: jnp.ndarray,  # [B, 3, S, S] in [0,1]
    gt_boxes: jnp.ndarray,  # [B, G, 4] xyxy in S-space
    gt_labels: jnp.ndarray,  # [B, G] int 1..NC
    gt_valid: jnp.ndarray,  # [B, G] bool
    cfg: DetectorConfig,
    seq_sharding=None,
    pipeline=None,
    gt_masks: jnp.ndarray | None = None,  # [B, G, M, M] {0,1}, cfg.with_mask
) -> dict[str, jnp.ndarray]:
    """Training forward -> the reference's four-loss dict
    (trainer.py:111-117 consumes the same keys).

    seq_sharding: optional NamedSharding enabling encoder sequence
    parallelism (see vit_forward) — a trace-time value closed over by the
    caller's jit, not a traced argument.
    pipeline: optional parallel.pipeline.PipelineConfig — run the encoder
    as a GPipe pipeline over the mesh's 'pipe' axis (also trace-time)."""
    aux_out: dict = {}
    if cfg.detector_kind == "retinanet":
        from layoutdit_tpu.models.detection import retinanet as retina_mod

        feats = _run_backbone(
            params, images, cfg, seq_sharding, pipeline, aux_out=aux_out
        )
        anchors_r, _ = _retinanet_anchors(cfg)
        cls_logits, box_deltas = retina_mod.retinanet_head_forward(
            params["retinanet_head"],
            [feats[i] for i in cfg.retinanet_levels],
            cfg.num_anchors_per_cell,
        )
        loss_cls, loss_reg = retina_mod.retinanet_loss(
            cls_logits, box_deltas, anchors_r,
            gt_boxes, gt_labels, gt_valid, cfg.budget,
        )
        # torchvision RetinaNet's loss keys, prefixed like the reference's
        return _with_moe_aux(
            {"loss_classification": loss_cls, "loss_bbox_reg": loss_reg},
            aux_out, cfg,
        )
    if cfg.detector_kind == "fcos":
        from layoutdit_tpu.models.detection import fcos as fcos_mod

        feats = _run_backbone(
            params, images, cfg, seq_sharding, pipeline, aux_out=aux_out
        )
        anchors_f, counts_f = _fcos_anchors(cfg)
        cls_logits, ltrb, ctrness = fcos_mod.fcos_head_forward(
            params["fcos_head"], [feats[i] for i in cfg.fcos_levels]
        )
        loss_cls, loss_reg, loss_ctr = fcos_mod.fcos_loss(
            cls_logits, ltrb, ctrness, anchors_f, counts_f,
            gt_boxes, gt_labels, gt_valid, cfg.budget,
        )
        return _with_moe_aux(
            {
                "loss_classification": loss_cls,
                "loss_bbox_reg": loss_reg,
                "loss_bbox_ctrness": loss_ctr,
            },
            aux_out, cfg,
        )
    if cfg.detector_kind == "detr":
        from layoutdit_tpu.models.detection import detr as detr_mod

        if gt_boxes.shape[1] > cfg.detr_num_queries:
            raise ValueError(
                f"max_gt_boxes {gt_boxes.shape[1]} exceeds detr_num_queries "
                f"{cfg.detr_num_queries}: the Hungarian assignment needs a "
                "query per (padded) gt slot"
            )
        feats = _run_backbone(
            params, images, cfg, seq_sharding, pipeline, aux_out=aux_out
        )
        logits, boxes01 = detr_mod.detr_forward(
            params["detr"], feats[cfg.detr_level], cfg.detr_heads,
            return_intermediate=cfg.detr_aux_loss,
        )
        losses = detr_mod.detr_loss(
            logits, boxes01, gt_boxes, gt_labels, gt_valid,
            cfg.image_size, cfg.detr_eos_coef, cfg.detr_aux_loss,
            shared_matching=cfg.detr_shared_matching,
        )
        return _with_moe_aux(losses, aux_out, cfg)
    anchors, counts = _anchors(cfg)
    feats, objectness, deltas = _run_trunk(
        params, images, cfg, seq_sharding, pipeline, aux_out=aux_out
    )

    k_rpn, k_roi = jax.random.split(rng)
    loss_obj, loss_rpn_box = rpn_mod.rpn_loss(
        objectness, deltas, anchors, gt_boxes, gt_valid, cfg.budget, k_rpn
    )

    props = rpn_mod.filter_proposals(
        objectness, deltas, anchors, counts,
        (cfg.image_size, cfg.image_size), cfg.budget, training=True,
    )

    b = images.shape[0]
    roi_keys = jax.random.split(k_roi, b)
    samples = jax.vmap(
        lambda p, v, gb, gl, gv, k: select_training_samples_single(
            p, v, gb, gl, gv, cfg.budget, k
        )
    )(props.boxes, props.valid, gt_boxes, gt_labels, gt_valid, roi_keys)

    if cfg.cascade_iou_threshs:
        loss_cls, loss_box = _cascade_loss(
            params, feats, samples, gt_boxes, gt_labels, gt_valid, cfg
        )
    else:
        class_logits, box_regression = _pool_and_predict(
            _base_head(params), feats, samples.rois, samples.valid, cfg
        )
        loss_cls, loss_box = fastrcnn_loss(class_logits, box_regression, samples)

    losses = {
        "loss_objectness": loss_obj,
        "loss_rpn_box_reg": loss_rpn_box,
        "loss_classifier": loss_cls,
        "loss_box_reg": loss_box,
    }
    if cfg.with_mask:
        if gt_masks is None:
            raise ValueError(
                "cfg.with_mask=True requires gt_masks [B, G, M, M] "
                "(enable the data pipeline's mask path)"
            )
        losses["loss_mask"] = _mask_loss(params, feats, samples, gt_masks, cfg)
    return _with_moe_aux(losses, aux_out, cfg)


def _with_moe_aux(losses: dict, aux_out: dict, cfg: DetectorConfig) -> dict:
    vit_cfg = cfg.backbone.vit
    if cfg.backbone_kind == "dit" and vit_cfg.num_experts > 0:
        # Switch load-balance loss — keeps the token routing uniform so
        # expert-parallel shards stay load-balanced. Extra key on top of
        # the reference's four; the trainer sums the dict either way.
        losses["loss_moe_aux"] = vit_cfg.moe_aux_weight * aux_out["moe_aux"]
    return losses


def _base_head(params: dict) -> dict:
    return {"box_head": params["box_head"], "box_predictor": params["box_predictor"]}


def _mask_loss(params, feats, samples, gt_masks, cfg: DetectorConfig):
    """Mask branch training loss over the POSITIVE sampled slots only
    (torchvision RoIHeads trains masks on positives; the sampler packs
    positives into the first ``max_pos`` slots, so a static slice
    suffices — no dynamic gather)."""
    from layoutdit_tpu.models.detection import mask_head as mh

    budget = cfg.budget
    max_pos = int(budget.box_batch_size_per_image * budget.box_positive_fraction)
    rois = samples.rois[:, :max_pos]
    labels = samples.labels[:, :max_pos]
    matched = samples.matched_gt[:, :max_pos]
    pos_valid = samples.valid[:, :max_pos] & (labels > 0)

    logits = _mask_logits(params, feats, rois, pos_valid, cfg)
    out = 2 * cfg.mask_roi_output_size
    targets = jax.vmap(
        lambda gm, bx, m: mh.project_masks_on_boxes(
            gm, bx, m, cfg.image_size, out
        )
    )(gt_masks, rois, matched)

    b, k = rois.shape[:2]
    return mh.maskrcnn_loss(
        logits.reshape(b * k, *logits.shape[2:]),
        labels.reshape(b * k),
        targets.reshape(b * k, out, out),
        pos_valid.reshape(b * k),
    )


def _cascade_loss(params, feats, samples, gt_boxes, gt_labels, gt_valid, cfg):
    """Stage-weighted cascade losses (aggregated into the reference's
    loss_classifier / loss_box_reg keys so the trainer's sum-of-dict
    contract is unchanged)."""
    from layoutdit_tpu.models.detection import cascade as cascade_mod

    img_size = (cfg.image_size, cfg.image_size)
    boxes, valid = samples.rois, samples.valid
    loss_cls = loss_box = 0.0
    for i, thresh in enumerate(cfg.cascade_iou_threshs):
        w_reg = cfg.cascade_reg_weights[i]
        if i == 0:
            # stage 0 = the sampled set; reg targets re-encoded with the
            # stage weights only if they differ from the budget's.
            labels, reg_targets = samples.labels, samples.reg_targets
            if tuple(cfg.budget.box_reg_weights) != tuple(w_reg):
                relabeled = jax.vmap(
                    lambda bx, v, gb, gl, gv: cascade_mod.match_boxes_to_gt_single(
                        bx, v, gb, gl, gv, thresh, w_reg
                    )
                )(boxes, valid, gt_boxes, gt_labels, gt_valid)
                labels, reg_targets = relabeled.labels, relabeled.reg_targets
        else:
            relabeled = jax.vmap(
                lambda bx, v, gb, gl, gv: cascade_mod.match_boxes_to_gt_single(
                    bx, v, gb, gl, gv, thresh, w_reg
                )
            )(boxes, valid, gt_boxes, gt_labels, gt_valid)
            labels, reg_targets = relabeled.labels, relabeled.reg_targets

        class_logits, box_reg = _pool_and_predict(
            params["cascade_heads"][f"s{i}"], feats, boxes, valid, cfg
        )
        lc, lb = cascade_mod.cascade_stage_loss(
            class_logits, box_reg, labels, reg_targets, valid
        )
        lw = cfg.cascade_loss_weights[i]
        loss_cls = loss_cls + lw * lc
        loss_box = loss_box + lw * lb

        if i + 1 < len(cfg.cascade_iou_threshs):
            # refined boxes feed the next stage, detached (paper §3.4)
            boxes = jax.lax.stop_gradient(
                cascade_mod.refine_boxes(boxes, box_reg, w_reg, img_size)
            )
    return loss_cls, loss_box


def detector_predict(
    params: dict,
    images: jnp.ndarray,  # [B, 3, S, S] in [0,1]
    cfg: DetectorConfig,
    seq_sharding=None,
    pipeline=None,
    with_masks: bool = False,
):
    """Inference -> padded per-image detections (boxes in S-space).

    with_masks (static; requires cfg.with_mask params): ALSO run the
    Mask R-CNN branch at the final detection boxes and return
    ``(Detections, mask_probs [B, D, 2P, 2P] float32)`` — each
    detection's own-class sigmoid mask in box-relative coordinates
    (paste into image space with eval.masks.paste_masks).
    """
    if cfg.detector_kind == "retinanet":
        if with_masks:
            raise ValueError("detector='retinanet' has no mask branch")
        from layoutdit_tpu.models.detection import retinanet as retina_mod

        feats = _run_backbone(params, images, cfg, seq_sharding, pipeline)
        anchors_r, counts_r = _retinanet_anchors(cfg)
        cls_logits, box_deltas = retina_mod.retinanet_head_forward(
            params["retinanet_head"],
            [feats[i] for i in cfg.retinanet_levels],
            cfg.num_anchors_per_cell,
        )
        return jax.vmap(
            lambda cl, dl: retina_mod.retinanet_postprocess_single(
                cl, dl, anchors_r, counts_r,
                (cfg.image_size, cfg.image_size), cfg.budget,
            )
        )(cls_logits, box_deltas)
    if cfg.detector_kind == "fcos":
        if with_masks:
            raise ValueError("detector='fcos' has no mask branch")
        from layoutdit_tpu.models.detection import fcos as fcos_mod

        feats = _run_backbone(params, images, cfg, seq_sharding, pipeline)
        anchors_f, counts_f = _fcos_anchors(cfg)
        cls_logits, ltrb, ctrness = fcos_mod.fcos_head_forward(
            params["fcos_head"], [feats[i] for i in cfg.fcos_levels]
        )
        return jax.vmap(
            lambda cl, dl, ct: fcos_mod.fcos_postprocess_single(
                cl, dl, ct, anchors_f, counts_f,
                (cfg.image_size, cfg.image_size), cfg.budget,
            )
        )(cls_logits, ltrb, ctrness)
    if cfg.detector_kind == "detr":
        if with_masks:
            raise ValueError("detector='detr' has no mask branch")
        from layoutdit_tpu.models.detection import detr as detr_mod

        feats = _run_backbone(params, images, cfg, seq_sharding, pipeline)
        logits, boxes01 = detr_mod.detr_forward(
            params["detr"], feats[cfg.detr_level], cfg.detr_heads,
            return_intermediate=False,
        )
        return detr_mod.detr_postprocess(
            logits[-1], boxes01[-1], cfg.image_size,
            cfg.budget.detr_score_thresh,
        )
    anchors, counts = _anchors(cfg)
    feats, objectness, deltas = _run_trunk(
        params, images, cfg, seq_sharding, pipeline
    )
    props = rpn_mod.filter_proposals(
        objectness, deltas, anchors, counts,
        (cfg.image_size, cfg.image_size), cfg.budget, training=False,
    )
    if cfg.cascade_iou_threshs:
        dets = _cascade_predict(params, feats, props, cfg)
    else:
        class_logits, box_regression = _pool_and_predict(
            _base_head(params), feats, props.boxes, props.valid, cfg
        )
        dets = jax.vmap(
            lambda cl, br, p, v: postprocess_detections_single(
                cl, br, p, v, (cfg.image_size, cfg.image_size), cfg.budget
            )
        )(class_logits, box_regression, props.boxes, props.valid)
    if not with_masks:
        return dets

    from layoutdit_tpu.models.detection import mask_head as mh

    logits = _mask_logits(params, feats, dets.boxes, dets.valid, cfg)
    b, d = logits.shape[:2]
    probs = mh.mask_probs_for_labels(
        logits.reshape(b * d, *logits.shape[2:]),
        dets.labels.reshape(b * d),
    ).reshape(b, d, *logits.shape[-2:])
    probs = jnp.where(dets.valid[..., None, None], probs, 0.0)
    return dets, probs


def _cascade_predict(params, feats, props, cfg: DetectorConfig) -> Detections:
    """Refine boxes through every stage; average the stages' posteriors."""
    from layoutdit_tpu.models.detection import cascade as cascade_mod

    img_size = (cfg.image_size, cfg.image_size)
    boxes, valid = props.boxes, props.valid
    per_stage_logits = []
    for i in range(len(cfg.cascade_iou_threshs)):
        class_logits, box_reg = _pool_and_predict(
            params["cascade_heads"][f"s{i}"], feats, boxes, valid, cfg
        )
        per_stage_logits.append(class_logits)
        boxes = cascade_mod.refine_boxes(
            boxes, box_reg, cfg.cascade_reg_weights[i], img_size
        )
    scores = cascade_mod.cascade_mean_scores(per_stage_logits)
    return jax.vmap(
        lambda s, bx, v: cascade_mod.postprocess_cascade_single(
            s, bx, v, cfg.budget
        )
    )(scores, boxes, valid)


def rescale_detections(dets: Detections, orig_sizes: jnp.ndarray, image_size: int):
    """Map boxes from model space back to original image space
    (torchvision GeneralizedRCNNTransform.postprocess box rescale).

    orig_sizes: [B, 2] (height, width).
    """
    ratio_h = orig_sizes[:, 0:1] / image_size
    ratio_w = orig_sizes[:, 1:2] / image_size
    scale = jnp.stack([ratio_w, ratio_h, ratio_w, ratio_h], axis=-1)  # [B,1,4]
    return dets._replace(boxes=dets.boxes * scale)
