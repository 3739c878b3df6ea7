"""Configuration schema for layoutdit_tpu.

Field-for-field parity with the reference pydantic tree
(/root/reference/src/layoutdit/configuration/config_constructs.py:24-83 and
model_config.py:6-13), extended with TPU-native knobs: mesh/sharding layout,
bf16 precision policy, and the static shape budgets that make the two-stage
detector jittable (padded GT boxes, fixed proposal counts).

Deliberate divergences from the reference (SURVEY.md §7 "quirks"):
  * ``local_mode`` is functional — it reroutes data paths to local sample
    files instead of GCS (the reference parses but never reads it,
    main.py:14-25).
  * ``score_thresh`` is actually applied by the evaluator (the reference
    stores but never uses it, evaluator.py:43).
"""

from __future__ import annotations

import enum
from typing import Optional

from pydantic import BaseModel, Field


class BackboneType(str, enum.Enum):
    """Backbone selector (reference: modeling/backbone_type.py:4-6)."""

    DIT = "dit"
    DIT_LARGE = "dit-large"
    RESNET50 = "resnet50"


def get_available_device() -> str:
    """Best available JAX platform ('tpu' > 'gpu' > 'cpu').

    TPU-native analogue of the reference's cuda→mps→cpu probe
    (config_constructs.py:12-21). NOTE: initialises the XLA backend —
    never call before ``maybe_distributed_init`` (multi-host bring-up
    would silently degrade); config fields therefore default to "auto"
    and resolve on demand via ``resolve_device``.
    """
    import jax

    try:
        return jax.default_backend()
    except RuntimeError:
        return "cpu"


def resolve_device(device: str) -> str:
    """Map the 'auto' config default to the probed platform."""
    return get_available_device() if device == "auto" else device


class DataLoaderConfig(BaseModel):
    """Host input-pipeline settings (reference: config_constructs.py:24-27)."""

    batch_size: int = 16
    shuffle: bool = True
    num_workers: int = 2
    # TPU additions: number of device batches to keep in flight.
    prefetch_depth: int = 2
    # Per-image padded ground-truth budget (static shapes for jit).
    max_gt_boxes: int = 128
    # Probability of horizontally flipping each TRAINING example (image +
    # boxes, host-side, shape-preserving; 0 = off, reference parity — its
    # pipeline has no augmentation, publay_dataset.py:44-74). Applied
    # deterministically from (seed, epoch, example index), so runs
    # reproduce regardless of worker count. Eval is never augmented.
    augment_hflip: float = 0.0
    # When set, TRAIN image reads come from tar shards built by
    # tools/make_shards.py (ranged reads into large sequential objects
    # instead of one GCS object per page — data/shards.py). Annotations
    # still come from the configured JSON; eval reads stay per-file
    # (the eval split is small).
    image_shards_dir: Optional[str] = None


class MeshConfig(BaseModel):
    """Device-mesh / sharding layout (new capability: the reference's
    distributed-training TODO, README.md:59, realised as jit+shard_map DP)."""

    # Axis sizes; -1 on the data axis means "all remaining devices".
    data_parallel: int = -1
    model_parallel: int = 1
    axis_names: tuple[str, str] = ("data", "model")
    # Sequence parallelism: shard the encoder's [B, N, D] residual stream
    # over the model axis (Megatron-SP schedule derived by XLA from this
    # constraint + the TP param shardings). Only meaningful when
    # model_parallel > 1; numerics-neutral. Forces the XLA attention path.
    sequence_parallel: bool = False
    # Pipeline parallelism: split the encoder's layer stack into this many
    # GPipe stages over a third mesh axis ('pipe'); layers%stages must be 0
    # and the per-data-shard batch must divide into pipeline_microbatches
    # (bubble fraction = (S-1)/(M+S-1)). Numerics-identical to the
    # sequential loop (tests/test_pipeline.py). Forces the XLA attention
    # path inside the stage program.
    pipeline_parallel: int = 1
    pipeline_microbatches: int = 4
    # Fully-sharded data parallelism (ZeRO-3 style): parameters, gradients
    # and optimizer state shard their largest divisible dim over the DATA
    # axis at rest; GSPMD all-gathers weights at use sites and
    # reduce-scatters gradients back to the shards. Cuts per-chip
    # param+optimizer memory by the dp degree (the lever for dit-large+
    # when TP is not wanted); numerics-neutral (tests/test_fsdp.py).
    # Composes with tensor parallelism (TP dims take precedence).
    fsdp: bool = False
    # Hybrid ICI x DCN layout (multi-slice TPU pods / multi-host CPU):
    # number of DCN granules (TPU slices when the runtime exposes
    # slice_index, else host processes) the DATA axis spans. The granule
    # dim is placed OUTERMOST on the data axis so model/pipe axes and the
    # inner data shards stay inside one granule's ICI — only the
    # once-per-step gradient all-reduce crosses the slow DCN links
    # (scaling-book layout rule). 1 = flat single-granule mesh (default).
    dcn_data_parallel: int = 1
    # Initialise jax.distributed (multi-host) when world size > 1.
    enable_distributed_init: bool = False
    # Explicit coordination (multi-host); None -> jax env-var / TPU-pod
    # autodetection inside jax.distributed.initialize().
    coordinator_address: str | None = None
    num_processes: int | None = None
    process_id: int | None = None
    # Coordination-service timeouts (None -> jax defaults: heartbeat
    # 100 s, shutdown barrier 300 s). Raise on hosts where a peer can
    # legitimately stall — e.g. oversubscribed CPU CI, where one worker
    # may sit compiling long past the other's shutdown barrier; too-low
    # values kill an otherwise healthy run with a BarrierError.
    heartbeat_timeout_s: int | None = None
    shutdown_timeout_s: int | None = None


class PrecisionConfig(BaseModel):
    """bf16 mixed-precision policy (replaces the reference's fp16 AMP +
    GradScaler, trainer.py:78-80 — bf16 on TPU needs no loss scaling)."""

    compute_dtype: str = "bfloat16"
    param_dtype: str = "float32"
    # Softmax/statistics accumulate in fp32 regardless.


class TrainingConfig(BaseModel):
    """Reference: config_constructs.py:30-44 (same hyper-param defaults)."""

    train_base_path: str = "gs://layoutdit/data"
    train_input: str = "single"

    device: str = "auto"  # resolved lazily via resolve_device()
    num_epochs: int = 25
    learning_rate: float = 1e-4
    weight_decay: float = 0.0
    step_size: int = 10
    gamma: float = 0.1
    checkpoint_interval: int = 10
    # Write periodic checkpoints from a background thread (serialization
    # + storage write overlap the next epoch; the device->host snapshot
    # is still synchronous). train() barriers on the in-flight write
    # before returning, and the preemption save is always synchronous.
    # Applies to the msgpack path; sharded orbax saves stay synchronous.
    async_checkpoint: bool = True
    # Retention: keep only the newest N periodic epoch checkpoints
    # (0 = keep all, reference behavior — ~1 GB per save at dit-base).
    # best.* and *_preempt saves are never pruned.
    keep_checkpoints: int = 0

    enable_profile: bool = False
    # Where jax.profiler traces are staged locally before GCS upload.
    trace_log_dir: str = "./log/traces"

    # Write per-epoch scalars (loss, img/s, lr, mid-eval mAP) as
    # TensorBoard event files to {run}/tb — stdlib encoder, works on
    # gs:// (utils/tensorboard.py). The reference has no TB integration.
    tensorboard: bool = True

    seed: int = 0
    # Gradient clipping (0 disables); reference has none.
    grad_clip_norm: float = 0.0
    # When the model carries LoRA adapters (ModelConfig.lora_rank > 0),
    # freeze the non-adapter encoder weights: their updates are zeroed
    # and they get NO optimizer moments (optax.masked). False trains
    # everything end to end with adapters still present (rarely wanted;
    # for ablations).
    lora_freeze_base: bool = True
    # Storage dtype for Adam's first moment (optax mu_dtype). "bfloat16"
    # halves mu's HBM footprint and per-step read+write traffic (~0.7 GB
    # at dit-base's 86 M params) at the cost of moment precision — the
    # update math still runs in fp32 (optax casts mu up inside the
    # update). Default "float32" matches the reference's torch AdamW
    # (trainer.py:64-68). The second moment (nu) stays fp32 either way:
    # bf16's 8-bit mantissa is too coarse for v_hat under sqrt.
    adam_mu_dtype: str = "float32"
    # Skip optimizer updates whose gradients contain non-finite values
    # (a corrupt batch, a bf16 overflow spike): params/moments stay
    # untouched for up to N CONSECUTIVE bad steps, then the NaNs flow
    # through and fail loudly (a persistently diverged run must not
    # freewheel forever). 0 = off — matching the reference, where one
    # NaN batch silently poisons the weights (trainer.py:119-125 steps
    # unconditionally). Note: turning this on wraps the optimizer state
    # (optax.apply_if_finite), so checkpoints are not interchangeable
    # with runs that have it off.
    skip_nonfinite_updates: int = 0
    # Batches executed per device dispatch (lax.scan inside one jit call).
    # >1 amortizes host->device dispatch latency — it matters ONLY on
    # remote/tunneled backends where each call costs a round trip. The
    # measured basis (scripts/sweep_dispatch.py, PERF_STAGES.md): behind
    # the axon tunnel (~30-50 ms/dispatch) S=4 is +16% steady-state vs
    # S=1; on a local backend (~0.1 ms dispatch) batching dispatches buys
    # nothing and costs host-side super-batch assembly. Default 0 = AUTO:
    # the trainer probes dispatch latency once at startup and picks S=4
    # when a round trip costs >= 1 ms, else S=1 (VERDICT r3 item 8).
    # Epoch remainders still run the plain single-step path.
    steps_per_dispatch: int = 0

    # Gradient accumulation: split each global batch into this many
    # micro-batches inside the jitted step, average their gradients, and
    # apply ONE optimizer update (torch-DDP accumulation semantics: the
    # per-micro-batch losses are each normalized over their own sampled
    # anchors/RoIs, then averaged). Lets batch_size exceed what fits in
    # HBM — the companion to ModelConfig.remat for high-res training.
    # Constraint: (batch_size / grad_accumulation_steps) must still
    # divide over the data-parallel mesh axis.
    grad_accumulation_steps: int = 1

    # Evaluate every N epochs during training (0 = off, reference parity
    # — it evaluates once, after training). Each eval runs the full COCO
    # scorer on the eval split, records mAP in metrics.jsonl, and keeps
    # a rolling best-mAP checkpoint at model_checkpoints/best.*. With
    # EMA enabled the EMA weights are what gets evaluated (and saved as
    # the best checkpoint's params — the deployable weights).
    eval_interval: int = 0
    # Stop training after this many consecutive mid-evals without a new
    # best mAP (requires eval_interval > 0; 0 disables). The rolling
    # best.* checkpoint already holds the winning weights, so the tail
    # epochs a fixed num_epochs would waste are pure savings. Multi-host
    # safe: eval metrics are replicated across hosts (DP eval), so every
    # host reaches the same stop decision.
    early_stop_patience: int = 0

    # LR schedule family: "step" = the reference's StepLR (step_size /
    # gamma above); "cosine" = half-cosine decay to 0 over the run.
    lr_schedule: str = "step"
    # Linear LR warmup over the first N optimizer updates (0 = off,
    # reference parity). Composes with either schedule.
    warmup_steps: int = 0

    # Exponential moving average of the parameters (0 = off). When set
    # (e.g. 0.999), the jitted step also maintains ema = d*ema +
    # (1-d)*params (seeded from the initial params, no debiasing —
    # torch ModelEmaV2 semantics); the EMA weights ride checkpoints and
    # are swapped in for evaluation. Standard detection fine-tuning
    # stabilizer absent in the reference (its trainer.py:62-80 has only
    # AdamW+StepLR).
    ema_decay: float = 0.0


class EvalConfig(BaseModel):
    """Reference: config_constructs.py:47-59."""

    eval_input: str = "samples"

    device: str = "auto"  # resolved lazily via resolve_device()
    score_thresh: float = 0.0

    eval_base_path: Optional[str] = "gs://layoutdit"

    max_per_image: int = 10
    visualize_dirpath_prefix: str = "visualizations"
    num_images: Optional[int] = 20
    # extend the 12 COCO summary stats with AP-{class}/AP50-{class}
    # (the per-class breakdown PubLayNet results are reported with;
    # not surfaced by the reference's evaluator.py:71-77)
    per_category_metrics: bool = True
    # when the model carries a Mask R-CNN head (with_mask): also paste
    # per-detection masks and report the 12 segm-IoU metrics as
    # segm_mAP/segm_AP50/... alongside the bbox set
    segm_metrics: bool = True


class DetectionBudget(BaseModel):
    """Static-shape budgets for the jittable two-stage detector.

    The reference relies on torchvision's dynamic shapes (variable proposal
    and detection counts). On TPU everything under jit must be shape-static,
    so each stage has an explicit padded budget with validity masks
    (SURVEY.md §7 hard part #1). Values mirror torchvision FasterRCNN
    defaults so detections match the reference numerically.
    """

    rpn_pre_nms_top_n_train: int = 2000
    rpn_pre_nms_top_n_test: int = 1000
    rpn_post_nms_top_n_train: int = 2000
    rpn_post_nms_top_n_test: int = 1000
    rpn_nms_thresh: float = 0.7
    rpn_fg_iou_thresh: float = 0.7
    rpn_bg_iou_thresh: float = 0.3
    rpn_batch_size_per_image: int = 256
    rpn_positive_fraction: float = 0.5
    rpn_score_thresh: float = 0.0
    rpn_min_size: float = 1e-3
    # NMS tile (perf knob, numerics-neutral): boxes are processed in
    # score-sorted tiles of this size; larger tiles = fewer sequential
    # device steps, bigger per-tile fixpoint problems. 512 is the measured
    # best on the bs16 train step (v5e): 362.9 -> 369.4 img/s vs 256
    # (PERF_STAGES.md) — the default matches the published headline.
    rpn_nms_tile: int = 512

    box_fg_iou_thresh: float = 0.5
    box_bg_iou_thresh: float = 0.5
    box_batch_size_per_image: int = 512
    box_positive_fraction: float = 0.25
    box_reg_weights: tuple[float, float, float, float] = (10.0, 10.0, 5.0, 5.0)
    box_score_thresh: float = 0.05
    box_nms_thresh: float = 0.5
    box_detections_per_img: int = 100
    # Second-stage (per-class) NMS tile — independent of rpn_nms_tile so
    # the two stages can be tuned/documented separately (numerics-neutral;
    # 512 measured best for the inference postprocess too, bench_infer.py).
    box_nms_tile: int = 512

    # ---- RetinaNet family (ModelConfig.detector="retinanet"); values are
    # torchvision models.detection.retinanet defaults. The rpn_*/box_*
    # fields above are ignored by the single-stage path.
    retinanet_fg_iou_thresh: float = 0.5
    retinanet_bg_iou_thresh: float = 0.4
    retinanet_score_thresh: float = 0.05
    retinanet_nms_thresh: float = 0.5
    retinanet_detections_per_img: int = 300
    # Per-level candidate cap before cross-level NMS.
    retinanet_topk_candidates: int = 1000

    # ---- FCOS family (ModelConfig.detector="fcos"); torchvision
    # models.detection.fcos defaults.
    fcos_score_thresh: float = 0.2
    fcos_nms_thresh: float = 0.6
    fcos_detections_per_img: int = 100
    fcos_topk_candidates: int = 1000
    # Cells match a gt only within radius x cell-stride of its center.
    fcos_center_sampling_radius: float = 1.5

    # ---- DETR family (ModelConfig.detector="detr"). Every query is a
    # detection (no NMS); this threshold only gates the valid mask.
    detr_score_thresh: float = 0.0


class ModelConfig(BaseModel):
    """Reference: configuration/model_config.py:6-13 (same defaults) plus
    the TPU detection budgets and backbone details."""

    backbone_type: BackboneType = BackboneType.DIT

    num_classes: int = 5

    anchor_sizes: list[tuple[int, ...]] = [(32,), (64,), (128,), (256,), (512,)]
    aspect_ratios: list[tuple[float, ...]] = [(0.5, 1.0, 2.0)] * 5

    # GeneralizedRCNNTransform parity (reference: model.py:50-54).
    image_size: int = 224
    image_mean: tuple[float, float, float] = (0.5, 0.5, 0.5)
    image_std: tuple[float, float, float] = (0.5, 0.5, 0.5)

    fpn_out_channels: int = 256
    roi_output_size: int = 7
    roi_sampling_ratio: int = 2

    detection_budget: DetectionBudget = DetectionBudget()

    # Attention implementation: "auto" (measured per-shape crossover:
    # XLA einsum below ~2k tokens, Pallas flash kernel from ~2k tokens),
    # force "xla" / "pallas" / "short" (single-block fused kernel —
    # measured SLOWER than XLA at N=197, kept opt-in; ATTENTION_BENCH.md),
    # or "ring" (exact sequence-sharded context parallelism over the SP
    # token axis — requires mesh_config.sequence_parallel;
    # ops/ring_attention.py).
    attention_impl: str = "auto"
    # RoI pooler: "xla" or "pallas" (fused VMEM kernel).
    roi_impl: str = "xla"

    # Cascade R-CNN head (BASELINE config #3): per-stage foreground IoU
    # thresholds, e.g. [0.5, 0.6, 0.7] — each stage gets its own
    # TwoMLPHead + class-agnostic predictor and refines the previous
    # stage's boxes. Empty = plain Faster R-CNN (reference parity).
    cascade_iou_threshs: list[float] = []

    # Detector family: "faster_rcnn" (reference parity, incl. the cascade
    # and mask modifiers above/below), "retinanet" — a single-stage
    # torchvision-RetinaNet-semantics head over the shared pyramid
    # (models/detection/retinanet.py), or "fcos" — the anchor-free
    # single-stage head (models/detection/fcos.py). Single-stage is the
    # TPU-friendly shape: no proposal filtering, no RoI pooling, no
    # sampling.
    detector: str = "faster_rcnn"
    # Pyramid levels the RetinaNet head runs on (indices into
    # p2..p5+pool = strides 4, 8, 16, 32, 64 at 224 px). The default
    # (1, 2, 3, 4) = strides 8..64 mirrors torchvision's P3..P7 range;
    # anchor_sizes/aspect_ratios rows are selected by the same indices.
    retinanet_levels: list[int] = [1, 2, 3, 4]
    # Pyramid levels for the FCOS head (reference points are stride-sized
    # squares; anchor_sizes/aspect_ratios are NOT consulted).
    fcos_levels: list[int] = [1, 2, 3, 4]

    # ---- DETR (detector="detr"): set prediction over learned queries —
    # no anchors, no NMS, everything statically shaped by construction
    # (models/detection/detr.py). Defaults follow facebookresearch/detr.
    detr_num_queries: int = 100
    detr_layers: int = 6
    detr_dim: int = 256
    detr_heads: int = 8
    detr_ffn_dim: int = 2048
    # Background ("no object") class weight in the CE loss.
    detr_eos_coef: float = 0.1
    # Per-decoder-layer auxiliary losses (DETR trains with these on).
    detr_aux_loss: bool = True
    # Matcher-latency mitigation: solve the Hungarian assignment on the
    # final decoder layer only and share it with every aux loss (1/L the
    # serial-depth-bound solve work). Off = paper-exact per-layer
    # matching; quality cost measured in docs/convergence.md.
    detr_shared_matching: bool = False
    # Pyramid level the decoder cross-attends to (2 = stride 16).
    detr_level: int = 2

    # ---- LoRA (models/lora.py, beyond-reference): freeze the pretrained
    # encoder and train rank-r adapters on the side — the fresh detection
    # stack (FPN/heads) stays fully trainable. Optimizer moments shrink
    # from O(encoder) to O(adapters+heads) (optax.masked). 0 = off
    # (full fine-tune, reference parity). Serve/export via
    # tools/merge_lora (folds W += alpha/r * A@B, zero inference cost).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    # Projections to adapt, from {q, k, v, attn_out, mlp_in, mlp_out};
    # the paper's default adapts attention q/v only.
    lora_targets: list[str] = ["q", "v"]

    # ---- Windowed attention (models/vit.py, ViTDet-style,
    # beyond-reference): restrict non-global encoder layers to
    # window_size x window_size patch windows. The high-res lever on
    # top of flash attention: at a 64x64 grid (1024 px) a 16-patch
    # window cuts score FLOPs ~16x per windowed layer, and 256-token
    # windows tile the MXU exactly. 0 = off (reference parity; also a
    # no-op whenever the window covers the whole grid, so a
    # window_size=16 config still runs 224 px eval bit-identically).
    window_size: int = 0
    # 1-based encoder layers that keep FULL attention for cross-window
    # mixing; empty = the backbone tap layers [d/3, d/2, 2d/3, d].
    window_global_layers: list[int] = []

    # Mask R-CNN branch (beyond-reference): train a 28x28 per-class mask
    # head on PubLayNet's segmentation polygons and return per-detection
    # masks at inference. Requires the data pipeline's mask path
    # (DataLoaderConfig.load_masks follows this automatically).
    with_mask: bool = False

    # Rematerialize encoder layers in the backward pass (jax.checkpoint):
    # trades ~1/3 extra encoder FLOPs for O(layers) -> O(1) activation
    # memory — the standard lever for high-res training (4k+ tokens)
    # on a fixed-HBM chip.
    remat: bool = False
    # What the backward recomputes when remat is on: "full" saves only
    # block boundaries (max memory win, ~22% slower at 1024 px), "dots"
    # saves the projection GEMM outputs and recomputes only the cheap
    # VPU work + attention einsums (most of the memory win at near-zero
    # MXU cost). Measured on-chip in PERF_STAGES.md.
    remat_policy: str = "full"

    # Optional ViT architecture overrides (hidden_size, num_hidden_layers,
    # ...) applied on top of the backbone preset — used for scaled-down
    # e2e tests and custom model families.
    vit_overrides: Optional[dict] = None

    # Optional warm-start checkpoint for the DiT encoder
    # (reference: model.py:65-70 — loads only backbone weights).
    previous_layout_dit_checkpoint: Optional[str] = None


class LayoutDitConfig(BaseModel):
    """Top-level config (reference: config_constructs.py:62-83)."""

    train_config: TrainingConfig = TrainingConfig()
    data_loader_config: DataLoaderConfig = DataLoaderConfig()
    eval_config: EvalConfig = EvalConfig()
    detection_model_config: ModelConfig = ModelConfig()

    mesh_config: MeshConfig = MeshConfig()
    precision: PrecisionConfig = PrecisionConfig()

    run_name: str = "test"

    # Functional here (unlike the reference): route data paths to local
    # sample files instead of GCS.
    local_mode: bool | None = None

    def __init__(self, **data):
        super().__init__(**data)
        from layoutdit_tpu.log import get_logger

        get_logger(__name__).debug(
            "Initialized LayoutDitConfig with:\n%s", self.model_dump_json(indent=2)
        )
