"""Trainer: jitted+sharded train step, epoch loop, checkpoints, artifacts.

Functional parity with /root/reference/src/layoutdit/training/trainer.py:
  * AdamW(lr, weight_decay) + StepLR(step_size, gamma) stepped per epoch
    (:62-76) — expressed as an optax schedule over update counts,
  * per-epoch loop: forward -> sum of the four losses -> update (:148-202;
    the reference's per-batch scheduler/checkpoint indentation bug is
    deliberately NOT reproduced, SURVEY.md §7 quirks),
  * avg-loss logging "Epoch i/N, Loss: x" (:138), checkpoint every
    ``checkpoint_interval`` epochs (:142-146),
  * loss-curve PNG (:217-230) and profiler traces (:83-90, 232-257)
    uploaded via fsspec,
TPU-native execution: one jit-compiled train step with donated
params/optimizer buffers, batch sharded over the mesh's data axis and
parameters replicated (gradient all-reduce is implicit in SPMD), bf16
compute (no GradScaler — bf16 needs no loss scaling, replacing :78-80),
input batches double-buffered by the DetectionLoader.
"""

from __future__ import annotations

import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec

from layoutdit_tpu.config.constructs import LayoutDitConfig, TrainingConfig
from layoutdit_tpu.data.dataset import PubLayNetDataset
from layoutdit_tpu.data.pipeline import DetectionLoader
from layoutdit_tpu.log import get_logger
from layoutdit_tpu.models.detection.detector import detector_loss
from layoutdit_tpu.models.model import LayoutDetectionModel
from layoutdit_tpu.parallel.mesh import (
    batch_sharding,
    build_mesh_for_batch,
    maybe_distributed_init,
    replicated_sharding,
    pipeline_config,
    sequence_sharding,
)

logger = get_logger(__name__)


def resolve_split(config: LayoutDitConfig, train: bool = True) -> tuple[str, str]:
    """(images_root, annotations_json). ``local_mode`` switches training to
    the sample split (making the reference's dead flag functional,
    main.py:14-16 / SURVEY.md §7)."""
    base = config.train_config.train_base_path
    segment = (
        config.eval_config.eval_input
        if (config.local_mode and train)
        else (config.train_config.train_input if train else config.eval_config.eval_input)
    )
    return f"{base}/{segment}/", f"{base}/{segment}.json"


def make_lr_schedule(train_cfg: TrainingConfig, steps_per_epoch: int):
    """Update-count -> learning rate.

    ``step`` (default): StepLR(gamma^(epoch // step_size)) — the
    reference recipe (trainer.py:70-76). ``cosine``: half-cosine decay
    to 0 over the full run. Either composes with ``warmup_steps`` linear
    warmup (0 -> lr over the first N updates) — standard for detection
    fine-tunes, absent in the reference. jnp ops throughout: optax
    evaluates the schedule inside the jitted update."""

    def lr_schedule(count):
        if train_cfg.lr_schedule == "cosine":
            total = max(1, train_cfg.num_epochs * steps_per_epoch)
            t = jnp.minimum(count, total) / total
            base = train_cfg.learning_rate * 0.5 * (1 + jnp.cos(jnp.pi * t))
        else:
            epoch = count // max(1, steps_per_epoch)
            base = train_cfg.learning_rate * (
                train_cfg.gamma ** (epoch // train_cfg.step_size)
            )
        if train_cfg.warmup_steps > 0:
            base = base * jnp.minimum(
                1.0, (count + 1) / train_cfg.warmup_steps
            )
        return base

    return lr_schedule


def make_optimizer(
    train_cfg: TrainingConfig, steps_per_epoch: int, trainable_mask_fn=None,
):
    """AdamW + the configured LR schedule as one optax chain.

    trainable_mask_fn: optional callable(pytree) -> bool pytree (True =
    trainable). When given, frozen leaves get zeroed updates AND no
    optimizer moments (optax.masked wraps AdamW, so frozen leaves hold a
    stateless MaskedNode) — the LoRA recipe's memory win
    (models/lora.py)."""
    mu_dtype = getattr(train_cfg, "adam_mu_dtype", "float32")
    if mu_dtype not in ("float32", "bfloat16"):
        raise ValueError(
            f"adam_mu_dtype must be 'float32' or 'bfloat16', got {mu_dtype!r}"
        )
    tx = optax.adamw(
        learning_rate=make_lr_schedule(train_cfg, steps_per_epoch),
        b1=0.9, b2=0.999, eps=1e-8,
        weight_decay=train_cfg.weight_decay,
        # bf16 mu storage halves the first moment's read+write stream;
        # optax casts back to fp32 inside the update (constructs.py note)
        mu_dtype=jnp.bfloat16 if mu_dtype == "bfloat16" else None,
    )
    if train_cfg.grad_clip_norm > 0:
        tx = optax.chain(optax.clip_by_global_norm(train_cfg.grad_clip_norm), tx)
    if trainable_mask_fn is not None:
        def _frozen_mask_fn(tree):
            return jax.tree_util.tree_map(
                lambda b: not b, trainable_mask_fn(tree)
            )

        tx = optax.chain(
            # frozen leaves: update = 0 (set_to_zero is stateless);
            # trainable leaves: the full AdamW chain. Clipping sits inside
            # the masked chain, so the global norm is over trainable
            # grads only — frozen grads must not shrink the real update.
            optax.masked(optax.set_to_zero(), _frozen_mask_fn),
            optax.masked(tx, trainable_mask_fn),
        )
    if train_cfg.skip_nonfinite_updates > 0:
        # inside-jit guard: a non-finite grad step becomes a no-op
        # (params AND optimizer moments untouched) instead of poisoning
        # the weights; after N consecutive bad steps the NaNs propagate
        # so a truly diverged run still fails loudly
        tx = optax.apply_if_finite(
            tx, max_consecutive_errors=train_cfg.skip_nonfinite_updates
        )
    return tx


class _PreemptionGuard:
    """SIGTERM → graceful stop: finish the in-flight dispatch, checkpoint
    full state, exit the epoch loop. TPU-VM / GKE preemption delivers
    SIGTERM with a grace window; the reference has no preemption handling
    at all (SURVEY.md §5 'Failure detection … None')."""

    def __init__(self):
        self.preempted = False
        self._old = None

    def __enter__(self):
        import signal

        try:
            self._old = signal.signal(signal.SIGTERM, self._handle)
        except ValueError:
            # signal handlers can only be installed from the main thread
            # (e.g. trainers driven from worker threads in tests) — run
            # without the guard rather than fail.
            self._old = None
        return self

    def _handle(self, signum, frame):
        self.preempted = True
        logger.warning(
            "SIGTERM received — will checkpoint and stop after the "
            "in-flight step"
        )

    def __exit__(self, *exc):
        import signal

        if self._old is not None:
            signal.signal(signal.SIGTERM, self._old)
        return False


def resolve_steps_per_dispatch(value: int, threshold_ms: float = 1.0) -> int:
    """Resolve TrainingConfig.steps_per_dispatch=0 (auto) to a concrete S.

    Measures the per-call dispatch round trip of an already-compiled
    trivial program (median of 5 after 2 warm-up calls — remote backends
    load a fresh executable lazily, so the first calls measure program
    load, not dispatch). Batching S train steps into one lax.scan
    dispatch only pays when the round trip itself is expensive: >= 1 ms
    picks the tunnel-measured S=4 (+16%, PERF_STAGES.md sweep); a local
    backend (~0.1 ms) picks S=1 and skips the host-side super-batch
    assembly. Explicit values pass through untouched."""
    if value > 0:
        return value
    f = jax.jit(lambda x: x + 1.0)
    x = jnp.zeros((8, 128), jnp.float32)
    for _ in range(2):
        f(x).block_until_ready()
    times = []
    for _ in range(5):
        t0 = time.perf_counter()
        f(x).block_until_ready()
        times.append(time.perf_counter() - t0)
    lat_ms = sorted(times)[len(times) // 2] * 1e3
    s = 4 if lat_ms >= threshold_ms else 1
    if jax.process_count() > 1:
        # The probe is per-process wall clock; hosts under different load
        # could resolve different S, building mismatched programs (A scans
        # 4-step super-batches while B single-steps -> divergent collective
        # sequences deadlock the first all-reduce). Process 0 decides for
        # everyone.
        from jax.experimental import multihost_utils

        s = int(multihost_utils.broadcast_one_to_all(jnp.int32(s)))
    logger.info(
        "steps_per_dispatch auto: median dispatch %.3f ms -> S=%d",
        lat_ms, s,
    )
    return s


class Trainer:
    def __init__(self, config: LayoutDitConfig, model: LayoutDetectionModel):
        import fsspec

        self.fs_open = fsspec.open
        self.config = config
        self.model = model
        self.loss_history: list[float] = []
        # steady-state observability: per-epoch images/sec as logged
        self.epoch_images_per_sec: list[float] = []
        # structured per-epoch records -> {run}/metrics.jsonl (the
        # reference logs loss only, to stdout; SURVEY.md §5 "no
        # structured metrics store")
        self.metrics_history: list[dict] = []
        self._total_updates = 0
        self._start_step = 0    # mid-epoch resume offset (set by resume())
        self._partial_steps = 0  # steps done when a preemption cut an epoch
        # mid-training eval (TrainingConfig.eval_interval)
        self.best_map = float("-inf")
        self.best_checkpoint_path: str | None = None
        self._evals_since_best = 0  # mid-evals since the last best mAP
        self._skipped_logged = 0  # last logged skipped-nonfinite count
        self._evaluator = None
        self.trace_log_dir = config.train_config.trace_log_dir
        self.epoch = 0
        self._guard: _PreemptionGuard | None = None

        maybe_distributed_init(config.mesh_config)
        self.mesh = build_mesh_for_batch(
            config.mesh_config, config.data_loader_config.batch_size
        )
        logger.info("Device mesh: %s", self.mesh)

        # resolve steps_per_dispatch=0 (auto) ONCE, before the loader and
        # the jitted step are built around it; write the decision back so
        # logs/metrics/resume all see the concrete value
        config.train_config.steps_per_dispatch = resolve_steps_per_dispatch(
            config.train_config.steps_per_dispatch
        )

        # place params per the mesh: replicated for pure DP, Megatron-style
        # tensor-parallel over the 'model' axis when model_parallel > 1
        from layoutdit_tpu.parallel.sharding import shard_params

        self.model.params = shard_params(
            self.model.params, self.mesh, fsdp=config.mesh_config.fsdp
        )

        # EMA of the params (TrainingConfig.ema_decay): a distinct buffer
        # seeded from the initial params (x*1 forces a copy — the train
        # step donates its inputs, so ema must not alias params), same
        # shardings via propagation.
        self.ema_params = None
        if config.train_config.ema_decay > 0:
            self.ema_params = jax.jit(
                lambda t: jax.tree_util.tree_map(lambda x: x * 1, t)
            )(self.model.params)

        self._build_dataloader()
        self._setup_optimizer()
        self._build_train_step()

    # ------------------------------------------------------------- setup

    def _build_dataloader(self):
        dl_cfg = self.config.data_loader_config
        images_root, ann_json = resolve_split(self.config, train=True)
        with_mask = self.config.detection_model_config.with_mask
        if dl_cfg.image_shards_dir:
            from layoutdit_tpu.data.shards import make_sharded_dataset

            if with_mask:
                raise ValueError(
                    "with_mask training is not wired to tar-shard datasets "
                    "yet — use the plain images_root/annotations layout"
                )
            dataset = make_sharded_dataset(dl_cfg.image_shards_dir, ann_json)
        else:
            dataset = PubLayNetDataset(
                images_root_dir=images_root, annotations_json_path=ann_json,
                with_segmentation=with_mask,
            )
        self.dataloader = DetectionLoader(
            dataset,
            batch_size=dl_cfg.batch_size,
            shuffle=dl_cfg.shuffle,
            num_workers=dl_cfg.num_workers,
            image_size=self.config.detection_model_config.image_size,
            max_gt=dl_cfg.max_gt_boxes,
            seed=self.config.train_config.seed,
            drop_last=True,  # constant shapes: one compiled step
            # producer-thread H2D: the next batch's transfer overlaps the
            # current step's compute (device_put is async); only the four
            # fields the train step consumes are shipped. With
            # steps_per_dispatch > 1 the loader also stacks S batches into
            # one [S, B, ...] super-batch per transfer (one lax.scan
            # dispatch runs S steps).
            device_put=False,
            shardings={
                f: batch_sharding(self.mesh)
                for f in ("images", "gt_boxes", "gt_labels", "gt_valid")
                + (("gt_masks",) if with_mask else ())
            },
            stack_batches=max(1, self.config.train_config.steps_per_dispatch),
            prefetch_depth=dl_cfg.prefetch_depth,
            augment_hflip=dl_cfg.augment_hflip,
            load_masks=with_mask,
        )

    def _setup_optimizer(self):
        mask_fn = None
        vit_cfg = getattr(self.model.cfg.backbone, "vit", None)
        if (
            vit_cfg is not None
            and getattr(vit_cfg, "lora_rank", 0) > 0
            and self.config.train_config.lora_freeze_base
        ):
            from layoutdit_tpu.models.lora import num_trainable, trainable_mask

            mask_fn = trainable_mask
            n_train, n_total = num_trainable(self.model.params)
            logger.info(
                "LoRA fine-tune: %d / %d params trainable (%.1f%%); "
                "frozen encoder weights get no optimizer moments",
                n_train, n_total, 100.0 * n_train / max(1, n_total),
            )
        self.tx = make_optimizer(
            self.config.train_config, len(self.dataloader),
            trainable_mask_fn=mask_fn,
        )
        # Static bool pytree (True = trainable), consumed by the train
        # step to stop_gradient the frozen leaves — see _build_train_step.
        self._trainable_mask = (
            mask_fn(self.model.params) if mask_fn is not None else None
        )
        # explicit out_shardings: zeros_like moments are data-unconnected to
        # the inputs, so a bare jit(tx.init) may single-device them —
        # defeating TP/FSDP at-rest layout (parallel/sharding.py)
        from layoutdit_tpu.parallel.sharding import init_opt_state_sharded

        self.opt_state = init_opt_state_sharded(
            self.tx, self.model.params, self.mesh
        )
        self._lr_schedule = make_lr_schedule(
            self.config.train_config, len(self.dataloader)
        )

    def _build_train_step(self):
        cfg = self.model.cfg
        tx = self.tx
        rep = replicated_sharding(self.mesh)
        data = batch_sharding(self.mesh)
        seq = sequence_sharding(self.mesh, self.config.mesh_config)
        pipe = pipeline_config(self.mesh, self.config.mesh_config)

        accum = max(1, self.config.train_config.grad_accumulation_steps)
        # The Mask R-CNN branch rides as a variadic batch tail: when
        # cfg.with_mask every step/scan signature gains one trailing
        # gt_masks array, and stays byte-identical otherwise.
        n_extra = 1 if cfg.with_mask else 0

        freeze_mask = self._trainable_mask

        def total_loss(p, rng, images, gt_boxes, gt_labels, gt_valid,
                       gt_masks=None):
            if freeze_mask is not None:
                # Frozen leaves enter the forward through stop_gradient:
                # their cotangents become symbolic zeros, so XLA DCEs
                # every dW GEMM of the frozen encoder from the backward —
                # the optimizer masking alone would compute those grads
                # and then zero the updates. dx backprop still flows (the
                # adapters need it); only the weight-gradient work drops.
                p = jax.tree_util.tree_map(
                    lambda m, x: x if m else jax.lax.stop_gradient(x),
                    freeze_mask, p,
                )
            losses = detector_loss(
                p, rng, images, gt_boxes, gt_labels, gt_valid, cfg,
                seq_sharding=seq, pipeline=pipe, gt_masks=gt_masks,
            )
            return sum(losses.values()), losses

        grad_of_loss = jax.value_and_grad(total_loss, has_aux=True)

        def step(params, opt_state, rng, images, gt_boxes, gt_labels,
                 gt_valid, *extra):
            if accum == 1:
                (loss, losses), grads = grad_of_loss(
                    params, rng, images, gt_boxes, gt_labels, gt_valid, *extra
                )
            else:
                # Micro-batch accumulation: scan over [A, B/A, ...] slices
                # of the global batch, summing fp32 gradients; only the
                # final averaged gradient meets the optimizer, so peak
                # activation memory is one micro-batch's.
                def split(x):
                    return x.reshape(accum, x.shape[0] // accum, *x.shape[1:])

                micro = tuple(split(x) for x in
                              (images, gt_boxes, gt_labels, gt_valid) + extra)
                rngs = jax.random.split(rng, accum)

                def body(acc, xs):
                    g_acc, l_acc = acc
                    (l, ls), g = grad_of_loss(params, xs[0], *xs[1:])
                    g_acc = jax.tree_util.tree_map(
                        lambda a, b: a + b.astype(jnp.float32), g_acc, g
                    )
                    return (g_acc, l_acc + l), ls

                zeros = jax.tree_util.tree_map(
                    lambda p: jnp.zeros(p.shape, jnp.float32), params
                )
                (g_sum, l_sum), losses_stack = jax.lax.scan(
                    body, (zeros, 0.0), (rngs, *micro)
                )
                grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)
                loss = l_sum / accum
                losses = jax.tree_util.tree_map(
                    lambda x: x.mean(0), losses_stack
                )
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state, loss, losses

        ema_decay = self.config.train_config.ema_decay

        def ema_update(ema, params):
            return jax.tree_util.tree_map(
                lambda e, p: e * ema_decay + p.astype(e.dtype) * (1 - ema_decay),
                ema, params,
            )

        def step_ema(params, opt_state, ema, rng, *batch):
            params, opt_state, loss, losses = step(
                params, opt_state, rng, *batch
            )
            return params, opt_state, ema_update(ema, params), loss, losses

        # params/opt keep their committed (DP-replicated or TP-sharded)
        # placements; only the batch gets an explicit data-axis sharding.
        if ema_decay > 0:
            self._train_step = jax.jit(
                step_ema,
                in_shardings=(None, None, None, rep)
                + (data,) * (4 + n_extra),
                out_shardings=(None, None, None, rep, rep),
                donate_argnums=(0, 1, 2),
            )
        else:
            self._train_step = jax.jit(
                step,
                in_shardings=(None, None, rep) + (data,) * (4 + n_extra),
                out_shardings=(None, None, rep, rep),
                donate_argnums=(0, 1),
            )

        def multi_step(params, opt_state, ema, rng, images, gt_boxes,
                       gt_labels, gt_valid, *extra):
            """lax.scan over stacked micro-batches: one dispatch for N
            steps (amortizes per-call host round trips)."""

            def body(carry, xs):
                params, opt_state, ema, rng = carry
                rng, sub = jax.random.split(rng)
                params, opt_state, loss, _ = step(
                    params, opt_state, sub, *xs
                )
                if ema_decay > 0:
                    ema = ema_update(ema, params)
                return (params, opt_state, ema, rng), loss

            (params, opt_state, ema, _), losses = jax.lax.scan(
                body, (params, opt_state, ema, rng),
                (images, gt_boxes, gt_labels, gt_valid) + extra,
                # unrolling lets XLA keep the carried params in compute-
                # friendly layouts across chained steps instead of
                # round-tripping the canonical carry layout per step
                # (~5 ms/step measured at unroll=1, bench.py notes)
                unroll=min(4, self.config.train_config.steps_per_dispatch),
            )
            return params, opt_state, ema, losses

        # stacked batches: [S, B, ...] with B sharded over 'data'.
        # EMA off: a 0-size placeholder rides the ema slot so one jit
        # signature serves both modes.
        sdata = NamedSharding(
            self.mesh, PartitionSpec(None, self.mesh.axis_names[0])
        )
        self._train_multi_step = jax.jit(
            multi_step,
            in_shardings=(None, None, None, rep)
            + (sdata,) * (4 + n_extra),
            out_shardings=(None, None, None, rep),
            donate_argnums=(0, 1, 2),
        )

    # ------------------------------------------------------------- loops

    def _run_epoch(self, epoch: int) -> float:
        train_cfg = self.config.train_config
        t0 = time.time()
        losses = []  # device scalars; fetched once at epoch end (a per-step
        # float() sync costs a full host round trip on remote backends)
        # mid-epoch resume: skip the steps the preempted process already
        # ran (one-shot). The loader is pinned to the GLOBAL epoch so the
        # shuffle order matches what the preempted process saw.
        skip = self._start_step
        self._start_step = 0
        self._partial_steps = 0
        self.dataloader.set_epoch(epoch)
        if skip:
            self.dataloader.skip_batches(skip)
        n_steps = skip  # position within the epoch's step sequence
        n_new = 0  # steps actually run by THIS process
        n_images = 0
        key = jax.random.PRNGKey(train_cfg.seed + 1000 + epoch)
        for batch in self.dataloader:
            # the loader yields plain [B, ...] batches, or [S, B, ...]
            # super-batches when steps_per_dispatch > 1 (epoch remainders
            # still arrive plain)
            stacked = batch.images.ndim == 5
            s = batch.images.shape[0] if stacked else 1
            n_images += (
                batch.images.shape[0] * batch.images.shape[1] if stacked
                else batch.images.shape[0]
            )
            # key the dispatch on its POSITION in the epoch, not on how
            # many dispatches this process ran: a mid-epoch resume then
            # reproduces the exact rng stream of an uninterrupted run
            sub = jax.random.fold_in(key, n_steps)
            n_steps += s
            n_new += s
            losses.append(self._dispatch(batch, stacked, sub, n_steps))
            if self._guard is not None and self._preempted_everywhere():
                # partial epoch: record how far we got so resume can
                # continue from the NEXT step instead of redoing the epoch
                self._partial_steps = n_steps
                break
        if n_new == 0:
            # resume landed exactly at the epoch boundary: nothing to run
            logger.info("Epoch %d already complete at resume point", epoch + 1)
            return self.loss_history[-1] if self.loss_history else 0.0
        avg = float(jnp.concatenate([jnp.atleast_1d(l) for l in losses]).mean()) \
            if losses else 0.0
        dt = time.time() - t0
        self.loss_history.append(avg)
        self.epoch_images_per_sec.append(n_images / max(dt, 1e-9))
        # one optimizer update per step (grad accumulation happens inside
        # the step); lr evaluated at the post-epoch update count
        self._total_updates += n_new
        rec = {
            "epoch": epoch + 1,
            "loss": avg,
            "images_per_sec": round(n_images / max(dt, 1e-9), 2),
            "learning_rate": float(self._lr_schedule(self._total_updates)),
        }
        if train_cfg.skip_nonfinite_updates > 0:
            # surface skipped steps (optax.apply_if_finite): NON-consecutive
            # NaN steps never trip the consecutive-failure budget, so
            # without this count a run silently no-opping half its updates
            # looks like a normal loss curve in metrics.jsonl
            skipped = getattr(self.opt_state, "total_notfinite", None)
            if skipped is not None:
                rec["skipped_nonfinite_steps"] = int(skipped)
                if rec["skipped_nonfinite_steps"] > self._skipped_logged:
                    logger.warning(
                        "%d non-finite gradient step(s) skipped so far "
                        "this run (params/moments untouched on those)",
                        rec["skipped_nonfinite_steps"],
                    )
                    self._skipped_logged = rec["skipped_nonfinite_steps"]
        self.metrics_history.append(rec)
        logger.info(
            "Epoch %d/%d, Loss: %.4f (%.1f img/s)",
            epoch + 1, train_cfg.num_epochs, avg, n_images / max(dt, 1e-9),
        )
        return avg

    def _preempted_everywhere(self) -> bool:
        """Preemption decision, agreed across hosts.

        SIGTERM delivery is per-process: in a multi-host run, host A can
        see the flag before step k+1 while host B already dispatched it —
        A would enter the (collective) checkpoint save while B sits in
        step k+1's all-reduce, deadlocking both until the grace window
        expires. A tiny allgather of the local flag every dispatch makes
        every host break at the SAME step boundary (any host flagged =>
        all break). Single-process runs skip the collective entirely.
        """
        local = bool(self._guard.preempted)
        if jax.process_count() == 1:
            return local
        from jax.experimental import multihost_utils

        flags = multihost_utils.process_allgather(
            jnp.asarray([local], dtype=jnp.int32)
        )
        return bool(np.asarray(flags).any())

    def _dispatch(self, b, stacked: bool, rng, step_num: int):
        """Run 1 (plain batch) or S (super-batch lax.scan) training steps
        in one device call; returns device loss scalar(s)."""
        ema_on = self.ema_params is not None
        batch_args = (b.images, b.gt_boxes, b.gt_labels, b.gt_valid)
        if self.model.cfg.with_mask:
            batch_args += (b.gt_masks,)
        with jax.profiler.StepTraceAnnotation("train_step", step_num=step_num):
            if not stacked:
                if ema_on:
                    (self.model.params, self.opt_state, self.ema_params,
                     loss, _) = self._train_step(
                        self.model.params, self.opt_state, self.ema_params,
                        rng, *batch_args,
                    )
                else:
                    self.model.params, self.opt_state, loss, _ = self._train_step(
                        self.model.params, self.opt_state, rng, *batch_args,
                    )
                return loss
            ema_in = self.ema_params if ema_on else jnp.zeros(())
            (self.model.params, self.opt_state, ema_out,
             losses) = self._train_multi_step(
                self.model.params, self.opt_state, ema_in, rng, *batch_args,
            )
            if ema_on:
                self.ema_params = ema_out
            return losses

    def _mid_eval(self, epoch: int) -> None:
        """Score the eval split mid-training (TrainingConfig.eval_interval):
        mAP lands in metrics.jsonl and a rolling best-mAP checkpoint is
        kept at model_checkpoints/best.*. With EMA enabled the EMA weights
        are evaluated — and saved as the best checkpoint's params (the
        weights that actually achieved the metric)."""
        from layoutdit_tpu.eval.evaluator import Evaluator

        if self._evaluator is None:
            self._evaluator = Evaluator(
                model=self.model, layout_dit_config=self.config,
                mesh=self.mesh,  # data-parallel eval on multi-chip runs
            )
        saved = None
        if self.ema_params is not None:
            saved, self.model.params = self.model.params, self.ema_params
        try:
            metrics = self._evaluator.score()
            m = float(metrics["mAP"]) if metrics else float("nan")
            if self.metrics_history:
                self.metrics_history[-1]["mAP"] = m
            logger.info("Eval at epoch %d: mAP=%.4f", epoch + 1, m)
            if np.isfinite(m) and m > self.best_map:
                self._evals_since_best = 0
                self.best_map = m
                self.best_checkpoint_path = self.model.save_checkpoint(
                    self._artifact_base(), self.config.run_name, epoch + 1,
                    opt_state=self._ckpt_opt_state(),
                    # _train_extras so an explicit --resume best.msgpack
                    # keeps histories + the best/patience trackers too
                    extra={**self._train_extras(),
                           "mAP": m, "epoch": epoch + 1,
                           "ema": self.ema_params is not None},
                    stem="best",
                )
                logger.info(
                    "New best mAP %.4f -> %s", m, self.best_checkpoint_path
                )
            elif np.isfinite(self.best_map):
                self._evals_since_best += 1
            # else: no finite best exists yet (e.g. undertrained model
            # producing zero predictions -> mAP NaN) — don't tick the
            # early-stop clock before a deployable best.* checkpoint has
            # ever been written; the run would otherwise halt at
            # best=-inf with best_checkpoint_path=None
        finally:
            if saved is not None:
                self.model.params = saved

    def _ckpt_opt_state(self):
        """Training-state blob for the checkpoint's opt_state slot; the
        EMA weights ride alongside the optimizer state when enabled (the
        config's ema_decay must match between save and resume)."""
        if self.ema_params is None:
            return self.opt_state
        return {"tx": self.opt_state, "ema": self.ema_params}

    def _train_extras(self) -> dict:
        """Host-side training state that rides every checkpoint so a
        resumed run continues exactly: histories, and the mid-eval
        best/patience trackers — without these, a preemption-resume
        would re-init best_map to -inf (the first post-resume eval
        would then OVERWRITE best.* with worse weights) and reset the
        early-stop patience clock."""
        return {
            "loss_history": self.loss_history,
            "metrics_history": self.metrics_history,
            "best_map": (
                self.best_map if np.isfinite(self.best_map) else None
            ),
            "best_checkpoint_path": self.best_checkpoint_path,
            "evals_since_best": self._evals_since_best,
            # the RESOLVED dispatch batching: a resumed run must replay the
            # exact rng stream (_run_epoch folds rng per dispatch), so an
            # auto probe that flips S across the preemption boundary would
            # silently break bitwise resume — resume() re-adopts this value
            "steps_per_dispatch": self.config.train_config.steps_per_dispatch,
        }

    def train(self):
        train_cfg = self.config.train_config
        start = self.epoch
        profiling = False
        if train_cfg.enable_profile:
            os.makedirs(self.trace_log_dir, exist_ok=True)
            jax.profiler.start_trace(self.trace_log_dir)
            profiling = True
        writer = None
        if train_cfg.async_checkpoint:
            from layoutdit_tpu.train.checkpoint import AsyncCheckpointWriter

            writer = AsyncCheckpointWriter()
        tb = None
        if train_cfg.tensorboard and self._is_lead_host():
            from layoutdit_tpu.utils.tensorboard import TensorBoardWriter

            tb = TensorBoardWriter(
                f"{self._artifact_base()}/{self.config.run_name}/tb",
                fs_open=self.fs_open,
            )
        try:
            with _PreemptionGuard() as guard:
                self._guard = guard
                for epoch in range(start, train_cfg.num_epochs):
                    self._run_epoch(epoch)
                    # agreed decision: a host that broke because ANOTHER
                    # host was preempted has a False local flag — and the
                    # between-epoch SIGTERM case needs agreement too
                    # (_partial_steps>0 already implies every host broke)
                    if self._partial_steps or self._preempted_everywhere():
                        # _partial_steps > 0: the epoch was cut mid-loop —
                        # record the completed step count so resume
                        # continues it. _partial_steps == 0 means the
                        # SIGTERM landed AFTER the step loop's last check
                        # (e.g. during the end-of-epoch loss fetch, a long
                        # device sync): every update of epoch `epoch` is
                        # already applied, so the resume point is the NEXT
                        # epoch — saving `epoch` here would re-train an
                        # applied epoch on its own updates.
                        # Synchronous save — the grace window may be short.
                        done_epoch = (
                            epoch if self._partial_steps else epoch + 1
                        )
                        if writer is not None:
                            writer.wait()
                        path = self.model.save_checkpoint(
                            self._artifact_base(), self.config.run_name,
                            done_epoch, opt_state=self._ckpt_opt_state(),
                            extra={
                                **self._train_extras(),
                                # step-granular resume point: resume()
                                # continues the cut epoch from here rather
                                # than redoing it (epochs at PubLayNet
                                # scale are hours long)
                                "step_in_epoch": self._partial_steps,
                            },
                            tag="preempt",
                        )
                        self.epoch = done_epoch
                        logger.warning(
                            "Preempted at epoch %d step %d; saved %s — "
                            "resume with --resume %s",
                            epoch + 1, self._partial_steps, path, path,
                        )
                        break
                    stop_early = False
                    if (
                        train_cfg.eval_interval > 0
                        and (epoch + 1) % train_cfg.eval_interval == 0
                    ):
                        self._mid_eval(epoch)
                        # early stop: N consecutive evals without a new
                        # best mAP -> the best.* checkpoint already holds
                        # the winning weights; the remaining epochs are
                        # waste. Decision is host-consistent (replicated
                        # eval metrics). Bookkeeping below still runs so
                        # the final epoch checkpoints/logs normally.
                        stop_early = (
                            0 < train_cfg.early_stop_patience
                            <= self._evals_since_best
                        )
                    if tb is not None and self.metrics_history and \
                            self.metrics_history[-1].get("epoch") == epoch + 1:
                        rec = self.metrics_history[-1]
                        tb.scalars(
                            {f"train/{k}": v for k, v in rec.items()
                             if k != "epoch"},
                            step=epoch + 1,
                        )
                        tb.flush()  # event file live-updates per epoch
                    self._save_metrics(quiet=True)  # durable per epoch
                    # per-EPOCH checkpoint cadence (the non-buggy variant)
                    if (epoch + 1) % train_cfg.checkpoint_interval == 0:
                        path = self.model.save_checkpoint(
                            self._artifact_base(), self.config.run_name,
                            epoch + 1, opt_state=self._ckpt_opt_state(),
                            extra=self._train_extras(),
                            writer=writer,
                        )
                        logger.info(
                            "Saved checkpoint to %s%s", path,
                            " (async)" if writer is not None else "",
                        )
                        if train_cfg.keep_checkpoints > 0:
                            from layoutdit_tpu.train.checkpoint import (
                                prune_checkpoints,
                            )

                            prune_checkpoints(
                                f"{self._artifact_base()}"
                                f"/{self.config.run_name}/model_checkpoints",
                                train_cfg.keep_checkpoints, epoch + 1,
                            )
                    self.epoch = epoch + 1
                    if stop_early:
                        logger.info(
                            "Early stop at epoch %d: no mAP improvement "
                            "in %d evals (best %.4f)", epoch + 1,
                            self._evals_since_best, self.best_map,
                        )
                        break
        finally:
            self._guard = None
            if writer is not None:
                writer.close()  # barrier: checkpoints durable at return
            if tb is not None:
                tb.close()
            # release the loader's decode workers (lazily recreated if
            # train() runs again on this instance)
            self.dataloader.close()
            if profiling:
                jax.profiler.stop_trace()
        self._save_loss()
        self._save_metrics()
        if train_cfg.enable_profile:
            self._save_traces(self.config.run_name)

    def resume(self, checkpoint_path: str):
        """True resume: params + optimizer + epoch (absent in the
        reference — SURVEY.md §5). ``"auto"`` resolves to the newest
        periodic/preempt checkpoint in this run's directory, or starts
        fresh when there is none — preemption restart loops pass it
        unconditionally."""
        from layoutdit_tpu.train.checkpoint import (
            list_resume_candidates,
            load_checkpoint,
            load_checkpoint_sharded,
        )

        tolerate_failures = checkpoint_path == "auto"
        if tolerate_failures:
            root = (
                f"{self._artifact_base()}/{self.config.run_name}"
                "/model_checkpoints"
            )
            candidates = list_resume_candidates(root)
            if jax.process_count() > 1:
                # Hosts must agree on the resume point BEFORE any host
                # returns: checkpoints write from the lead host only, so
                # a host-local artifact base leaves other hosts finding
                # nothing — a mixed fresh/resumed start diverges step
                # counts and deadlocks the first collective. Fail loudly
                # instead. The signature comes from the canonical parser
                # (checkpoint.py), not a second filename regex.
                from jax.experimental import multihost_utils

                sig = (
                    candidates[0][0] * 2 + candidates[0][1]
                    if candidates
                    else -1
                )
                sigs = np.asarray(
                    multihost_utils.process_allgather(
                        jnp.asarray([sig], jnp.int32)
                    )
                ).ravel().tolist()
                if len(set(sigs)) > 1:
                    raise RuntimeError(
                        f"--resume auto: hosts found different newest "
                        f"checkpoints under {root} (signatures {sigs}, "
                        f"-1 = none). Multi-host runs need a SHARED "
                        f"artifact base (e.g. gs://...) — checkpoints "
                        f"write from the lead host only."
                    )
            if not candidates:
                logger.info(
                    "--resume auto: no checkpoint under %s; starting fresh",
                    root,
                )
                return
            attempts = [path for _, _, path in candidates]
        else:
            attempts = [checkpoint_path]

        state = None
        for candidate in attempts:
            loader = (
                load_checkpoint_sharded
                if candidate.rstrip("/").endswith(".orbax")
                else load_checkpoint
            )
            try:
                state = loader(
                    candidate, params_template=self.model.params,
                    opt_state_template=self._ckpt_opt_state(),
                )
            except Exception as exc:
                if not tolerate_failures:
                    raise
                # e.g. truncated by a SIGKILL mid-write before the
                # write-then-rename hardening, or a half-uploaded .orbax
                # dir: fall back to the next-newest instead of bricking
                # the restart loop on the same bad file forever
                logger.warning(
                    "--resume auto: %s unreadable (%s); trying next-newest",
                    candidate, exc,
                )
                continue
            checkpoint_path = candidate
            break
        if state is None:
            raise RuntimeError(
                f"--resume auto: all {len(attempts)} checkpoints under "
                f"{root} are unreadable; refusing to silently restart "
                f"from scratch"
            )
        if tolerate_failures:
            logger.info("--resume auto: resuming from %s", checkpoint_path)
        self.model.params = state["params"]
        if state["opt_state"] is None:
            # params-only checkpoint (e.g. a converted reference model,
            # tools/convert_reference_checkpoint.py): warm-start the
            # weights, keep the freshly initialized optimizer state
            logger.warning(
                "%s has no optimizer state; resuming weights only",
                checkpoint_path,
            )
        elif self.ema_params is not None:
            self.opt_state = state["opt_state"]["tx"]
            self.ema_params = state["opt_state"]["ema"]
        else:
            self.opt_state = state["opt_state"]
        self.epoch = state["epoch"]
        self.loss_history = state["extra"].get("loss_history", [])
        # restore the structured history too: _save_metrics rewrites the
        # whole metrics.jsonl each epoch, so a resume without it would
        # clobber every pre-resume record
        self.metrics_history = state["extra"].get("metrics_history", [])
        # mid-eval best/patience trackers (see _train_extras): a resume
        # must not regress best.* or restart the early-stop clock
        bm = state["extra"].get("best_map")
        self.best_map = float(bm) if bm is not None else float("-inf")
        self.best_checkpoint_path = state["extra"].get(
            "best_checkpoint_path"
        )
        self._evals_since_best = int(
            state["extra"].get("evals_since_best", 0) or 0
        )
        # mid-epoch resume point (preempt checkpoints; 0 = epoch boundary)
        self._start_step = int(state["extra"].get("step_in_epoch", 0) or 0)
        # adopt the original run's RESOLVED steps_per_dispatch: with the
        # auto probe a restarted host could resolve a different S, and the
        # per-step rng stream depends on S (multi_step splits rng inside
        # the scan) — bitwise resume requires replaying the same batching
        saved_s = int(state["extra"].get("steps_per_dispatch", 0) or 0)
        cur_s = self.config.train_config.steps_per_dispatch
        if saved_s and saved_s != cur_s:
            logger.info(
                "Resume: adopting checkpoint steps_per_dispatch=%d "
                "(this process resolved %d); rebuilding loader + step",
                saved_s, cur_s,
            )
            self.config.train_config.steps_per_dispatch = saved_s
            self._build_dataloader()
            self._build_train_step()
        # logged-LR bookkeeping (the optimizer's own schedule count lives
        # in opt_state and is restored with it; this only feeds metrics)
        self._total_updates = (
            self.epoch * len(self.dataloader) + self._start_step
        )
        logger.info(
            "Resumed from %s at epoch %d%s", checkpoint_path, self.epoch,
            f" step {self._start_step}" if self._start_step else "",
        )

    # ---------------------------------------------------------- artifacts

    def _artifact_base(self) -> str:
        return self.config.eval_config.eval_base_path or "."

    @staticmethod
    def _is_lead_host() -> bool:
        """Run artifacts (loss PNG, metrics.jsonl, TensorBoard, traces)
        are written by the lead host only (parallel/mesh.py::is_lead_host
        — the shared ownership rule). Per-shard orbax checkpoints have
        their own ownership logic (train/checkpoint.py)."""
        from layoutdit_tpu.parallel.mesh import is_lead_host

        return is_lead_host()

    def _save_loss(self):
        """Loss-curve PNG (reference trainer.py:217-230)."""
        if not self._is_lead_host():
            return
        import matplotlib

        matplotlib.use("Agg")
        from matplotlib import pyplot as plt

        fig, ax = plt.subplots()
        ax.plot(range(1, len(self.loss_history) + 1), self.loss_history, marker="o")
        ax.set_xlabel("Epoch")
        ax.set_ylabel("Average Loss")
        ax.set_title("Training Loss per Epoch")
        loss_path = (
            f"{self._artifact_base()}/{self.config.run_name}"
            "/loss_history/loss_curve.png"
        )
        logger.info("Saving loss to %s", loss_path)
        with self.fs_open(loss_path, "wb", auto_mkdir=True) as f:
            fig.savefig(f, format="png", bbox_inches="tight")
        plt.close(fig)

    def _save_metrics(self, quiet: bool = False):
        """Structured per-epoch metrics (loss, img/s, lr) as JSONL next to
        the loss curve — machine-readable observability the reference
        lacks (its metrics live only in log lines). Rewritten after every
        epoch (small file, object-store-safe) so a crash or preemption
        never loses the run's history."""
        import json

        if not self.metrics_history or not self._is_lead_host():
            return
        path = (
            f"{self._artifact_base()}/{self.config.run_name}"
            "/metrics/metrics.jsonl"
        )
        with self.fs_open(path, "w", auto_mkdir=True) as f:
            for rec in self.metrics_history:
                f.write(json.dumps(rec) + "\n")
        if not quiet:
            logger.info("Saved metrics to %s", path)

    def _save_traces(self, run_name: str):
        """Upload profiler traces (reference trainer.py:232-257), keeping
        relative paths."""
        if not self._is_lead_host():
            return
        import fsspec

        local_root = self.trace_log_dir.rstrip("/")
        remote_root = f"{self._artifact_base()}/{run_name}/profiler"
        for dirpath, _dirnames, filenames in os.walk(local_root):
            for fname in filenames:
                local_path = os.path.join(dirpath, fname)
                rel = os.path.relpath(local_path, local_root)
                remote = f"{remote_root}/{rel.replace(os.sep, '/')}"
                with open(local_path, "rb") as lf:
                    with fsspec.open(remote, "wb", auto_mkdir=True) as rf:
                        rf.write(lf.read())
                logger.info("Uploaded trace %s -> %s", rel, remote)
