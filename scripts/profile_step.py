"""Stage-level timing of the dit-base train step on the real chip.

Methodology (see bench.py): each stage variant runs N iterations inside a
single jit (lax.scan / fori_loop) so the axon tunnel's per-dispatch latency
cannot pollute the numbers; one host fetch at the end. Differences between
cumulative variants give per-stage costs. Writes PERF_STAGES.md at the
repo root when --write is passed.

Usage: python scripts/profile_step.py [--steps 20] [--batch 16] [--write]
"""

from __future__ import annotations

import argparse
import os
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

import jax

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..", ".jax_cache"),
)

import jax.numpy as jnp
import numpy as np
import optax

from layoutdit_tpu.config.constructs import TrainingConfig
from layoutdit_tpu.models.detection import rpn as rpn_mod
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    _anchors,
    _pool_and_predict,
    _run_trunk,
    detector_loss,
    init_detector_params,
)
from layoutdit_tpu.models.detection.roi_heads import (
    fastrcnn_loss,
    select_training_samples_single,
)
from layoutdit_tpu.train.trainer import make_optimizer


def timed(fn, params, images, steps: int, reps: int = 3) -> float:
    """Median wall ms/iteration of fn scanned `steps` times inside one jit.

    Each iteration's images depend (negligibly, * 1e-30) on the previous
    iteration's result, so XLA cannot hoist loop-invariant stages out of
    the fori_loop — without this the trunk forward (same params, same
    images every iteration) is computed ONCE and the per-stage numbers
    are fiction."""

    @jax.jit
    def run(args):
        params, images = args

        def body(i, acc):
            imgs = images + acc * jnp.float32(1e-30)
            out = fn(params, imgs, jnp.uint32(i))
            leaf = jax.tree_util.tree_leaves(out)[0]
            return acc * jnp.float32(1e-30) + leaf.astype(jnp.float32).sum() * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

    args = (params, images)
    r = run(args)
    np.asarray(r)  # compile + warmup
    times = []
    for _ in range(reps):
        t0 = time.time()
        np.asarray(run(args))
        times.append((time.time() - t0) / steps * 1000)
    return float(np.median(times))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=20)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--write", action="store_true")
    ap.add_argument("--attn", default=None, help="override attention_impl")
    ap.add_argument("--roi", default=None, help="override roi_impl")
    ap.add_argument("--nms-tile", type=int, default=None)
    args = ap.parse_args()

    kw = {}
    if args.attn:
        kw["attention_impl"] = args.attn
    if args.roi:
        kw["roi_impl"] = args.roi
    if args.nms_tile:
        from layoutdit_tpu.config.constructs import DetectionBudget
        kw["budget"] = DetectionBudget(rpn_nms_tile=args.nms_tile)
    cfg = DetectorConfig(compute_dtype="bfloat16", **kw)
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainingConfig(), steps_per_epoch=1000)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    b, g = args.batch, 64
    images = jnp.asarray(rng.uniform(0, 1, (b, 3, 224, 224)), jnp.float32)
    bx = rng.uniform(10, 100, (b, g, 4)).astype(np.float32)
    bx[..., 2:] += bx[..., :2]
    gt_boxes = jnp.asarray(np.clip(bx, 0, 224))
    gt_labels = jnp.asarray(rng.integers(1, 6, (b, g)), jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(size=(b, g)) < 0.3)
    anchors, counts = _anchors(cfg)

    def key_of(i):
        return jax.random.fold_in(jax.random.PRNGKey(7), i)

    # ---- cumulative forward stages --------------------------------------
    def s_trunk(params, images, i):
        feats, ob, dl = _run_trunk(params, images, cfg)
        return ob

    def s_rpn_loss(params, images, i):
        feats, ob, dl = _run_trunk(params, images, cfg)
        lo, lb = rpn_mod.rpn_loss(
            ob, dl, anchors, gt_boxes, gt_valid, cfg.budget, key_of(i)
        )
        return lo + lb

    def s_proposals(params, images, i):
        feats, ob, dl = _run_trunk(params, images, cfg)
        props = rpn_mod.filter_proposals(
            ob, dl, anchors, counts, (224, 224), cfg.budget, training=True
        )
        return props.boxes

    def s_samples(params, images, i):
        feats, ob, dl = _run_trunk(params, images, cfg)
        props = rpn_mod.filter_proposals(
            ob, dl, anchors, counts, (224, 224), cfg.budget, training=True
        )
        keys = jax.random.split(key_of(i), b)
        samples = jax.vmap(
            lambda p, v, gb, gl, gv, k: select_training_samples_single(
                p, v, gb, gl, gv, cfg.budget, k
            )
        )(props.boxes, props.valid, gt_boxes, gt_labels, gt_valid, keys)
        return samples.rois

    def s_pool(params, images, i):
        feats, ob, dl = _run_trunk(params, images, cfg)
        props = rpn_mod.filter_proposals(
            ob, dl, anchors, counts, (224, 224), cfg.budget, training=True
        )
        keys = jax.random.split(key_of(i), b)
        samples = jax.vmap(
            lambda p, v, gb, gl, gv, k: select_training_samples_single(
                p, v, gb, gl, gv, cfg.budget, k
            )
        )(props.boxes, props.valid, gt_boxes, gt_labels, gt_valid, keys)
        logits, deltas = _pool_and_predict(
            params, feats, samples.rois, samples.valid, cfg
        )
        return logits

    def s_full_fwd(params, images, i):
        losses = detector_loss(
            params, key_of(i), images, gt_boxes, gt_labels, gt_valid, cfg
        )
        return sum(losses.values())

    def tree_sum(t):
        # consume EVERY leaf so no weight-gradient / optimizer computation
        # is dead-code-eliminated (summing only one leaf lets XLA drop the
        # dW matmuls of all other layers — roughly half the backward)
        return sum(
            leaf.astype(jnp.float32).sum() for leaf in jax.tree_util.tree_leaves(t)
        )

    def s_fwd_bwd(params, images, i):
        def total(p):
            return sum(
                detector_loss(
                    p, key_of(i), images, gt_boxes, gt_labels, gt_valid, cfg
                ).values()
            )

        loss, grads = jax.value_and_grad(total)(params)
        return loss + tree_sum(grads)

    def s_train_step(params, images, i):
        def total(p):
            return sum(
                detector_loss(
                    p, key_of(i), images, gt_boxes, gt_labels, gt_valid, cfg
                ).values()
            )

        loss, grads = jax.value_and_grad(total)(params)
        updates, _ = tx.update(grads, opt_state, params)
        new = optax.apply_updates(params, updates)
        return loss + tree_sum(new)

    stages = [
        ("trunk fwd (backbone+FPN+rpn head)", s_trunk),
        ("+ rpn loss (match/sample)", s_rpn_loss),
        ("+ filter_proposals (decode+NMS)", s_proposals),
        ("+ select_training_samples", s_samples),
        ("+ RoIAlign + box head/predictor", s_pool),
        ("full fwd (+ losses)", s_full_fwd),
        ("fwd + bwd", s_fwd_bwd),
        ("train step (+AdamW)", s_train_step),
    ]
    rows = []
    prev = 0.0
    for name, fn in stages:
        ms = timed(fn, params, images, steps=args.steps)
        rows.append((name, ms, ms - prev))
        prev = ms
        print(f"{name:42s} {ms:8.2f} ms  (+{rows[-1][2]:6.2f})", flush=True)

    total = rows[-1][1]
    print(f"\n=> {args.batch / total * 1000:.1f} img/s/chip "
          f"(attn={cfg.attention_impl}, roi={cfg.roi_impl})")

    if args.write:
        out = ["# Train-step stage table (v5e, bs16 bf16 dit-base)\n",
               "Cumulative jit-internal timings; delta = stage cost. "
               f"attn={cfg.attention_impl}, roi={cfg.roi_impl}.\n",
               "| stage | cumulative ms | delta ms |", "|---|---|---|"]
        for name, ms, d in rows:
            out.append(f"| {name} | {ms:.2f} | {d:+.2f} |")
        out.append(f"\n**{args.batch / total * 1000:.1f} img/s/chip**\n")
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", "PERF_STAGES.md"), "w") as f:
            f.write("\n".join(out))


if __name__ == "__main__":
    main()
