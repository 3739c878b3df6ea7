"""High-res TRAINING on one chip: remat x grad-accum at 1024 px.

The serving story at 1024 px is measured (PERF_STAGES.md); this measures
the training side the new levers unlock: dit-base at 1024 px (4097
tokens, flash attention auto-selected) with
  * remat off/on  (ModelConfig.remat -> jax.checkpoint per encoder layer)
  * micro-batching (bench-local grad accumulation, same semantics as
    TrainingConfig.grad_accumulation_steps)
reporting img/s and whether the config fits HBM at all. bench.py
methodology: N steps chained in one jit scan, single fetch.

Usage: python scripts/bench_highres_train.py [--size 1024] [--batch 4]
       [--accum 1] [--remat] [--steps 6]
"""

from __future__ import annotations

import argparse
import dataclasses
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from layoutdit_tpu.config.constructs import TrainingConfig  # noqa: E402
from layoutdit_tpu.models.detection.detector import (  # noqa: E402
    DetectorConfig,
    detector_loss,
    init_detector_params,
)
from layoutdit_tpu.train.trainer import make_optimizer  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=1024)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--accum", type=int, default=1)
    ap.add_argument("--remat", action="store_true")
    ap.add_argument("--remat-policy", default="full", choices=["full", "dots"])
    # ViTDet-style windowed attention (models/vit.py): non-global layers
    # attend in WxW patch windows; 0 = full attention everywhere.
    ap.add_argument("--window", type=int, default=0)
    ap.add_argument("--steps", type=int, default=6)
    # unroll=1: at 1024 px the step is ~100x the scan-carry copy cost
    # that motivated full unroll at 224 px (bench.py), and unrolling a
    # 4k-token fwd+bwd graph 6x makes XLA compiles run past 10 min.
    ap.add_argument("--unroll", type=int, default=1)
    args = ap.parse_args()
    assert args.batch % args.accum == 0

    cfg = DetectorConfig(
        compute_dtype="bfloat16", image_size=args.size, remat=args.remat,
        remat_policy=args.remat_policy,
    )
    if args.window:
        cfg = dataclasses.replace(
            cfg,
            backbone=dataclasses.replace(
                cfg.backbone,
                vit=dataclasses.replace(
                    cfg.backbone.vit, window_size=args.window
                ),
            ),
        )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainingConfig(), steps_per_epoch=1000)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    g = 64
    b, s = args.batch, args.size
    images = jnp.asarray(rng.uniform(0, 1, (b, 3, s, s)), jnp.float32)
    boxes = rng.uniform(10, s // 2, (b, g, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    gt_boxes = jnp.asarray(np.clip(boxes, 0, s))
    gt_labels = jnp.asarray(rng.integers(1, 6, (b, g)), jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(size=(b, g)) < 0.3)

    accum = args.accum
    mb = b // accum

    def split(x):
        return x.reshape(accum, mb, *x.shape[1:])

    micro = tuple(split(x) for x in (images, gt_boxes, gt_labels, gt_valid))

    def one_step(carry, key):
        params, opt_state = carry

        def loss_fn(p, r, im, bx, lb, vd):
            return sum(detector_loss(p, r, im, bx, lb, vd, cfg).values())

        if accum == 1:
            loss, grads = jax.value_and_grad(loss_fn)(
                params, key, images, gt_boxes, gt_labels, gt_valid
            )
        else:
            keys = jax.random.split(key, accum)

            def body(acc, xs):
                g_acc, l_acc = acc
                l, g = jax.value_and_grad(loss_fn)(params, xs[0], *xs[1:])
                return (
                    jax.tree_util.tree_map(
                        lambda a, x: a + x.astype(jnp.float32), g_acc, g
                    ),
                    l_acc + l,
                ), None

            zeros = jax.tree_util.tree_map(
                lambda p: jnp.zeros(p.shape, jnp.float32), params
            )
            (g_sum, l_sum), _ = jax.lax.scan(body, (zeros, 0.0), (keys, *micro))
            grads = jax.tree_util.tree_map(lambda x: x / accum, g_sum)
            loss = l_sum / accum
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, key):
        keys = jax.random.split(key, args.steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys, unroll=args.unroll
        )
        # Final carry MUST be a jit output (bench.py's DCE fix): unused,
        # it frees XLA to drop the last step's bwd+opt (fully at high
        # unroll; layout freedoms even rolled) and breaks the real
        # trainer's dispatch semantics. Donation keeps 1024-px HBM flat.
        return params, opt_state, losses

    for k in (1, 2):  # compile + axon per-executable warm-up
        params, opt_state, losses = run(params, opt_state, jax.random.PRNGKey(k))
        _ = np.asarray(losses)
    dts, finals = [], []
    for k in (3, 5, 7):
        t0 = time.time()
        params, opt_state, losses = run(params, opt_state, jax.random.PRNGKey(k))
        finals.append(float(np.asarray(losses)[-1]))
        dts.append(time.time() - t0)
    dt = min(dts)
    assert np.isfinite(finals).all(), finals
    remat_desc = f"{args.remat}" + (
        f"/{args.remat_policy}" if args.remat else ""
    )
    win_desc = f" window={args.window}" if args.window else ""
    print(
        f"train {s}px bs{b} accum={accum} remat={remat_desc}{win_desc}: "
        f"{b * args.steps / dt:.2f} img/s ({dt * 1e3 / args.steps:.0f} ms/step)"
    )


if __name__ == "__main__":
    main()
