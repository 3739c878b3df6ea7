"""LoRA vs full fine-tune train throughput on one chip (dit-base 224px).

What LoRA buys at train time, beyond the optimizer-memory win:
  * frozen leaves enter the loss through stop_gradient (Trainer
    semantics, train/trainer.py), so XLA drops every frozen dW GEMM
    from the backward — roughly 1/3 of the encoder's backward FLOPs;
  * AdamW moments exist only for adapters + detection heads
    (optax.masked), shrinking the optimizer update's HBM stream.

bench.py methodology: steps chained in one jitted scan with the carry
returned and inputs donated (DCE-proof), min over repeated dispatches.

Usage: python scripts/bench_lora.py [--batch 16] [--steps 10] [--rank 16]
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from layoutdit_tpu.config.constructs import ModelConfig, TrainingConfig  # noqa: E402
from layoutdit_tpu.models.detection.detector import (  # noqa: E402
    DetectorConfig,
    detector_loss,
    init_detector_params,
)
from layoutdit_tpu.models.lora import num_trainable, trainable_mask  # noqa: E402
from layoutdit_tpu.train.trainer import make_optimizer  # noqa: E402


def bench(cfg, lora: bool, batch: int, steps: int) -> float:
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    mask_fn = trainable_mask if lora else None
    tx = make_optimizer(
        TrainingConfig(), steps_per_epoch=1000, trainable_mask_fn=mask_fn
    )
    opt_state = tx.init(params)
    freeze_mask = trainable_mask(params) if lora else None

    rng = np.random.default_rng(0)
    g, s = 64, cfg.image_size
    images = jnp.asarray(rng.uniform(0, 1, (batch, 3, s, s)), jnp.float32)
    boxes = rng.uniform(10, s // 2, (batch, g, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    gt_boxes = jnp.asarray(np.clip(boxes, 0, s))
    gt_labels = jnp.asarray(rng.integers(1, 6, (batch, g)), jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(size=(batch, g)) < 0.3)

    def loss_fn(p, r):
        if freeze_mask is not None:
            p = jax.tree_util.tree_map(
                lambda m, x: x if m else jax.lax.stop_gradient(x),
                freeze_mask, p,
            )
        return sum(
            detector_loss(
                p, r, images, gt_boxes, gt_labels, gt_valid, cfg
            ).values()
        )

    def one_step(carry, key):
        params, opt_state = carry
        loss, grads = jax.value_and_grad(loss_fn)(params, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, key):
        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys
        )
        return params, opt_state, losses

    for k in (1, 2):  # compile + per-executable warm-up
        params, opt_state, losses = run(params, opt_state, jax.random.PRNGKey(k))
        _ = np.asarray(losses)
    dts = []
    for k in (3, 5, 7, 9, 11):
        t0 = time.time()
        params, opt_state, losses = run(params, opt_state, jax.random.PRNGKey(k))
        final = float(np.asarray(losses)[-1])
        dts.append(time.time() - t0)
    assert np.isfinite(final), final
    dt = min(dts)
    n_train, n_total = num_trainable(params)
    mode = f"lora r={cfg.backbone.vit.lora_rank}" if lora else "full"
    print(
        f"{mode}: {batch * steps / dt:.2f} img/s "
        f"({dt * 1e3 / steps:.1f} ms/step, trainable "
        f"{100.0 * n_train / n_total:.1f}% of {n_total / 1e6:.1f}M)"
    )
    return batch * steps / dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--rank", type=int, default=16)
    args = ap.parse_args()

    full_cfg = DetectorConfig.from_model_config(
        ModelConfig(), precision_dtype="bfloat16"
    )
    lora_cfg = DetectorConfig.from_model_config(
        ModelConfig(lora_rank=args.rank), precision_dtype="bfloat16"
    )
    full = bench(full_cfg, lora=False, batch=args.batch, steps=args.steps)
    fast = bench(lora_cfg, lora=True, batch=args.batch, steps=args.steps)
    print(f"lora speedup: {fast / full:.3f}x")


if __name__ == "__main__":
    main()
