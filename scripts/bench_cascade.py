"""Cascade-head throughput on the real chip: train + inference img/s.

Same single-dispatch methodology as bench.py (whole loop inside one jit,
one fetch at the end) applied to the 3-stage cascade detector
(BASELINE config #3). Run: ``python scripts/bench_cascade.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")


def main() -> None:
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import optax

    from layoutdit_tpu.config.constructs import TrainingConfig
    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        detector_loss,
        detector_predict,
        init_detector_params,
    )
    from layoutdit_tpu.train.trainer import make_optimizer

    batch = int(os.environ.get("BENCH_BATCH", 16))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    unroll = int(os.environ.get("BENCH_UNROLL", steps))

    cfg = DetectorConfig(
        compute_dtype="bfloat16", cascade_iou_threshs=(0.5, 0.6, 0.7)
    )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainingConfig(), steps_per_epoch=1000)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    g = 64
    images = jnp.asarray(rng.uniform(0, 1, (batch, 3, 224, 224)), jnp.float32)
    boxes = rng.uniform(10, 100, (batch, g, 4)).astype(np.float32)
    boxes[..., 2:] += boxes[..., :2]
    gt_boxes = jnp.asarray(np.clip(boxes, 0, 224))
    gt_labels = jnp.asarray(rng.integers(1, 6, (batch, g)), jnp.int32)
    gt_valid = jnp.asarray(rng.uniform(size=(batch, g)) < 0.3)

    def one_step(carry, key):
        params, opt_state = carry

        def total(p):
            return sum(
                detector_loss(
                    p, key, images, gt_boxes, gt_labels, gt_valid, cfg
                ).values()
            )

        loss, grads = jax.value_and_grad(total)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), loss

    @jax.jit
    def run_train(params, opt_state, key):
        keys = jax.random.split(key, steps)
        (_, _), losses = jax.lax.scan(
            one_step, (params, opt_state), keys, unroll=unroll
        )
        return losses

    @jax.jit
    def run_infer(params, x):
        # tiny data dependency between iterations defeats hoisting/DCE
        def body(i, acc):
            dets = detector_predict(params, x + acc * 1e-9, cfg)
            return acc + dets.scores.sum()

        return jax.lax.fori_loop(0, steps, body, 0.0)

    losses = run_train(params, opt_state, jax.random.PRNGKey(1))
    _ = np.asarray(losses)
    t0 = time.time()
    losses = run_train(params, opt_state, jax.random.PRNGKey(2))
    final = float(np.asarray(losses)[-1])
    train_ips = batch * steps / (time.time() - t0)
    assert np.isfinite(final)

    acc = run_infer(params, images)
    _ = float(acc)
    t0 = time.time()
    acc = run_infer(params, images)
    _ = float(acc)
    infer_ips = batch * steps / (time.time() - t0)

    print(
        json.dumps(
            {
                "metric": "cascade_dit_base_throughput",
                "train_img_per_s": round(train_ips, 1),
                "infer_img_per_s": round(infer_ips, 1),
                "unit": "images/sec/chip",
                "stages": 3,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
