"""DETR throughput on the real chip: train + inference img/s.

Same methodology as bench.py (whole loop in one jit, carry returned,
donated state threaded call-to-call, min over timed calls) applied to
the DETR set-prediction family (models/detection/detr.py): dit-base
encoder + 6-layer/256-dim decoder over 100 queries, with the exact
on-device Hungarian match (ops/matching.py) inside the jitted train
step. Inference has no NMS stage at all — every query is a detection.
Run: ``python scripts/bench_detr.py``.
"""

from __future__ import annotations

import functools
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
    # Matcher-share knobs (PERF_STAGES.md "DETR matcher" decomposition):
    # BENCH_SHARED=1 -> final-layer-only matching shared across aux
    # losses; BENCH_G -> padded gt slots (the JV solve is O(G) depth).
    shared = os.environ.get("BENCH_SHARED", "0") == "1"
    g = int(os.environ.get("BENCH_G", 64))  # <= detr_num_queries=100

    cfg = DetectorConfig(
        compute_dtype="bfloat16", detector_kind="detr",
        detr_shared_matching=shared,
    )
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainingConfig(), steps_per_epoch=1000)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
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

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_train(params, opt_state, key):
        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys, unroll=unroll
        )
        # final carry returned: see bench.py's DCE retraction
        return params, opt_state, losses

    @jax.jit
    def run_infer(params, x):
        # data dependency between iterations defeats hoisting
        def body(i, acc):
            dets = detector_predict(params, x + acc * 1e-9, cfg)
            return acc + dets.scores.sum()

        return jax.lax.fori_loop(0, steps, body, 0.0)

    for k in (1, 11):  # compile + tunnel per-executable warm-up
        params, opt_state, losses = run_train(
            params, opt_state, jax.random.PRNGKey(k)
        )
        _ = np.asarray(losses)
    dts, finals = [], []
    for k in (2, 3, 5):
        t0 = time.time()
        params, opt_state, losses = run_train(
            params, opt_state, jax.random.PRNGKey(k)
        )
        finals.append(float(np.asarray(losses)[-1]))
        dts.append(time.time() - t0)
    train_ips = batch * steps / min(dts)
    assert np.isfinite(finals).all(), finals

    for _ in range(2):
        _ = float(run_infer(params, images))
    dts_i = []
    for _ in range(3):
        t0 = time.time()
        _ = float(run_infer(params, images))
        dts_i.append(time.time() - t0)
    infer_ips = batch * steps / min(dts_i)

    print(
        json.dumps(
            {
                "metric": "detr_dit_base_throughput",
                "train_img_per_s": round(train_ips, 1),
                "infer_img_per_s": round(infer_ips, 1),
                "unit": "images/sec/chip",
                "num_queries": cfg.detr_num_queries,
                "decoder_layers": cfg.detr_layers,
                "padded_gt": g,
                "shared_matching": shared,
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
