"""Single-stage (RetinaNet / FCOS) throughput on the real chip.

Same single-dispatch, DCE-proof methodology as bench.py / bench_cascade.py
(whole loop in one jit, final carry returned, args donated, min-of-N
timed dispatches). Run: ``python scripts/bench_retinanet.py``; set
``BENCH_DETECTOR=fcos`` for the anchor-free family.

Env knobs: BENCH_DETECTOR ("retinanet"|"fcos"), BENCH_BATCH (16),
BENCH_STEPS (10), BENCH_LEVELS ("1,2,3,4" — pyramid subset the head
runs on; "0,1,2,3,4" adds the stride-4 p2 level).
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

    import functools

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
    detector = os.environ.get("BENCH_DETECTOR", "retinanet")
    levels = tuple(
        int(x) for x in os.environ.get("BENCH_LEVELS", "1,2,3,4").split(",")
    )

    cfg = DetectorConfig(
        compute_dtype="bfloat16", detector_kind=detector,
        retinanet_levels=levels, fcos_levels=levels,
    )
    # ONE jitted dispatch: eager init is hundreds of tiny RNG programs,
    # each paying the tunnel's 20-40 s fresh-executable load
    params = jax.jit(lambda k: init_detector_params(k, cfg))(
        jax.random.PRNGKey(0)
    )
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

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run_train(params, opt_state, key):
        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys, unroll=unroll
        )
        # final carry returned: the last step's bwd+AdamW must survive DCE
        return params, opt_state, losses

    @jax.jit
    def run_infer(params, x):
        def body(i, acc):
            dets = detector_predict(params, x + acc * 1e-9, cfg)
            return acc + dets.scores.sum()

        return jax.lax.fori_loop(0, steps, body, 0.0)

    for k in (1, 11):  # per-executable tunnel warm-up
        params, opt_state, losses = run_train(params, opt_state, jax.random.PRNGKey(k))
        _ = np.asarray(losses)
    dts, finals = [], []
    for k in (2, 3, 5):
        t0 = time.time()
        params, opt_state, losses = run_train(params, opt_state, jax.random.PRNGKey(k))
        finals.append(float(np.asarray(losses)[-1]))
        dts.append(time.time() - t0)
    train_ips = batch * steps / min(dts)
    assert np.isfinite(finals).all(), finals

    _ = float(run_infer(params, images))  # compile + warm
    _ = float(run_infer(params, images))
    its = []
    for _i in range(3):
        t0 = time.time()
        _ = float(run_infer(params, images))
        its.append(time.time() - t0)
    infer_ips = batch * steps / min(its)

    print(
        json.dumps(
            {
                "metric": f"{detector}_dit_base_throughput",
                "train_img_per_s": round(train_ips, 1),
                "infer_img_per_s": round(infer_ips, 1),
                "unit": "images/sec/chip",
                "levels": list(levels),
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
