"""Benchmark: PubLayNet train throughput (images/sec/chip), dit-base.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "images/sec/chip", "vs_baseline": N}

Methodology (see memory: axon tunnel quirks): the whole measurement loop
runs inside a single jit (lax.scan over train steps carrying params +
optimizer state) so per-dispatch tunnel latency (~30-50 ms/call here)
cannot pollute the number; one host fetch at the end. The reference
publishes no numbers (BASELINE.md), so vs_baseline is reported against
the recorded round-1 figure of this framework itself (BASELINE_BENCH
below) — >1.0 means faster than round 1.
"""

from __future__ import annotations

import json
import os
import sys
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

# Round-1 recorded value for this metric on a single v5e chip
# (dit-base, bs16, bf16, full Faster R-CNN train step incl. optimizer) —
# BENCH_r01.json. The reference publishes NO numbers (BASELINE.md), so
# vs_baseline tracks this framework's own round-1 figure: >1.0 = faster
# than round 1, not "faster than the PyTorch reference".
BASELINE_BENCH = 225.88  # images/sec/chip (BENCH_r01.json)


def main() -> None:
    import threading

    # Device-init watchdog: the axon tunnel's failure mode is jax.devices()
    # hanging forever (observed 2026-08-18, >150 s with no error). A hung
    # bench stalls the whole driver at round end — fail fast and loudly
    # instead. Only guards backend init; once devices enumerate, the run
    # itself makes progress.
    _devices_up = threading.Event()
    _timeout_s = float(os.environ.get("BENCH_DEVICE_TIMEOUT", "600"))

    def _watchdog() -> None:
        if not _devices_up.wait(_timeout_s):
            print(
                f"bench: TPU backend init did not complete within "
                f"{_timeout_s:.0f}s (tunnel down?) — aborting",
                file=sys.stderr,
                flush=True,
            )
            os._exit(3)

    threading.Thread(target=_watchdog, daemon=True).start()

    import jax

    jax.devices()  # force backend init under the watchdog
    _devices_up.set()

    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np
    import optax

    from layoutdit_tpu.models.detection.detector import (
        DetectorConfig,
        detector_loss,
        init_detector_params,
    )
    from layoutdit_tpu.train.trainer import make_optimizer
    from layoutdit_tpu.config.constructs import TrainingConfig

    batch = int(os.environ.get("BENCH_BATCH", 16))
    steps = int(os.environ.get("BENCH_STEPS", 10))
    # scan unroll: chains N step bodies per scan iteration so XLA keeps
    # carried params in compute-friendly layouts across them instead of
    # round-tripping the canonical carry layout every step (the trace
    # showed ~5 ms/step of param copy-starts at unroll=1). The old sweep
    # (336.9/343.5/362.9 at unroll 1/5/10) predates the dropped-carry DCE
    # fix below and overstates the high-unroll end. Full unroll is still
    # real sequential training — params chain step to step.
    unroll = int(os.environ.get("BENCH_UNROLL", steps))

    cfg = DetectorConfig(compute_dtype="bfloat16")
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

    import functools

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def run(params, opt_state, key):
        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys, unroll=unroll
        )
        # The final carry MUST be a jit output: with it unused, the LAST
        # step's backward + AdamW update feed nothing and XLA dead-code-
        # eliminates them (~1/steps of bwd+opt work — measured ~4-9%
        # inflation; the retracted pre-fix headline was 370.7). Donated
        # inputs + state threaded call-to-call below = the trainer's
        # exact dispatch semantics (no output copy, buffers alias).
        return params, opt_state, losses

    # compile + warmup (excluded from timing). TWO warm-up calls: the
    # axon tunnel's remote program load can slow the first ~2 invocations
    # of a fresh executable (memory: per-executable warm-up), and a spare
    # steady-state call costs <1 s.
    for k in (1, 11):
        params, opt_state, losses = run(params, opt_state, jax.random.PRNGKey(k))
        _ = np.asarray(losses)

    # min over several timed calls: a single ~0.45 s dispatch rides one
    # tunnel round trip (20-50 ms here, run-to-run), which alone swings a
    # one-shot reading by ±5%. The min of 5 approaches the true device
    # time at < 3 s extra cost; on a local backend (~0.1 ms dispatch) the
    # 5 calls agree to noise. State threads run-to-run (donated), so the
    # whole session is one continuous 70-step training trajectory.
    dts = []
    finals = []
    for k in (2, 3, 5, 7, 13):
        t0 = time.time()
        params, opt_state, losses = run(params, opt_state, jax.random.PRNGKey(k))
        finals.append(float(np.asarray(losses)[-1]))  # forces completion
        dts.append(time.time() - t0)

    imgs_per_sec = batch * steps / min(dts)
    # every timed run must be finite — min(dts) may come from any of them
    assert np.isfinite(finals).all(), f"train loss diverged during bench: {finals}"
    print(
        json.dumps(
            {
                "metric": "publaynet_dit_base_train_throughput",
                "value": round(imgs_per_sec, 2),
                "unit": "images/sec/chip",
                "vs_baseline": round(imgs_per_sec / BASELINE_BENCH, 3),
                # the reference publishes NO throughput numbers
                # (BASELINE.md), so the denominator is this framework's
                # own round-1 figure — self-describing so BENCH_r*.json
                # readers don't need bench.py's comments:
                "baseline_is": "this framework's round-1 figure "
                               f"({BASELINE_BENCH} img/s/chip); the PyTorch "
                               "reference publishes no numbers",
            }
        )
    )


if __name__ == "__main__":
    sys.exit(main())
