"""Probe: XLA-chosen (AUTO) layouts for carried train state vs canonical.

The bench-DCE retraction (PERF_STAGES.md, round 4) showed ~5-9% of the
step goes to the canonical-layout round trip of carried params/opt
state at dispatch boundaries: a jitted train step must RETURN its carry,
and default jit pins inputs/outputs to canonical layouts, so XLA
re-lays-out 86M params every step even when a compute-friendlier layout
exists. ``jax.experimental.layout.Format(Layout.AUTO)`` lets XLA pick
the boundary layouts instead; state device_put once into the compiled
executable's chosen input formats then threads call-to-call with zero
relayouts (outputs come back in the matching formats).

Measures the EXACT bench.py loop (10-step scan, full unroll, donated,
carry returned) in both modes on the chip. If AUTO wins, bench.py and
the trainer adopt it.

Usage: python scripts/probe_auto_layout.py
"""

from __future__ import annotations

import functools
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
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_loss,
    init_detector_params,
)
from layoutdit_tpu.train.trainer import make_optimizer


def main() -> None:
    batch, steps = 16, 10
    cfg = DetectorConfig(compute_dtype="bfloat16")
    params0 = init_detector_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainingConfig(), steps_per_epoch=1000)
    opt0 = tx.init(params0)

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

    def run(params, opt_state, key):
        keys = jax.random.split(key, steps)
        (params, opt_state), losses = jax.lax.scan(
            one_step, (params, opt_state), keys, unroll=steps
        )
        return params, opt_state, losses

    def measure(tag, jitted, params, opt_state):
        for k in (1, 11):  # compile + warm
            params, opt_state, losses = jitted(
                params, opt_state, jax.random.PRNGKey(k)
            )
            np.asarray(losses)
        dts = []
        for k in (2, 3, 5, 7, 13):
            t0 = time.time()
            params, opt_state, losses = jitted(
                params, opt_state, jax.random.PRNGKey(k)
            )
            final = float(np.asarray(losses)[-1])
            dts.append(time.time() - t0)
        assert np.isfinite(final)
        ips = batch * steps / min(dts)
        print(f"{tag}: {ips:.1f} img/s (min {min(dts)*1e3:.1f} ms/run)",
              flush=True)
        return ips

    # -- canonical layouts (today's bench/trainer semantics)
    canon = jax.jit(run, donate_argnums=(0, 1))
    p = jax.tree_util.tree_map(lambda x: x * 1, params0)
    o = jax.tree_util.tree_map(lambda x: x * 1, opt0)
    base = measure("canonical", canon, p, o)

    # -- AUTO layouts for the carried state
    from jax.experimental.layout import Format, Layout

    AUTO = Format(Layout.AUTO)
    auto_jit = jax.jit(
        run,
        in_shardings=(
            jax.tree_util.tree_map(lambda _: AUTO, params0),
            jax.tree_util.tree_map(lambda _: AUTO, opt0),
            None,
        ),
        out_shardings=(
            jax.tree_util.tree_map(lambda _: AUTO, params0),
            jax.tree_util.tree_map(lambda _: AUTO, opt0),
            None,
        ),
        donate_argnums=(0, 1),
    )
    compiled = auto_jit.lower(params0, opt0, jax.random.PRNGKey(0)).compile()
    in_fmt = compiled.input_formats[0]
    # place fresh state into the executable's chosen layouts ONCE
    p = jax.tree_util.tree_map(jax.device_put, params0, in_fmt[0])
    o = jax.tree_util.tree_map(jax.device_put, opt0, in_fmt[1])
    autov = measure("auto-layout", compiled, p, o)

    print(f"auto/canonical: {autov / base:.3f}x", flush=True)


if __name__ == "__main__":
    main()
