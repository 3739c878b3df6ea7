"""Profile the REAL train step (bench.py methodology: scan-carried params)
and print a per-op / per-stage time breakdown from the XPlane trace.

Usage: python scripts/trace_step.py [--steps 10] [--batch 16] [--top 40]
                                    [--attn xla|pallas] [--roi xla|pallas]
"""

from __future__ import annotations

import argparse
import glob
import gzip
import os
import re
import time
from collections import defaultdict

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


def build_step(cfg, tx, gt):
    gt_boxes, gt_labels, gt_valid = gt

    def one_step(carry, key):
        params, opt_state, images = carry

        def total(p):
            return sum(
                detector_loss(
                    p, key, images, gt_boxes, gt_labels, gt_valid, cfg
                ).values()
            )

        loss, grads = jax.value_and_grad(total)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, images), loss

    from functools import partial

    @partial(jax.jit, static_argnums=4)
    def run(params, opt_state, images, key, steps):
        keys = jax.random.split(key, steps)
        (params, opt_state, _), losses = jax.lax.scan(
            one_step, (params, opt_state, images), keys,
            unroll=int(os.environ.get("BENCH_UNROLL", "1")),
        )
        return losses

    return run


def parse_xplane(logdir: str, top: int, steps: int) -> None:
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    paths = glob.glob(os.path.join(logdir, "**", "*.xplane.pb"), recursive=True)
    if not paths:
        print("no xplane found in", logdir)
        return
    xspace = xplane_pb2.XSpace()
    with open(max(paths, key=os.path.getmtime), "rb") as f:
        xspace.ParseFromString(f.read())

    for plane in xspace.planes:
        if "TPU" not in plane.name and "Device" not in plane.name:
            continue
        ev_meta = plane.event_metadata
        total_by_name: dict[str, float] = defaultdict(float)
        count_by_name: dict[str, int] = defaultdict(int)
        plane_total = 0.0
        for line in plane.lines:
            lname = line.name.lower()
            # per-op HLO events live on the "XLA Ops" line
            if "xla ops" not in lname:
                continue
            # Self-time accounting: events nest (while/scan spans contain
            # their body; async copy-start spans contain overlapped compute).
            # Subtract each event's children via an interval stack so
            # exclusive times sum to the wall total.
            evs = sorted(
                (
                    (ev.offset_ps, ev.offset_ps + ev.duration_ps,
                     ev_meta[ev.metadata_id].name)
                    for ev in line.events
                ),
                key=lambda t: (t[0], -t[1]),
            )
            stack: list[list] = []  # [start, end, name, child_time]
            def pop_to(t):
                nonlocal plane_total
                while stack and stack[-1][1] <= t:
                    s, e, nm, child = stack.pop()
                    self_ms = (e - s - child) / 1e9
                    total_by_name[nm] += self_ms
                    count_by_name[nm] += 1
                    plane_total += self_ms
                    if stack:
                        stack[-1][3] += e - s
            for s, e, nm in evs:
                pop_to(s)
                stack.append([s, e, nm, 0])
            pop_to(float("inf"))
        if not total_by_name:
            continue
        print(f"\n=== {plane.name}: {plane_total:.2f} ms on-device total, "
              f"{plane_total / steps:.2f} ms/step ===")
        items = sorted(total_by_name.items(), key=lambda kv: -kv[1])
        print(f"{'ms/step':>9} {'%':>6} {'count':>6}  op")
        for name, ms in items[:top]:
            print(f"{ms / steps:9.3f} {ms / plane_total * 100:6.1f} "
                  f"{count_by_name[name]:6d}  {name[:110]}")
        # rough stage grouping by common substrings
        groups = {
            "attention/matmul (dot/conv)": r"^(fusion.*)?(dot|conv)",
            "fusion (elementwise etc.)": r"^(loop_)?fusion",
            "copy/transpose/reshape": r"copy|transpose|bitcast|reshape",
            "sort/top-k": r"sort|top-k",
            "while (NMS etc.)": r"while",
            "scatter/gather": r"scatter|gather|dynamic",
        }
        print("  -- grouped:")
        for gname, pat in groups.items():
            tot = sum(ms for n, ms in items if re.search(pat, n))
            print(f"    {gname:34s} {tot / steps:8.3f} ms/step "
                  f"({tot / plane_total * 100:.1f}%)")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--top", type=int, default=40)
    ap.add_argument("--attn", default=None)
    ap.add_argument("--roi", default=None)
    ap.add_argument("--logdir", default="/tmp/ld_trace")
    args = ap.parse_args()

    kw = {}
    if args.attn:
        kw["attention_impl"] = args.attn
    if args.roi:
        kw["roi_impl"] = args.roi
    cfg = DetectorConfig(compute_dtype="bfloat16", **kw)
    params = init_detector_params(jax.random.PRNGKey(0), cfg)
    tx = make_optimizer(TrainingConfig(), steps_per_epoch=1000)
    opt_state = tx.init(params)

    rng = np.random.default_rng(0)
    b, g = args.batch, 64
    images = jnp.asarray(rng.uniform(0, 1, (b, 3, 224, 224)), jnp.float32)
    bx = rng.uniform(10, 100, (b, g, 4)).astype(np.float32)
    bx[..., 2:] += bx[..., :2]
    gt = (
        jnp.asarray(np.clip(bx, 0, 224)),
        jnp.asarray(rng.integers(1, 6, (b, g)), jnp.int32),
        jnp.asarray(rng.uniform(size=(b, g)) < 0.3),
    )

    run = build_step(cfg, tx, gt)
    losses = run(params, opt_state, images, jax.random.PRNGKey(1), args.steps)
    np.asarray(losses)  # compile + warmup

    t0 = time.time()
    np.asarray(run(params, opt_state, images, jax.random.PRNGKey(2), args.steps))
    dt = time.time() - t0
    print(f"wall: {dt / args.steps * 1000:.2f} ms/step -> "
          f"{args.batch * args.steps / dt:.1f} img/s/chip")

    with jax.profiler.trace(args.logdir):
        np.asarray(
            run(params, opt_state, images, jax.random.PRNGKey(3), args.steps)
        )
    parse_xplane(args.logdir, args.top, args.steps)


if __name__ == "__main__":
    main()
