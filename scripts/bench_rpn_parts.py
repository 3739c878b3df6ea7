"""Component-level timing of rpn_loss and filter_proposals at production
shapes (bs16, 12543 anchors, dit-base grid) — finds where the ~5.1 ms of
serial detection logic actually goes (VERDICT r3 item 1a).

Run: python scripts/bench_rpn_parts.py [--iters 50]
"""

from __future__ import annotations

import argparse
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

from layoutdit_tpu.config.constructs import DetectionBudget
from layoutdit_tpu.models.detection import rpn as rpn_mod
from layoutdit_tpu.ops.boxes import box_iou, encode_boxes

B = 16
N = 12543
G = 128
LEVEL_COUNTS = (9408, 2352, 588, 147, 48)


def timed(fn, args, iters=50, name=""):
    @jax.jit
    def loop(args):
        def body(i, carry):
            pert = args[0] + carry.astype(args[0].dtype) * 1e-12
            o = fn(pert, *args[1:])
            leaf = jax.tree_util.tree_leaves(o)[0]
            return carry + leaf.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    try:
        jax.block_until_ready(loop(args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:42s} FAILED: {type(e).__name__}: {str(e)[:200]}")
        return
    t0 = time.perf_counter()
    jax.block_until_ready(loop(args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:7.3f} ms")
    return dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    it = args.iters
    budget = DetectionBudget()
    rng = np.random.default_rng(0)

    objectness = jnp.asarray(rng.standard_normal((B, N)), jnp.float32)
    deltas = jnp.asarray(rng.standard_normal((B, N, 4)) * 0.1, jnp.float32)
    anchors = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 200, (N, 2)), rng.uniform(8, 64, (N, 2))], axis=1
        ).astype(np.float32)
    )
    anchors = anchors.at[:, 2:].set(anchors[:, :2] + anchors[:, 2:])
    gt = jnp.asarray(
        np.concatenate(
            [rng.uniform(0, 150, (B, G, 2)), rng.uniform(10, 70, (B, G, 2))],
            axis=2,
        ).astype(np.float32)
    )
    gt = gt.at[..., 2:].set(gt[..., :2] + gt[..., 2:])
    gt_valid = jnp.asarray(rng.random((B, G)) < 0.1)
    key = jax.random.PRNGKey(0)

    # ---------------- rpn_loss components ----------------
    timed(
        lambda ob: rpn_mod.rpn_loss(
            ob, deltas, anchors, gt, gt_valid, budget, key
        ),
        (objectness,), it, "rpn_loss (full)",
    )
    timed(
        lambda gtb: jax.vmap(lambda g: box_iou(g, anchors))(gtb),
        (gt,), it, "  box_iou [B,G,N]",
    )
    timed(
        lambda gtb: jax.vmap(
            lambda g, v: rpn_mod.match_anchors_to_gt(
                anchors, g, v, 0.7, 0.3, True
            )
        )(gtb, gt_valid),
        (gt,), it, "  match_anchors_to_gt",
    )

    labels = jnp.asarray(rng.integers(-1, 2, (B, N)), jnp.int32)
    keys = jax.random.split(key, B)
    timed(
        lambda lb: jax.vmap(
            lambda l, k: rpn_mod.balanced_sample(l, k, 256, 0.5)
        )(lb, keys),
        (labels,), it, "  balanced_sample (2x top_k)",
    )
    timed(
        lambda gtb: jax.vmap(
            lambda g: encode_boxes(jnp.broadcast_to(g[:1], (N, 4)), anchors)
        )(gtb),
        (gt,), it, "  encode_boxes [B,N,4]",
    )

    # top_k alone at sampler sizes
    pri = jnp.asarray(rng.random((B, N)), jnp.float32)
    timed(lambda p: jax.vmap(lambda x: jax.lax.top_k(x, 256)[1])(p),
          (pri,), it, "  lax.top_k(N=12543, k=256) x B")
    timed(lambda p: jax.vmap(
        lambda x: jax.lax.approx_max_k(x, 256, recall_target=0.95)[1])(p),
          (pri,), it, "  approx_max_k(N=12543, k=256) x B")
    timed(lambda p: jax.vmap(lambda x: jnp.argsort(-x))(p),
          (pri,), it, "  full argsort(N=12543) x B")

    # ---------------- filter_proposals components ----------------
    timed(
        lambda ob: rpn_mod.filter_proposals(
            ob, deltas, anchors, LEVEL_COUNTS, (224, 224), budget, True
        ),
        (objectness,), it, "filter_proposals (full, train)",
    )
    timed(
        lambda ob: jax.vmap(
            lambda o, d: rpn_mod._per_level_topk(
                o, d, anchors, LEVEL_COUNTS, 2000
            )
        )(ob, deltas),
        (objectness,), it, "  per-level top-k",
    )
    o2 = jnp.asarray(rng.standard_normal((B, 9408)), jnp.float32)
    timed(lambda o: jax.vmap(lambda x: jax.lax.top_k(x, 2000)[0])(o),
          (o2,), it, "  top_k(9408->2000) x B")
    # final merged top_k in filter (4783 -> 2000)
    o3 = jnp.asarray(rng.standard_normal((B, 4783)), jnp.float32)
    timed(lambda o: jax.vmap(lambda x: jax.lax.top_k(x, 2000)[0])(o),
          (o3,), it, "  top_k(4783->2000) x B")


if __name__ == "__main__":
    main()
