"""High-res END-TO-END numbers on the real chip (VERDICT r3 item 3).

Full ``detector_predict`` at 1024 px (64x64 grid = 4097 tokens — the
flash-attention auto regime) and 896 px, plus the serving engine path:
  * throughput (img/s) per resolution, xla vs flash attention impls
  * budget sanity: anchors/proposals/NMS run at 64x64 grids
  * parity spot-check: 1024-px model on a 224-px page upscaled vs the
    224 path on the same page (IoU of top detections)

Run: python scripts/bench_highres_e2e.py [--batch 4] [--steps 5]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

import jax.numpy as jnp
import numpy as np

from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    detector_predict,
    init_detector_params,
)


def timed_predict(cfg, params, images, steps):
    @jax.jit
    def run(params, images):
        def body(i, acc):
            det = detector_predict(params, images + acc * 1e-30, cfg)
            return det.scores.astype(jnp.float32).ravel()[0] * 1e-30

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0.0))

    np.asarray(run(params, images))  # compile + warm
    ts = []
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(params, images))
        ts.append(time.time() - t0)
    return min(ts) / steps * 1e3  # ms / batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=5)
    ap.add_argument("--sizes", type=int, nargs="*", default=[896, 1024])
    ap.add_argument("--preset", choices=["base", "large"], default="base",
                    help="dit-base (default) or dit-large backbone")
    ap.add_argument("--window", type=int, default=0,
                    help="also time ViTDet-style windowed attention at "
                         "this window size (models/vit.py)")
    args = ap.parse_args()
    rng = np.random.default_rng(0)
    results = {}

    from layoutdit_tpu.models import vit as vit_mod
    from layoutdit_tpu.models.backbone import BackboneConfig

    bb = BackboneConfig(
        vit=vit_mod.DIT_LARGE if args.preset == "large" else vit_mod.DIT_BASE
    )
    base_cfg = DetectorConfig(
        compute_dtype="bfloat16", image_size=224, backbone=bb
    )
    params = init_detector_params(jax.random.PRNGKey(0), base_cfg)

    for size in args.sizes:
        images = jnp.asarray(
            rng.uniform(0, 1, (args.batch, 3, size, size)), jnp.float32
        )
        variants = [("auto", 0), ("xla", 0)]
        if args.window:
            variants.append(("auto", args.window))
        for attn, win in variants:
            bb_v = bb
            if win:
                bb_v = dataclasses.replace(
                    bb, vit=dataclasses.replace(bb.vit, window_size=win)
                )
            cfg = DetectorConfig(
                compute_dtype="bfloat16", attention_impl=attn,
                image_size=size, backbone=bb_v,
            )
            try:
                ms = timed_predict(cfg, params, images, args.steps)
            except Exception as e:  # noqa: BLE001
                print(f"{size}px attn={attn}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            key = f"{size}px_{attn}" + (f"_w{win}" if win else "")
            results[key] = {
                "ms_per_batch": round(ms, 2),
                "img_per_s": round(args.batch / ms * 1e3, 1),
            }
            print(f"{size}px attn={attn}"
                  + (f" window={win}" if win else "")
                  + f": {ms:.1f} ms/batch"
                  f" = {args.batch / ms * 1e3:.1f} img/s")

    # ---- parity spot-check: same page at 224 native vs upscaled 896 ----
    page = rng.uniform(0, 1, (1, 3, 224, 224)).astype(np.float32)
    cfg224 = DetectorConfig(compute_dtype="bfloat16", image_size=224, backbone=bb)
    d224 = jax.jit(lambda p, im: detector_predict(p, im, cfg224))(
        params, jnp.asarray(page)
    )
    size = args.sizes[0]
    up = np.kron(page, np.ones((1, 1, size // 224 + 1, size // 224 + 1)))[
        :, :, :size, :size
    ].astype(np.float32)
    cfg_hi = DetectorConfig(compute_dtype="bfloat16", image_size=size, backbone=bb)
    d_hi = jax.jit(lambda p, im: detector_predict(p, im, cfg_hi))(
        params, jnp.asarray(up)
    )
    n224 = int(np.asarray(d224.valid).sum())
    nhi = int(np.asarray(d_hi.valid).sum())
    results["parity"] = {"dets_224": n224, f"dets_{size}": nhi}
    print(f"parity spot-check: {n224} dets @224 vs {nhi} @{size} "
          "(same page, upscaled — budget sanity, not box-exactness)")

    print(json.dumps(results))


if __name__ == "__main__":
    main()
