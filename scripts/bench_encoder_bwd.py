"""Measure the encoder BACKWARD like every other floor row (VERDICT r3 #7).

PERF_STAGES' proven-floor table pinned every stage to a measurement except
"encoder fwd+bwd ~9 ms ... bwd ~2x flops at similar efficiency" — the
single largest unmeasured line in the step budget. This script isolates:

  * encoder fwd (bf16, taps)          — the measured 84%-of-peak row
  * encoder fwd + full bwd (dX + dW)  — remat off
  * encoder fwd + full bwd            — remat on (recompute per layer)

and reports ms + TF/s against the analytic flop count so the bwd
efficiency claim becomes a number. Methodology per the axon quirks:
fori_loop inside ONE jit with a data dependency, min of 3 timed calls
after a warm-up call per executable.

Usage: python scripts/bench_encoder_bwd.py [batch] [image_size]
"""

import os
import sys
import time

os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np

from layoutdit_tpu.models import vit as vit_mod
from layoutdit_tpu.models.detection.detector import (
    DetectorConfig,
    _normalize,
    init_detector_params,
)

BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 16
SIZE = int(sys.argv[2]) if len(sys.argv) > 2 else 224
STEPS = 20

cfg = DetectorConfig(compute_dtype="bfloat16", image_size=SIZE)
params = init_detector_params(jax.random.PRNGKey(0), cfg)
vit_params = params["backbone"]["vit"]
vcfg = cfg.backbone.vit
rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0, 1, (BATCH, 3, SIZE, SIZE)), jnp.float32)

# analytic encoder flops (MACs*2): per layer 24*N*D^2 (qkv/out/mlp) +
# 4*N^2*D (scores + attn@V); N includes CLS
N = 1 + (SIZE // vcfg.patch_size) ** 2
D, L = vcfg.hidden_size, vcfg.num_hidden_layers
FWD_TFLOP = BATCH * L * (24 * N * D * D + 4 * N * N * D) / 1e12


def timed(name, fn, flops_tf):
    @jax.jit
    def run(images, vit_params):
        def body(i, acc):
            out = fn(images + acc * 1e-30, vit_params)
            return out.astype(jnp.float32) * 1e-30

        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))

    np.asarray(run(images, vit_params))  # compile
    np.asarray(run(images, vit_params))  # per-executable warm-up (axon)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(images, vit_params))
        ts.append(time.perf_counter() - t0)
    ms = min(ts) / STEPS * 1e3
    print(
        f"{name:34s} {ms:8.3f} ms   {flops_tf / (ms / 1e3):6.1f} TF/s",
        flush=True,
    )
    return ms


def fwd(x, p, remat=False, vcfg_=None):
    xn = _normalize(x, cfg).astype(jnp.bfloat16)
    hs = vit_mod.vit_forward(
        p, xn, vcfg_ or vcfg, taps=cfg.backbone.taps,
        compute_dtype=jnp.bfloat16, attention_impl="xla", remat=remat,
    )
    return sum(h.astype(jnp.float32).sum() for h in hs)


def fwd_bwd(remat):
    def f(x, p):
        loss, grads = jax.value_and_grad(lambda p_: fwd(x, p_, remat))(p)
        # EVERY leaf must feed the output: depending only on the first
        # leaf (cls_token grad = pure dX chain) lets XLA dead-code-
        # eliminate all the dW GEMMs — half the backward FLOPs
        return loss + sum(
            g.astype(jnp.float32).ravel()[0]
            for g in jax.tree_util.tree_leaves(grads)
        )

    return f


print(f"encoder bwd bench: dit-base bs{BATCH} {SIZE}px bf16, N={N} "
      f"analytic fwd = {FWD_TFLOP * 1e3:.1f} GFLOP/step")
f_ms = timed("fwd only", lambda x, p: fwd(x, p), FWD_TFLOP)

# Round-5 encoder-forward probes (VERDICT r4 item 5): each is an opt-in
# ViTConfig knob; rows here decide keep/dead-end in PERF_STAGES.md.
if os.environ.get("BENCH_PROBES", "0") == "1":
    import dataclasses as _dc

    pad_cfg = _dc.replace(vcfg, pad_tokens_to=((N + 127) // 128) * 128)
    bf16_cfg = _dc.replace(vcfg, score_dtype="bfloat16")
    both_cfg = _dc.replace(
        vcfg, pad_tokens_to=((N + 127) // 128) * 128,
        score_dtype="bfloat16",
    )
    timed(f"fwd pad->{pad_cfg.pad_tokens_to}",
          lambda x, p: fwd(x, p, vcfg_=pad_cfg), FWD_TFLOP)
    timed("fwd bf16 scores",
          lambda x, p: fwd(x, p, vcfg_=bf16_cfg), FWD_TFLOP)
    timed("fwd pad + bf16 scores",
          lambda x, p: fwd(x, p, vcfg_=both_cfg), FWD_TFLOP)

    def fwd_bwd_cfg(vc):
        def f(x, p):
            loss, grads = jax.value_and_grad(
                lambda p_: fwd(x, p_, vcfg_=vc)
            )(p)
            return loss + sum(
                g.astype(jnp.float32).ravel()[0]
                for g in jax.tree_util.tree_leaves(grads)
            )

        return f

    timed("fwd+bwd pad", fwd_bwd_cfg(pad_cfg), 3 * FWD_TFLOP)
    timed("fwd+bwd bf16 scores", fwd_bwd_cfg(bf16_cfg), 3 * FWD_TFLOP)
    timed("fwd+bwd pad + bf16", fwd_bwd_cfg(both_cfg), 3 * FWD_TFLOP)

fb_ms = timed("fwd+bwd (remat off)", fwd_bwd(False), 3 * FWD_TFLOP)
fbr_ms = timed("fwd+bwd (remat on)", fwd_bwd(True), 4 * FWD_TFLOP)
print(
    f"bwd-only (remat off) = {fb_ms - f_ms:.3f} ms -> "
    f"{2 * FWD_TFLOP / ((fb_ms - f_ms) / 1e3):.1f} TF/s vs fwd "
    f"{FWD_TFLOP / (f_ms / 1e3):.1f} TF/s "
    f"(bwd/fwd time ratio {(fb_ms - f_ms) / f_ms:.2f}, flops ratio 2.0)"
)
