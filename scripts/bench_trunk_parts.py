"""Trunk decomposition at bs16 bf16: encoder, +pyramid taps, +FPN, +rpn head."""
import os, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from layoutdit_tpu.models.detection.detector import DetectorConfig, init_detector_params, _normalize
from layoutdit_tpu.models.backbone import backbone_forward
from layoutdit_tpu.models import vit as vit_mod

cfg = DetectorConfig(compute_dtype="bfloat16")
params = init_detector_params(jax.random.PRNGKey(0), cfg)
rng = np.random.default_rng(0)
images = jnp.asarray(rng.uniform(0, 1, (16, 3, 224, 224)), jnp.float32)

STEPS = 30

def timed(name, fn):
    @jax.jit
    def run(images):
        def body(i, acc):
            out = fn(images + acc * 1e-30)
            # consume EVERY leaf: depending only on the first tap (layer 4)
            # lets XLA dead-code-eliminate layers 5-12 — this bug inflated
            # the round-2 "encoder 2.96 ms / 166 TF/s" figure (real 12-layer
            # fwd is ~6.4 ms / 87 TF/s, scripts/bench_encoder_bwd.py)
            return sum(
                l.astype(jnp.float32).ravel()[0]
                for l in jax.tree_util.tree_leaves(out)
            ) * 1e-30
        return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
    np.asarray(run(images))
    ts = []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(images)); ts.append(time.perf_counter() - t0)
    print(f"{name:36s} {min(ts)/STEPS*1e3:7.3f} ms", flush=True)

def enc_only(x):
    xn = _normalize(x, cfg).astype(jnp.bfloat16)
    # encoder hidden states only (vit forward with taps)
    hs = vit_mod.vit_forward(
        params["backbone"]["vit"], xn, cfg.backbone.vit,
        taps=cfg.backbone.taps, compute_dtype=jnp.bfloat16,
        attention_impl="xla",
    )
    return hs

def full_trunk(x):
    xn = _normalize(x, cfg).astype(jnp.bfloat16)
    return backbone_forward(
        params["backbone"], xn, cfg.backbone,
        compute_dtype=jnp.bfloat16, attention_impl="xla",
    )

timed("encoder only (12L + taps)", enc_only)
timed("encoder + pyramid + FPN", full_trunk)
