"""Encoder-only xla vs pallas-flash at increasing token counts (on chip)."""
import os, time
os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
import jax.numpy as jnp
import numpy as np
from layoutdit_tpu.models import vit as vit_mod
from layoutdit_tpu.models.vit import ViTConfig, init_vit_params

STEPS = 10
for size, b in [(512, 4), (736, 2), (1024, 1)]:
    grid = size // 16
    n = grid * grid + 1
    cfg = ViTConfig(image_size=size)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, 3, size, size)), jnp.float32)

    res = {}
    outs = {}
    for impl in ("xla", "pallas"):
        @jax.jit
        def run(params, x):
            def body(i, acc):
                hs = vit_mod.vit_forward(
                    params, x + acc * 1e-30, cfg, taps=(12,),
                    compute_dtype=jnp.bfloat16, attention_impl=impl)
                return hs[-1].astype(jnp.float32).ravel()[0] * 1e-30
            return jax.lax.fori_loop(0, STEPS, body, jnp.float32(0.0))
        np.asarray(run(params, x))
        ts = []
        for _ in range(3):
            t0 = time.time(); np.asarray(run(params, x)); ts.append(time.time() - t0)
        res[impl] = min(ts) / STEPS * 1e3
        outs[impl] = jax.jit(lambda p, xx: vit_mod.vit_forward(
            p, xx, cfg, taps=(12,), compute_dtype=jnp.bfloat16,
            attention_impl=impl)[-1])(params, x)
    err = float(jnp.max(jnp.abs(outs["xla"].astype(jnp.float32)
                                - outs["pallas"].astype(jnp.float32))))
    print(f"tokens={n:5d} b={b}: xla {res['xla']:7.2f} ms  "
          f"pallas {res['pallas']:7.2f} ms  maxdiff {err:.4f}", flush=True)
