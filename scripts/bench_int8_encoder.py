"""Encoder-level int8 measurement: dit-base at 1024 px (4097 tokens).

Compares bf16 vs W8A8-dynamic int8 (selective default subset vs all
linears) through the REAL ``vit_forward`` with flash attention, using the
two-point dispatch-latency-subtracting methodology of
bench_int8_gemm.py. Decides what the serving engine's ``int8`` knob does.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

from layoutdit_tpu.models.vit import DIT_BASE, init_vit_params, vit_forward  # noqa: E402
from layoutdit_tpu.ops import quant  # noqa: E402

import os  # noqa: E402

S1, S2 = 3, 13
BATCH = int(os.environ.get("INT8_BATCH", "4"))
SIZE = int(os.environ.get("INT8_SIZE", "1024"))


def _per_step(params, pixels, cfg, label):
    def mk(steps):
        @jax.jit
        def f(params, pixels):
            def body(i, carry):
                acc, px = carry, pixels
                out = vit_forward(
                    params, px + acc * 1e-20, cfg,
                    taps=(4, 6, 8, 12), compute_dtype=jnp.bfloat16,
                    attention_impl="auto",
                )
                return acc + jnp.max(out[-1].astype(jnp.float32)) * 1e-20

            return jax.lax.fori_loop(0, steps, body, 0.0)

        return f

    f1, f2 = mk(S1), mk(S2)
    for f in (f1, f2):
        float(f(params, pixels))
        float(f(params, pixels))
    t0 = time.time()
    float(f1(params, pixels))
    t1 = time.time() - t0
    t0 = time.time()
    float(f2(params, pixels))
    t2 = time.time() - t0
    ms = (t2 - t1) / (S2 - S1) * 1e3
    print(f"{label}: {ms:.1f} ms/batch = {BATCH * 1e3 / ms:.1f} img/s")
    return ms


def main():
    cfg = DIT_BASE
    import dataclasses

    cfg = dataclasses.replace(cfg, image_size=SIZE)
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.default_rng(0)
    pixels = jnp.asarray(rng.uniform(-1, 1, (BATCH, 3, SIZE, SIZE)), jnp.float32)

    t_bf16 = _per_step(params, pixels, cfg, "bf16")
    t_sel = _per_step(
        quant.quantize_vit_params(params), pixels, cfg, "int8 selective (qkv+mlp_in)"
    )
    t_all = _per_step(
        quant.quantize_vit_params(params, keys=quant._VIT_LINEAR_KEYS),
        pixels, cfg, "int8 all linears",
    )
    print(
        f"speedups vs bf16: selective {t_bf16 / t_sel:.2f}x, all {t_bf16 / t_all:.2f}x"
    )


if __name__ == "__main__":
    main()
