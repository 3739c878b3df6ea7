"""Is int8 MXU worth building a quantized serving path? Micro-bench.

v5e's MXU does s8xs8->s32 at 2x its bf16 FLOPs. This measures bf16 vs
int8 (including on-the-fly per-row activation quantization, which a real
dynamic-quant serving path must pay) at the encoder GEMM shapes of the
high-res (1024 px, 4k tokens) serving bucket. Decision gate for a
weight+activation-quantized encoder path: build only if the dynamic-quant
int8 column wins by >=1.3x at these shapes.

Methodology (axon tunnel): per-step time = (t(S2 steps) - t(S1 steps)) /
(S2 - S1), each fetched with float() — block_until_ready does NOT block
on this backend. The carried scalar feeds the lhs each iteration, and the
reduction is max() (sum(A@B) gets algebraically decomposed by XLA into
two vector reductions — it never runs the GEMM).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

S1, S2 = 10, 110


def _per_step(make_fn, *args):
    f1, f2 = make_fn(S1), make_fn(S2)
    for f in (f1, f2):  # two warm-ups each (axon per-executable warm-up)
        float(f(*args))
        float(f(*args))
    t0 = time.time()
    float(f1(*args))
    t1 = time.time() - t0
    t0 = time.time()
    float(f2(*args))
    t2 = time.time() - t0
    return (t2 - t1) / (S2 - S1)


def bench_shape(m, k, n):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((m, k)), jnp.bfloat16)
    w = jnp.asarray(rng.standard_normal((k, n)), jnp.bfloat16)
    w_q = jnp.asarray(rng.integers(-127, 127, (k, n)), jnp.int8)
    w_s = jnp.asarray(rng.uniform(0.01, 0.02, (n,)), jnp.float32)
    x_q = jnp.asarray(rng.integers(-127, 127, (m, k)), jnp.int8)

    def mk_bf16(steps):
        @jax.jit
        def f(x, w):
            def body(i, acc):
                y = jnp.dot(x + acc * 0, w, preferred_element_type=jnp.float32)
                return acc + jnp.max(y) * 1e-20

            return jax.lax.fori_loop(0, steps, body, 0.0)

        return lambda: f(x, w)

    def mk_int8_static(steps):
        @jax.jit
        def f(x_q, w_q):
            def body(i, acc):
                lhs = x_q + (acc * 0).astype(jnp.int8)
                y = jax.lax.dot_general(
                    lhs, w_q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return acc + jnp.max(y).astype(jnp.float32) * 1e-20

            return jax.lax.fori_loop(0, steps, body, 0.0)

        return lambda: f(x_q, w_q)

    def mk_int8_dynamic(steps):
        @jax.jit
        def f(x, w_q, w_s):
            def body(i, acc):
                xx = (x + acc * 0).astype(jnp.float32)
                s = jnp.max(jnp.abs(xx), axis=1, keepdims=True) / 127.0
                xq = jnp.round(xx / s).astype(jnp.int8)
                y = jax.lax.dot_general(
                    xq, w_q, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                y = y.astype(jnp.float32) * s * w_s[None, :]
                return acc + jnp.max(y) * 1e-20

            return jax.lax.fori_loop(0, steps, body, 0.0)

        return lambda: f(x, w_q, w_s)

    t_bf16 = _per_step(mk_bf16)
    t_s8 = _per_step(mk_int8_static)
    t_dyn = _per_step(mk_int8_dynamic)
    tf = 2 * m * k * n / 1e12
    print(
        f"[{m}x{k}x{n}] bf16 {t_bf16*1e3:.3f} ms ({tf/t_bf16:.0f} TF/s) | "
        f"int8-static {t_s8*1e3:.3f} ms ({tf/t_s8:.0f} TOP/s, {t_bf16/t_s8:.2f}x) | "
        f"int8-dynamic {t_dyn*1e3:.3f} ms ({t_bf16/t_dyn:.2f}x)"
    )


if __name__ == "__main__":
    # dit-base high-res serving shapes: bs4 x 4160 padded tokens
    for shape in [
        (16640, 768, 3072),   # MLP in
        (16640, 3072, 768),   # MLP out
        (16640, 768, 2304),   # fused QKV
        (16640, 768, 768),    # attn out
        (3152, 768, 3072),    # 224px bs16 (197*16 tokens) MLP in
    ]:
        bench_shape(*shape)
