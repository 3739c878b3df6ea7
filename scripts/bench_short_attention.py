"""On-chip short-attention benchmark + parity: fused single-block Pallas
kernel (ops/short_attention.py) vs XLA einsum attention at the encoder's
base-resolution shape (224 px dit pages -> N=197, ViT-base heads).

Measures the isolated op (fwd, fwd+bwd) and the FULL 12-layer encoder
(attention_impl "xla" vs "short", fwd and fwd+bwd), on device. This is
the measurement that DECIDED AGAINST routing ``attention_impl="auto"``
to the short kernel below the flash crossover: XLA won (op fwd 0.790
vs 0.888 ms, fwd+bwd 0.862 vs 1.129 ms; full encoder fwd 7.46 vs
8.78 ms at b=16 N=197 — see ATTENTION_BENCH.md "Short-sequence fused
kernel"), so "short" is opt-in only.

Usage: python scripts/bench_short_attention.py
"""

from __future__ import annotations

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

from layoutdit_tpu.ops.short_attention import short_attention


def xla_attn(q, k, v):
    d = q.shape[-1]
    s = jnp.einsum(
        "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
    ) / np.sqrt(d)
    p = jax.nn.softmax(s.astype(jnp.float32), -1).astype(q.dtype)
    return jnp.einsum(
        "bhnm,bmhd->bnhd", p, v, preferred_element_type=jnp.float32
    ).astype(q.dtype)


def timeit(f, q, k, v, steps=30):
    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            # perturbation cast back to q.dtype: `q + f32_scalar` would
            # silently promote the whole benchmark to f32 attention
            out = f(q + (acc * 1e-30).astype(q.dtype), k, v)
            return acc * 0 + out.astype(jnp.float32).sum() * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    np.asarray(run(q, k, v))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(q, k, v))
        best = min(best, time.time() - t0)
    return best / steps * 1e3


def timeit_bwd(f, q, k, v, steps=30):
    def loss(q, k, v):
        return (f(q, k, v).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            gq, gk, gv = g(q + (acc * 1e-30).astype(q.dtype), k, v)
            tot = sum(x.astype(jnp.float32).sum() for x in (gq, gk, gv))
            return acc * 0 + tot * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    np.asarray(run(q, k, v))
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        np.asarray(run(q, k, v))
        best = min(best, time.time() - t0)
    return best / steps * 1e3


def encoder_times(impl: str, x, params, cfg, steps=10):
    # params MUST be a jit argument, not a closure capture — captured
    # pytrees are inlined as HLO literal constants, and an 86M-param
    # proto exceeds the axon tunnel's remote_compile payload limit
    # (observed HTTP 413).
    from layoutdit_tpu.models.vit import vit_forward

    @jax.jit
    def fwd(params, x):
        def body(i, acc):
            out = vit_forward(
                params, x + acc * jnp.float32(1e-30), cfg,
                compute_dtype=jnp.bfloat16, attention_impl=impl,
            )[0]
            return acc * 0 + out.astype(jnp.float32).sum() * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    def loss(params, x):
        return (
            vit_forward(
                params, x, cfg, compute_dtype=jnp.bfloat16, attention_impl=impl
            )[0].astype(jnp.float32) ** 2
        ).sum()

    # grads wrt params AND x, every leaf consumed — dropping the dW grads
    # would let XLA dead-code-eliminate the weight-gradient GEMMs and the
    # "fwd+bwd" row would not measure a real training backward
    g = jax.grad(loss, argnums=(0, 1))

    @jax.jit
    def fb(params, x):
        def body(i, acc):
            gp, gx = g(params, x + acc * jnp.float32(1e-30))
            leaves = jax.tree_util.tree_leaves(gp) + [gx]
            tot = sum(l.astype(jnp.float32).sum() for l in leaves)
            return acc * 0 + tot * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    out = []
    for run in (fwd, fb):
        np.asarray(run(params, x))
        best = float("inf")
        for _ in range(3):
            t0 = time.time()
            np.asarray(run(params, x))
            best = min(best, time.time() - t0)
        out.append(best / steps * 1e3)
    return out  # [fwd ms, fwd+bwd ms]


def main() -> None:
    h, d = 12, 64
    b, n = 16, 197
    rng = np.random.default_rng(0)
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.bfloat16)
        for _ in range(3)
    )

    # on-device parity (fwd and grads)
    o_s = np.asarray(jax.jit(short_attention)(q, k, v)).astype(np.float32)
    o_x = np.asarray(jax.jit(xla_attn)(q, k, v)).astype(np.float32)
    fwd_err = float(np.abs(o_s - o_x).max())

    gs = jax.jit(
        jax.grad(lambda q: (short_attention(q, k, v).astype(jnp.float32) ** 2).sum())
    )(q)
    gx = jax.jit(
        jax.grad(lambda q: (xla_attn(q, k, v).astype(jnp.float32) ** 2).sum())
    )(q)
    diff = np.abs(np.asarray(gs, np.float32) - np.asarray(gx, np.float32))
    grad_err = float(diff.max() / max(1e-6, float(np.abs(np.asarray(gx)).max())))
    print(f"op parity b={b} n={n}: fwd_err {fwd_err:.4f} grad_rel_err {grad_err:.5f}",
          flush=True)

    t_fx = timeit(xla_attn, q, k, v)
    t_fs = timeit(short_attention, q, k, v)
    t_bx = timeit_bwd(xla_attn, q, k, v)
    t_bs = timeit_bwd(short_attention, q, k, v)
    print(
        f"op b={b} n={n}: fwd xla {t_fx:.3f} / short {t_fs:.3f} ms; "
        f"fwd+bwd xla {t_bx:.3f} / short {t_bs:.3f} ms",
        flush=True,
    )

    # full dit-base encoder
    from layoutdit_tpu.models.vit import ViTConfig, init_vit_params

    cfg = ViTConfig()
    params = init_vit_params(jax.random.PRNGKey(0), cfg)
    x = jnp.asarray(rng.normal(size=(b, 3, 224, 224)), jnp.float32)
    ex_f, ex_b = encoder_times("xla", x, params, cfg)
    es_f, es_b = encoder_times("short", x, params, cfg)
    print(
        f"encoder dit-base bs{b} 224px: fwd xla {ex_f:.3f} / short {es_f:.3f} ms; "
        f"fwd+bwd xla {ex_b:.3f} / short {es_b:.3f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
