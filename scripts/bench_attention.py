"""On-chip flash-attention benchmark + parity: Pallas kernels vs XLA.

Runs forward and forward+backward at ViT-base head shapes across sequence
lengths (224^2 pages -> N=197 up to high-res documents), checks numeric
parity on device, and writes ATTENTION_BENCH.md. This is the measurement
behind the ``attention_impl="auto"`` crossover policy
(ops/flash_attention.py:AUTO_FLASH_MIN_SEQ).

Usage: python scripts/bench_attention.py [--write]
"""

from __future__ import annotations

import argparse
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

from layoutdit_tpu.ops.flash_attention import flash_attention


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
            out = f(q + acc * jnp.bfloat16(1e-30), k, v)
            return acc * 0 + out.astype(jnp.float32).sum() * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    np.asarray(run(q, k, v))
    t0 = time.time()
    np.asarray(run(q, k, v))
    return (time.time() - t0) / steps * 1e3


def timeit_bwd(f, q, k, v, steps=30):
    def loss(q, k, v):
        return (f(q, k, v).astype(jnp.float32) ** 2).sum()

    g = jax.grad(loss, argnums=(0, 1, 2))

    @jax.jit
    def run(q, k, v):
        def body(i, acc):
            gq, gk, gv = g(q + acc * jnp.bfloat16(1e-30), k, v)
            tot = sum(x.astype(jnp.float32).sum() for x in (gq, gk, gv))
            return acc * 0 + tot * jnp.float32(1e-30)

        return jax.lax.fori_loop(0, steps, body, jnp.float32(0))

    np.asarray(run(q, k, v))
    t0 = time.time()
    np.asarray(run(q, k, v))
    return (time.time() - t0) / steps * 1e3


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--write", action="store_true")
    args = ap.parse_args()

    h, d = 12, 64
    rows = []
    rng = np.random.default_rng(0)
    for b, n in [(16, 197), (4, 1025), (2, 4097)]:
        q, k, v = (
            jnp.asarray(rng.normal(size=(b, n, h, d)), jnp.bfloat16)
            for _ in range(3)
        )
        # on-device parity (fwd and grads)
        o_f = np.asarray(jax.jit(flash_attention)(q, k, v)).astype(np.float32)
        o_x = np.asarray(jax.jit(xla_attn)(q, k, v)).astype(np.float32)
        fwd_err = float(np.abs(o_f - o_x).max())

        gf = jax.jit(
            jax.grad(lambda q: (flash_attention(q, k, v).astype(jnp.float32) ** 2).sum())
        )(q)
        gx = jax.jit(
            jax.grad(lambda q: (xla_attn(q, k, v).astype(jnp.float32) ** 2).sum())
        )(q)
        rel = np.abs(np.asarray(gf, np.float32) - np.asarray(gx, np.float32))
        grad_err = float(rel.max() / max(1e-6, float(np.abs(np.asarray(gx)).max())))

        t_fx = timeit(xla_attn, q, k, v)
        t_ff = timeit(flash_attention, q, k, v)
        t_bx = timeit_bwd(xla_attn, q, k, v)
        t_bf = timeit_bwd(flash_attention, q, k, v)
        rows.append((b, n, t_fx, t_ff, t_bx, t_bf, fwd_err, grad_err))
        print(
            f"b={b} n={n}: fwd xla {t_fx:.2f} / flash {t_ff:.2f} ms; "
            f"fwd+bwd xla {t_bx:.2f} / flash {t_bf:.2f} ms; "
            f"fwd_err {fwd_err:.4f} grad_rel_err {grad_err:.5f}",
            flush=True,
        )

    if args.write:
        out = [
            "# Flash attention vs XLA (v5e, bf16, ViT-base heads h=12 d=64)\n",
            "Chained-iteration timings inside one jit; parity measured on "
            "device. Crossover drives attention_impl='auto'.\n",
            "| b | N | fwd xla ms | fwd flash ms | fwd+bwd xla ms | "
            "fwd+bwd flash ms | fwd max err | grad rel err |",
            "|---|---|---|---|---|---|---|---|",
        ]
        for r in rows:
            out.append(
                f"| {r[0]} | {r[1]} | {r[2]:.2f} | {r[3]:.2f} | {r[4]:.2f} "
                f"| {r[5]:.2f} | {r[6]:.4f} | {r[7]:.5f} |"
            )
        path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "..", "ATTENTION_BENCH.md"
        )
        with open(path, "w") as f:
            f.write("\n".join(out) + "\n")
        print("wrote", os.path.abspath(path))


if __name__ == "__main__":
    main()
