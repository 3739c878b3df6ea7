"""Probe: fused RoIAlign formulations that keep the [K, P, C, W] t-stream
in VMEM while feeding the MXU large matmuls.

The round-2 fused kernel (ops/roi_align_pallas.py) lost to XLA because its
batched matmuls are sublane-starved (M=7 per batch element). The variants
here spend REDUNDANT flops (block-diagonal / cross-roi forms) to buy
single large GEMMs — flops are nearly free next to the ~1.6 GB HBM
t-stream the XLA path pays per direction.

  A: one big gemm1 [KB*P, H] x [H, (W,C)] -> in-kernel relayout
     [(k,py),(w,c)] -> [(k,w),(py,c)] -> block-diag gemm2.
     Legality question: the relayout splits/merges the lane dim (inner
     factor C=256 is a lane-tile multiple).
  E: transposed gemm1 -> free sublane split -> major-dim transpose ->
     c-batched cross-roi gemm2 -> matmul diagonal extraction.
     Built only from ops the round-2 probes found legal.

Run on the chip:  python scripts/probe_roi_fused.py [--iters 50]

Production shapes: K=8192 rois (bs16 x 512 samples), P=7, C=256,
atlas H=109, W_max=56, compute bf16.
"""

from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

P = 7
C = 256
H = 109
W = 56
BF = jnp.bfloat16


def timed(fn, *args, iters=50, name=""):
    try:
        out = jax.block_until_ready(fn(*args))
    except Exception as e:  # noqa: BLE001
        print(f"{name:38s} FAILED: {type(e).__name__}: {str(e)[:400]}")
        return None

    @jax.jit
    def loop(*a):
        def body(i, carry):
            # perturb the first operand with the carry so the body is NOT
            # loop-invariant (XLA would hoist it out entirely otherwise)
            a0 = a[0] + carry.astype(a[0].dtype) * 1e-12
            o = fn(a0, *a[1:])
            return carry + o.reshape(-1)[0].astype(jnp.float32)

        return jax.lax.fori_loop(0, iters, body, jnp.float32(0.0))

    jax.block_until_ready(loop(*args))
    t0 = time.perf_counter()
    jax.block_until_ready(loop(*args))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:38s} {dt:7.3f} ms")
    return out


def compare(name, out, ref):
    if out is None or ref is None:
        return
    err = float(
        jnp.max(jnp.abs(out.astype(jnp.float32) - ref.astype(jnp.float32)))
    )
    print(f"    {name} max|err| vs ref = {err:.5f}")


# ---------------------------------------------------------------- reference


@jax.jit
def xla_two_gemm(f_chw, wy, wx):
    """Production path (ops/roi_align.py pooled_from_weights_native):
    -> [K, Px, Py, C]."""
    t = jax.lax.dot_general(
        wy.astype(BF), f_chw.transpose(1, 0, 2),
        dimension_numbers=(((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(BF)  # [K, Py, C, W]
    s = jax.lax.dot_general(
        wx.astype(BF), t,
        dimension_numbers=(((2,), (3,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(BF)
    return s  # [K, Px, Py, C]


# ------------------------------------------------- variant A: big + relayout


def _kernel_a(f2d_ref, wy_ref, wxb_ref, out_ref, *, kb):
    t = jax.lax.dot_general(
        wy_ref[:], f2d_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(BF)  # [(k,py)=KB*P, (w,c)=W*C] bf16
    # the relayout under test: split lanes (W,C), split sublanes (kb,P),
    # swap py<->w, re-merge
    t4 = t.reshape(kb, P, W, C)
    tt = t4.transpose(0, 2, 1, 3).reshape(kb * W, P * C)  # [(k,w), (py,c)]
    out = jax.lax.dot_general(
        wxb_ref[0], tt, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [(k,px), (py,c)]
    out_ref[:] = out.reshape(kb, P, P, C).astype(out_ref.dtype)


def variant_a(f_chw, wy, wx, kb=8):
    k = wy.shape[0]
    f2d = jnp.asarray(
        f_chw.transpose(1, 2, 0).reshape(H, W * C), BF
    )  # [H, (w,c)]
    wy2 = wy.reshape(k * P, H).astype(BF)
    eye = jnp.eye(kb, dtype=BF)
    # wx block-diag [(k,px), (k',w)] per block of kb rois
    wxb = (
        wx.reshape(k // kb, kb, P, W).astype(BF)[:, :, :, None, :]
        * eye[None, :, None, :, None]
    ).reshape(k // kb, kb * P, kb * W)
    return pl.pallas_call(
        functools.partial(_kernel_a, kb=kb),
        grid=(k // kb,),
        in_specs=[
            pl.BlockSpec((H, W * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * P, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kb * P, kb * W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, P, P, C), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, P, P, C), BF),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(f2d, wy2, wxb)


# relayout-cost isolation: gemm1 + relayout + direct write (no gemm2)


def _kernel_a0(f2d_ref, wy_ref, out_ref, *, kb, relayout):
    t = jax.lax.dot_general(
        wy_ref[:], f2d_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(BF)
    if relayout:
        t = t.reshape(kb, P, W, C).transpose(0, 2, 1, 3).reshape(
            kb * W, P * C
        )
        out_ref[:] = t.reshape(kb * W * P, C)[: out_ref.shape[0]]
    else:
        out_ref[:] = t.reshape(kb * P * W, C)[: out_ref.shape[0]]


def variant_a0(f_chw, wy, kb=8, relayout=True):
    k = wy.shape[0]
    f2d = jnp.asarray(f_chw.transpose(1, 2, 0).reshape(H, W * C), BF)
    wy2 = wy.reshape(k * P, H).astype(BF)
    return pl.pallas_call(
        functools.partial(_kernel_a0, kb=kb, relayout=relayout),
        grid=(k // kb,),
        in_specs=[
            pl.BlockSpec((H, W * C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * P, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb * P * W, C), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k * P * W, C), BF),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(f2d, wy2)


# --------------------------------------------- variant E: legal-op cross-roi


def _kernel_e(f2dt_ref, wy_ref, wx_ref, r_ref, out_ref, *, kb):
    # gemm1 transposed: [ (w,c), H ] x [ H, (k,py) ] -> t9 [(w,c), (k,py)]
    t9 = jax.lax.dot_general(
        f2dt_ref[:], wy_ref[:], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(BF)  # [(w,c)=W*C, (k,py)=kb*P]
    t10 = t9.reshape(W, C, kb * P)  # free: sublane split, inner C%8==0
    t10t = jnp.transpose(t10, (1, 0, 2))  # [C, W, (k,py)] major transpose
    wx2 = wx_ref[:]  # [(k,px), W]
    wxb = jnp.broadcast_to(wx2[None], (C, kb * P, W))
    cross = jax.lax.dot_general(
        wxb, t10t, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(BF)  # [C, (k,px), (k',py)] — only k'=k blocks are wanted
    ki = jax.lax.broadcasted_iota(jnp.int32, (kb * P, kb * P), 0) // P
    kj = jax.lax.broadcasted_iota(jnp.int32, (kb * P, kb * P), 1) // P
    sel = cross * (ki == kj).astype(cross.dtype)[None]
    # reduce (k',py) -> py with a fixed [kb*P, P] selector matmul
    s = jax.lax.dot_general(
        sel, r_ref[:], (((2,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [C, (k,px), P(py)]
    out_ref[0] = s.astype(out_ref.dtype)


def variant_e(f_chw, wy, wx, kb=8):
    k = wy.shape[0]
    f2dt = jnp.asarray(
        f_chw.transpose(2, 0, 1).reshape(W * C, H), BF
    )  # [(w,c), H]
    wy2 = wy.reshape(k * P, H).astype(BF)
    wx2 = wx.reshape(k * P, W).astype(BF)
    r = jnp.tile(jnp.eye(P, dtype=BF), (kb, 1))  # [(k',py), py]
    out = pl.pallas_call(
        functools.partial(_kernel_e, kb=kb),
        grid=(k // kb,),
        in_specs=[
            pl.BlockSpec((W * C, H), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * P, H), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * P, W), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * P, P), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, C, kb * P, P), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k // kb, C, kb * P, P), BF),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
    )(f2dt, wy2, wx2, r)
    # XLA-side relayout to [K, Px, Py, C] for comparison (in production the
    # box head would contract the kernel layout directly)
    return (
        out.reshape(k // kb, C, kb, P, P)
        .transpose(0, 2, 3, 4, 1)
        .reshape(k, P, P, C)
    )


# ------------------------------------------------------------------- driver


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--k", type=int, default=8192)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    k = args.k
    f = jnp.asarray(rng.standard_normal((C, H, W)), BF)
    wy = jnp.asarray(rng.random((k, P, H)) < 0.02, jnp.float32)
    wx = jnp.asarray(rng.random((k, P, W)) < 0.04, jnp.float32)

    print(f"device: {jax.devices()[0].platform}  K={k}")
    ref = timed(xla_two_gemm, f, wy, wx, iters=args.iters,
                name="XLA two-GEMM (production)")

    for kb in (8, 16):
        out = timed(jax.jit(functools.partial(variant_a, kb=kb)), f, wy, wx,
                    iters=args.iters, name=f"A: big-GEMM + relayout kb={kb}")
        compare(f"A kb={kb}", out, ref)

    # relayout-cost isolation (kb=16)
    timed(jax.jit(functools.partial(variant_a0, kb=16, relayout=False)),
          f, wy, iters=args.iters, name="A0: gemm1-only, no relayout")
    timed(jax.jit(functools.partial(variant_a0, kb=16, relayout=True)),
          f, wy, iters=args.iters, name="A0: gemm1 + relayout")

    for kb in (8,):
        out = timed(jax.jit(functools.partial(variant_e, kb=kb)), f, wy, wx,
                    iters=args.iters, name=f"E: cross-roi legal-ops kb={kb}")
        compare(f"E kb={kb}", out, ref)


if __name__ == "__main__":
    main()
