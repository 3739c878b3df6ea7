"""Fused attention specialized for SHORT sequences (Pallas TPU kernel).

The encoder's base-resolution workload is N=197 tokens (224 px pages,
SURVEY.md §5 "sequence length is pinned"), where the general blockwise
flash kernel (ops/flash_attention.py) loses to XLA: at one KV block per
row its online-softmax machinery and 192 tiny grid cells are pure
overhead (ATTENTION_BENCH.md). XLA in turn materializes the f32
[B, H, N, N] score tensor in HBM every layer — ~30 MB written, re-read
by the softmax, re-written as bf16 probs, re-read by the PV matmul, and
the whole round trip repeats in the backward (autodiff stores the probs).

This kernel removes that HBM round trip for the short-N regime:

  * the sequence fits ONE block (N padded to the 128-lane multiple), so
    softmax is a single pass over a VMEM-resident [Np, Np] tile — no
    running max/sum, no correction multiplies;
  * G heads ride one grid cell ([G, Np, D] blocks), amortizing grid and
    copy overhead that dominated the general kernel at this size;
  * the backward is the same shape of kernel: it recomputes the probs in
    VMEM from (q, k) and emits dq/dk/dv directly — attention's O(N²)
    tensors never touch HBM in either direction (the only residual
    beyond the inputs is o, needed for D = rowsum(dO·O)).

Padding safety note: NEG_INF is a large finite negative (-1e30), so a
fully-padded row softmaxes to a uniform distribution over zero-padded
inputs — contributions cancel exactly and no NaN can leak into dk/dv
(true -inf would produce exp(-inf - -inf) = NaN there).

STATUS — measured and NOT routed by default (ATTENTION_BENCH.md,
"Short-sequence fused kernel"): at the production shape (b=16 N=197)
the on-chip numbers are fwd 0.888 vs XLA 0.790 ms, fwd+bwd 1.129 vs
0.862 ms (encoder-level: 8.78 vs 7.46 fwd). The 128-lane padding
(197 -> 256 = 1.69x scores FLOPs) plus
the backward's P-recompute (a 5th matmul vs XLA reusing autodiff-stored
probs) cost more than the avoided ~30 MB/layer HBM score round trip
saves at this size. Kept as the opt-in ``attention_impl="short"`` for
shapes where the padding waste vanishes; ``"auto"`` stays on XLA below
the flash crossover.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from layoutdit_tpu.ops.flash_attention import _ceil_to

NEG_INF = -1e30

# per-cell VMEM budget for picking G (heads per grid cell): operands
# [G, Np, D] bf16 + two [Np, Np] f32 score tiles per in-flight head
_VMEM_BUDGET = 8 * 1024 * 1024


def _pick_group(bh: int, n_pad: int) -> int:
    for g in (8, 4, 2, 1):
        if bh % g == 0 and g * 2 * n_pad * n_pad * 4 <= _VMEM_BUDGET:
            return g
    return 1


def _probs(q, k, scale, n_valid):
    """Single-pass masked softmax(q k^T * scale) for one head, f32 in VMEM."""
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
    s = jnp.where(col < n_valid, s, NEG_INF)
    m = jnp.max(s, axis=1, keepdims=True)
    p = jnp.exp(s - m)
    return p / jnp.sum(p, axis=1, keepdims=True)


def _fwd_kernel(q_ref, k_ref, v_ref, o_ref, *, scale, n_valid, group):
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        p = _probs(q, k, scale, n_valid)
        o_ref[g] = jax.lax.dot_general(
            p, v_ref[g].astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _bwd_kernel(q_ref, k_ref, v_ref, o_ref, do_ref,
                dq_ref, dk_ref, dv_ref, *, scale, n_valid, group):
    for g in range(group):
        q = q_ref[g].astype(jnp.float32)
        k = k_ref[g].astype(jnp.float32)
        p = _probs(q, k, scale, n_valid)
        do = do_ref[g].astype(jnp.float32)
        # dV = P^T dO
        dv_ref[g] = jax.lax.dot_general(
            p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dv_ref.dtype)
        # dS = P * (dO V^T - rowsum(dO * O))
        dp = jax.lax.dot_general(
            do, v_ref[g].astype(jnp.float32), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dvec = jnp.sum(do * o_ref[g].astype(jnp.float32), axis=1, keepdims=True)
        ds = p * (dp - dvec)
        dq_ref[g] = (jax.lax.dot_general(
            ds, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dq_ref.dtype)
        dk_ref[g] = (jax.lax.dot_general(
            ds, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ) * scale).astype(dk_ref.dtype)


def _bh_spec(group, n_pad, d):
    return pl.BlockSpec((group, n_pad, d), lambda i: (i, 0, 0),
                        memory_space=pltpu.VMEM)


def _short_fwd(q, k, v, scale, interpret):
    bh, n, d = q.shape
    n_pad = _ceil_to(n, 128)
    group = _pick_group(bh, n_pad)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    spec = _bh_spec(group, n_pad, d)
    o = pl.pallas_call(
        functools.partial(_fwd_kernel, scale=scale, n_valid=n, group=group),
        grid=(bh // group,),
        in_specs=[spec, spec, spec],
        out_specs=spec,
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        interpret=interpret,
    )(pad(q), pad(k), pad(v))
    return o[:, :n, :]


def _short_bwd(q, k, v, o, do, scale, interpret):
    bh, n, d = q.shape
    n_pad = _ceil_to(n, 128)
    group = _pick_group(bh, n_pad)

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    spec = _bh_spec(group, n_pad, d)
    shape = jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_kernel, scale=scale, n_valid=n, group=group),
        grid=(bh // group,),
        in_specs=[spec] * 5,
        out_specs=[spec] * 3,
        out_shape=[shape] * 3,
        interpret=interpret,
    )(pad(q), pad(k), pad(v), pad(o), pad(do))
    return dq[:, :n, :], dk[:, :n, :], dv[:, :n, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _short_core(q, k, v, scale, interpret):
    return _short_fwd(q, k, v, scale, interpret)


def _short_core_fwd(q, k, v, scale, interpret):
    o = _short_fwd(q, k, v, scale, interpret)
    return o, (q, k, v, o)


def _short_core_bwd(scale, interpret, res, do):
    q, k, v, o = res
    return _short_bwd(q, k, v, o, do, scale, interpret)


_short_core.defvjp(_short_core_fwd, _short_core_bwd)


def short_attention(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    scale: float | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused short-sequence attention; [B, N, H, D] in and out.

    No attention-bias support by design — rel-pos-bias checkpoints route
    through the XLA or blockwise-flash paths (models/vit.py picks).
    """
    b, n, h, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    out = _short_core(to_bh(q), to_bh(k), to_bh(v), scale, interpret)
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
