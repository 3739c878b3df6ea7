"""Blockwise flash attention (Pallas TPU kernel) with custom VJP.

The reference's attention is HF BeitSelfAttention — materialized
[B, H, N, N] scores in HBM (modeling_beit.py, SURVEY.md §2.2). This kernel
never materializes the score matrix: Q-blocks iterate over KV-blocks with
an online-softmax running (max, sum, accumulator) in VMEM scratch, so HBM
traffic is O(N*D) and longer sequences (high-res document pages) scale
blockwise (BASELINE.json north star; SURVEY.md §2.3 note).

Layout: inputs [B, N, H, D] (the encoder's natural layout), computed as a
(B*H, q-block, kv-block) grid. Supports an additive attention bias
[H, N, N] (BEiT relative position bias) and right-padding of N to the
block size. Backward = two Pallas kernels (dKdV sweep, dQ sweep) using the
standard recompute-with-D-vector flash formulation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


# ------------------------------------------------------------------ forward


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, m_scr, l_scr, acc_scr,
                *, scale: float, n_valid: int, block_k: int, nkv: int):
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0].astype(jnp.float32)  # [Bq, D]
    k = k_ref[0].astype(jnp.float32)  # [Bk, D]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [Bq, Bk]
    if bias_ref is not None:
        s = s + bias_ref[0].astype(jnp.float32)

    # mask padded kv columns
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_i * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)

    m_prev = m_scr[:]  # [Bq, 1]
    m_cur = jnp.max(s, axis=1, keepdims=True)
    m_new = jnp.maximum(m_prev, m_cur)
    p = jnp.exp(s - m_new)  # [Bq, Bk]
    corr = jnp.exp(m_prev - m_new)  # [Bq, 1]
    l_new = l_scr[:] * corr + jnp.sum(p, axis=1, keepdims=True)
    acc_scr[:] = acc_scr[:] * corr + jax.lax.dot_general(
        p, v_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    m_scr[:] = m_new
    l_scr[:] = l_new

    @pl.when(kv_i == nkv - 1)
    def _():
        o_ref[0] = (acc_scr[:] / l_scr[:]).astype(o_ref.dtype)


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    bh, n, d = q.shape
    n_pad = _ceil_to(n, max(block_q, block_k))
    nq = n_pad // block_q
    nkv = n_pad // block_k

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp = pad(q), pad(k), pad(v)
    grid = (bh, nq, nkv)

    in_specs = [
        pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [qp, kp, vp]
    if bias is not None:
        h = bias.shape[0]
        bias_p = jnp.pad(
            bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)),
            constant_values=0.0,
        )
        in_specs.append(
            pl.BlockSpec(
                (1, block_q, block_k),
                lambda i, j, kk, h=h: (i % h, j, kk),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(bias_p)
        kernel = functools.partial(
            _fwd_kernel, scale=scale, n_valid=n, block_k=block_k, nkv=nkv
        )
    else:
        kernel = functools.partial(
            _fwd_kernel_nobias, scale=scale, n_valid=n, block_k=block_k, nkv=nkv
        )

    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :n, :]


def _fwd_kernel_nobias(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr, **kw):
    _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, m_scr, l_scr, acc_scr, **kw)


# ----------------------------------------------------------------- backward
# Standard flash backward: with P = exp(S - rowmax...)/l precomputed via the
# saved statistics, using D = rowsum(dO * O):
#   dV = P^T dO ; dS = P * (dO V^T - D) ; dQ = dS K * scale ; dK = dS^T Q * scale


def _bwd_reference(q, k, v, bias, scale, o, do, n):
    """Non-kernel backward in plain XLA (numerically exact, O(N^2) memory
    per (b*h) slice — fine at document-page sequence lengths; swap in
    Pallas dQ/dKdV kernels for long-context workloads)."""
    qf, kf, vf = (x.astype(jnp.float32) for x in (q, k, v))
    s = jnp.einsum("znd,zmd->znm", qf, kf) * scale
    if bias is not None:
        h = bias.shape[0]
        s = s + jnp.tile(bias, (s.shape[0] // h, 1, 1))
    p = jax.nn.softmax(s, axis=-1)
    dof = do.astype(jnp.float32)
    dv = jnp.einsum("znm,znd->zmd", p, dof)
    dp = jnp.einsum("znd,zmd->znm", dof, vf)
    dvec = jnp.sum(dof * o.astype(jnp.float32), axis=-1, keepdims=True)
    ds = p * (dp - dvec)
    dq = jnp.einsum("znm,zmd->znd", ds, kf) * scale
    dk = jnp.einsum("znm,znd->zmd", ds, qf) * scale
    dbias = None
    if bias is not None:
        h = bias.shape[0]
        dbias = ds.reshape(-1, h, *ds.shape[1:]).sum(0)
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype), dbias


# ------------------------------------------------------------------- public


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7)
)
def _flash_core(q, k, v, bias, scale, block_q, block_k, interpret):
    return _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret)


def _flash_core_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    o = _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    return o, (q, k, v, bias, o)


def _flash_core_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, bias, o = res
    dq, dk, dv, dbias = _bwd_reference(q, k, v, bias, scale, o, do, q.shape[1])
    return dq, dk, dv, dbias


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,  # [H, N, N] additive (rel pos bias)
    scale: float | None = None,
    block_q: int = 128,
    block_k: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention; returns [B, N, H, D] (same layout as inputs)."""
    b, n, h, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    bias4 = None
    if bias is not None:
        bias4 = bias[0] if bias.ndim == 4 else bias  # accept [1,H,N,N]
    out = _flash_core(
        to_bh(q), to_bh(k), to_bh(v), bias4, scale, block_q, block_k, interpret
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
