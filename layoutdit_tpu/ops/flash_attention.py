"""Blockwise flash attention (Pallas TPU kernels) with custom VJP.

The reference's attention is HF BeitSelfAttention — materialized
[B, H, N, N] scores in HBM (modeling_beit.py, SURVEY.md §2.2). This kernel
never materializes the score matrix: Q-blocks iterate over KV-blocks with
an online-softmax running (max, sum, accumulator) in VMEM scratch, so HBM
traffic is O(N*D) and longer sequences (high-res document pages) scale
blockwise (BASELINE.json north star; SURVEY.md §2.3 note).

Layout: inputs [B, N, H, D] (the encoder's natural layout), computed as a
(B*H, q-block, kv-block) grid. Supports an additive attention bias
[H, N, N] (BEiT relative position bias) and right-padding of N to the
block size.

Backward: Pallas kernels (dKdV sweep over q-blocks, dQ sweep over
kv-blocks) using the standard recompute-with-lse flash formulation — the
forward saves only (o, lse); p is recomputed blockwise so backward HBM
traffic is also O(N*D). The bias path (BEiT relative position bias) adds
a third kernel that recomputes dS blockwise and reduces it over the batch
grid dimension into a resident [H, Nq, Nk] block — no O(B*H*N^2) gradient
tensor is ever materialized.

Measured on v5e (see scripts/bench_attention.py): at the reference's
224*224 resolution (N=197) XLA's batched-matmul attention wins (grid
overhead dominates at two blocks per head), so the encoder default stays
"xla" there; from N~=1k upward the flash kernel wins (1.7x at N=4096
forward) — ``attention_impl="auto"`` picks per-shape.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30

# Measured v5e crossover (scripts/bench_attention_sizes.py, full 12-layer
# encoder on chip): XLA batched attention wins at 1025 tokens (16.6 vs
# 20.1 ms), ties at 2117 (24.9 vs 23.6), and flash wins 2.6x at 4097
# (82.4 vs 31.1 ms — XLA's O(N^2) f32 score tensor blows past cache).
AUTO_FLASH_MIN_SEQ = 2048
MAX_BLOCK = 512


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _auto_blocks(n: int, block_q: int | None, block_k: int | None):
    """Largest block up to MAX_BLOCK — fewer grid steps beat smaller
    tiles at ViT-scale head dims (measured)."""
    default = min(MAX_BLOCK, _ceil_to(n, 128))
    return block_q or default, block_k or default


# ------------------------------------------------------------------ forward


def _fwd_kernel(q_ref, k_ref, v_ref, bias_ref, o_ref, lse_ref,
                m_scr, l_scr, acc_scr,
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
        l_safe = jnp.maximum(l_scr[:], 1e-30)
        o_ref[0] = (acc_scr[:] / l_safe).astype(o_ref.dtype)
        # replicated across the 128-lane minor dim (Mosaic block tiling
        # requires (8,128)-divisible trailing dims; a [*, Bq] row vector
        # is not expressible as an output block)
        lse_ref[0] = jnp.broadcast_to(
            m_scr[:] + jnp.log(l_safe), lse_ref[0].shape
        )


def _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    """-> (o [BH, N, D], lse [BH, N_pad, 128] fp32, lane-replicated)."""
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

    out, lse = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, 128), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, 1), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        interpret=interpret,
    )(*args)
    return out[:, :n, :], lse


def _fwd_kernel_nobias(q_ref, k_ref, v_ref, o_ref, lse_ref,
                       m_scr, l_scr, acc_scr, **kw):
    _fwd_kernel(q_ref, k_ref, v_ref, None, o_ref, lse_ref,
                m_scr, l_scr, acc_scr, **kw)


# ----------------------------------------------------------------- backward
# Standard flash backward with saved lse and D = rowsum(dO * O):
#   p  = exp(S - lse) ; dV = p^T dO ; dP = dO V^T
#   dS = p * (dP - D) ; dQ = dS K * scale ; dK = dS^T Q * scale


def _recompute_p(q_ref, k_ref, lse_ref, *, scale, n_valid, block_k, kv_i,
                 bias=None):
    q = q_ref[0].astype(jnp.float32)
    k = k_ref[0].astype(jnp.float32)
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)  # before the col mask, as forward
    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + kv_i * block_k
    s = jnp.where(col < n_valid, s, NEG_INF)
    # lse is lane-replicated [Bq, 128]; a max-reduce recovers the scalar
    lse = jnp.max(lse_ref[0], axis=1, keepdims=True)
    return jnp.exp(s - lse)  # [Bq, Bk]


def _dvec(o_ref, do_ref):
    """D = rowsum(dO * O) [Bq, 1], computed in-kernel (a [*, Bq] row-vector
    input block would violate Mosaic tiling)."""
    return jnp.sum(
        do_ref[0].astype(jnp.float32) * o_ref[0].astype(jnp.float32),
        axis=1, keepdims=True,
    )


def _bwd_dkdv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, bias_ref,
                     dk_ref, dv_ref, dk_scr, dv_scr,
                     *, scale, n_valid, block_k, nq):
    q_i = pl.program_id(2)

    @pl.when(q_i == 0)
    def _():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    p = _recompute_p(q_ref, k_ref, lse_ref, scale=scale, n_valid=n_valid,
                     block_k=block_k, kv_i=pl.program_id(1),
                     bias=None if bias_ref is None else bias_ref[0])
    do = do_ref[0].astype(jnp.float32)  # [Bq, D]
    # dV += P^T dO
    dv_scr[:] += jax.lax.dot_general(
        p, do, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # dS = P * (dO V^T - D)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [Bq, Bk]
    ds = p * (dp - _dvec(o_ref, do_ref))
    # dK += dS^T Q * scale
    dk_scr[:] += jax.lax.dot_general(
        ds, q_ref[0].astype(jnp.float32), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(q_i == nq - 1)
    def _():
        dk_ref[0] = dk_scr[:].astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].astype(dv_ref.dtype)


def _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, bias_ref,
                   dq_ref, dq_scr, *, scale, n_valid, block_k, nkv):
    kv_i = pl.program_id(2)

    @pl.when(kv_i == 0)
    def _():
        dq_scr[:] = jnp.zeros_like(dq_scr)

    p = _recompute_p(q_ref, k_ref, lse_ref, scale=scale, n_valid=n_valid,
                     block_k=block_k, kv_i=kv_i,
                     bias=None if bias_ref is None else bias_ref[0])
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - _dvec(o_ref, do_ref))
    dq_scr[:] += jax.lax.dot_general(
        ds, k_ref[0].astype(jnp.float32), (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ) * scale

    @pl.when(kv_i == nkv - 1)
    def _():
        dq_ref[0] = dq_scr[:].astype(dq_ref.dtype)


def _bwd_dkdv_nobias(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                     dk_ref, dv_ref, dk_scr, dv_scr, **kw):
    _bwd_dkdv_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, None,
                     dk_ref, dv_ref, dk_scr, dv_scr, **kw)


def _bwd_dq_nobias(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref,
                   dq_ref, dq_scr, **kw):
    _bwd_dq_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, None,
                   dq_ref, dq_scr, **kw)


def _dbias_kernel(q_ref, k_ref, v_ref, o_ref, do_ref, lse_ref, bias_ref,
                  dbias_ref, *, scale, n_valid, block_k):
    """dbias[h, i, j] = sum_b dS[b*H+h, i, j], accumulated in the resident
    output block over the INNERMOST batch grid dimension (the output index
    map is constant in b, so the block stays in VMEM across the sweep)."""
    b_i = pl.program_id(3)
    p = _recompute_p(q_ref, k_ref, lse_ref, scale=scale, n_valid=n_valid,
                     block_k=block_k, kv_i=pl.program_id(2),
                     bias=bias_ref[0])
    do = do_ref[0].astype(jnp.float32)
    dp = jax.lax.dot_general(
        do, v_ref[0].astype(jnp.float32), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - _dvec(o_ref, do_ref))

    @pl.when(b_i == 0)
    def _():
        dbias_ref[0] = ds

    @pl.when(b_i != 0)
    def _():
        dbias_ref[0] += ds


def _flash_bwd(q, k, v, bias, o, lse, do, scale, block_q, block_k, interpret):
    """Pallas backward -> (dq, dk, dv, dbias-or-None). The bias path adds a
    third kernel that recomputes dS blockwise and reduces it over the batch
    grid dim — backward HBM traffic stays O(N*D) + the [H, N, N] dbias
    itself (which is the size of the bias operand, hence unavoidable)."""
    bh, n, d = q.shape
    n_pad = _ceil_to(n, max(block_q, block_k))
    nq = n_pad // block_q
    nkv = n_pad // block_k

    def pad(x):
        return jnp.pad(x, ((0, 0), (0, n_pad - n), (0, 0)))

    qp, kp, vp, op, dop = pad(q), pad(k), pad(v), pad(o), pad(do)
    # residual lse is [BH, N, 1] (one lane); the kernels read it as a
    # lane-replicated [*, 128] block — a cheap XLA broadcast here.
    lse = jnp.broadcast_to(lse[:, :, :1], (bh, lse.shape[1], 128))
    if lse.shape[1] != n_pad:
        lse = jnp.pad(lse, ((0, 0), (0, n_pad - lse.shape[1]), (0, 0)))

    h = None
    bias_p = None
    if bias is not None:
        h = bias.shape[0]
        bias_p = jnp.pad(
            bias, ((0, 0), (0, n_pad - n), (0, n_pad - n)),
            constant_values=0.0,
        )

    q_spec = pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, kk, 0),
                          memory_space=pltpu.VMEM)
    kv_spec = pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, j, 0),
                           memory_space=pltpu.VMEM)
    row_spec = pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, kk, 0),
                            memory_space=pltpu.VMEM)
    dkdv_specs = [q_spec, kv_spec, kv_spec, q_spec, q_spec, row_spec]
    dkdv_args = [qp, kp, vp, op, dop, lse]
    if bias is None:
        dkdv_kernel = functools.partial(
            _bwd_dkdv_nobias, scale=scale, n_valid=n, block_k=block_k, nq=nq
        )
    else:
        # bias rows follow the q grid dim (kk), cols the kv dim (j)
        dkdv_specs.append(
            pl.BlockSpec((1, block_q, block_k),
                         lambda i, j, kk, h=h: (i % h, kk, j),
                         memory_space=pltpu.VMEM)
        )
        dkdv_args.append(bias_p)
        dkdv_kernel = functools.partial(
            _bwd_dkdv_kernel, scale=scale, n_valid=n, block_k=block_k, nq=nq
        )
    dk, dv = pl.pallas_call(
        dkdv_kernel,
        grid=(bh, nkv, nq),  # kv outer, q inner (accumulate over q)
        in_specs=dkdv_specs,
        out_specs=[
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, n_pad, d), k.dtype),
            jax.ShapeDtypeStruct((bh, n_pad, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_k, d), jnp.float32),
            pltpu.VMEM((block_k, d), jnp.float32),
        ],
        interpret=interpret,
    )(*dkdv_args)

    q_spec2 = pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                           memory_space=pltpu.VMEM)
    kv_spec2 = pl.BlockSpec((1, block_k, d), lambda i, j, kk: (i, kk, 0),
                            memory_space=pltpu.VMEM)
    row_spec2 = pl.BlockSpec((1, block_q, 128), lambda i, j, kk: (i, j, 0),
                             memory_space=pltpu.VMEM)
    dq_specs = [q_spec2, kv_spec2, kv_spec2, q_spec2, q_spec2, row_spec2]
    dq_args = [qp, kp, vp, op, dop, lse]
    if bias is None:
        dq_kernel = functools.partial(
            _bwd_dq_nobias, scale=scale, n_valid=n, block_k=block_k, nkv=nkv
        )
    else:
        dq_specs.append(
            pl.BlockSpec((1, block_q, block_k),
                         lambda i, j, kk, h=h: (i % h, j, kk),
                         memory_space=pltpu.VMEM)
        )
        dq_args.append(bias_p)
        dq_kernel = functools.partial(
            _bwd_dq_kernel, scale=scale, n_valid=n, block_k=block_k, nkv=nkv
        )
    dq = pl.pallas_call(
        dq_kernel,
        grid=(bh, nq, nkv),  # q outer, kv inner (accumulate over kv)
        in_specs=dq_specs,
        out_specs=pl.BlockSpec((1, block_q, d), lambda i, j, kk: (i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((bh, n_pad, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        interpret=interpret,
    )(*dq_args)

    dbias = None
    if bias is not None:
        b = bh // h
        bq_spec = pl.BlockSpec(
            (1, block_q, d), lambda hh, j, kk, bb, h=h: (bb * h + hh, j, 0),
            memory_space=pltpu.VMEM)
        bkv_spec = pl.BlockSpec(
            (1, block_k, d), lambda hh, j, kk, bb, h=h: (bb * h + hh, kk, 0),
            memory_space=pltpu.VMEM)
        brow_spec = pl.BlockSpec(
            (1, block_q, 128), lambda hh, j, kk, bb, h=h: (bb * h + hh, j, 0),
            memory_space=pltpu.VMEM)
        bbias_spec = pl.BlockSpec(
            (1, block_q, block_k), lambda hh, j, kk, bb: (hh, j, kk),
            memory_space=pltpu.VMEM)
        dbias = pl.pallas_call(
            functools.partial(_dbias_kernel, scale=scale, n_valid=n,
                              block_k=block_k),
            # batch INNERMOST: the output block (constant in bb) stays
            # resident in VMEM while dS accumulates over the batch
            grid=(h, nq, nkv, b),
            in_specs=[bq_spec, bkv_spec, bkv_spec, bq_spec, bq_spec,
                      brow_spec, bbias_spec],
            out_specs=pl.BlockSpec(
                (1, block_q, block_k), lambda hh, j, kk, bb: (hh, j, kk),
                memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((h, n_pad, n_pad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "parallel",
                                     "arbitrary"),
            ),
            interpret=interpret,
        )(qp, kp, vp, op, dop, lse, bias_p)
        dbias = dbias[:, :n, :n].astype(bias.dtype)
    return dq[:, :n, :], dk[:, :n, :], dv[:, :n, :], dbias


def _bwd_reference(q, k, v, bias, scale, o, do, n):
    """Non-kernel backward in plain XLA (numerically exact, O(N^2) memory
    per (b*h) slice) — kept as the differential ORACLE for the Pallas
    backward kernels (tests/test_flash_attention.py); no production path
    uses it."""
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
    o, _ = _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    return o


def _flash_core_fwd(q, k, v, bias, scale, block_q, block_k, interpret):
    o, lse = _flash_fwd(q, k, v, bias, scale, block_q, block_k, interpret)
    # The kernel emits lse lane-replicated [BH, N_pad, 128] (Mosaic block
    # tiling cannot express a [*, Bq] row-vector output). Keep only ONE
    # lane as the residual — 128x less HBM held across the layer stack —
    # and re-broadcast in the backward.
    return o, (q, k, v, bias, o, lse[:, :, :1])


def _flash_core_bwd(scale, block_q, block_k, interpret, res, do):
    q, k, v, bias, o, lse = res
    dq, dk, dv, dbias = _flash_bwd(
        q, k, v, bias, o, lse, do, scale, block_q, block_k, interpret
    )
    return dq, dk, dv, dbias


_flash_core.defvjp(_flash_core_fwd, _flash_core_bwd)


def flash_attention(
    q: jnp.ndarray,  # [B, N, H, D]
    k: jnp.ndarray,
    v: jnp.ndarray,
    bias: jnp.ndarray | None = None,  # [H, N, N] additive (rel pos bias)
    scale: float | None = None,
    block_q: int | None = None,
    block_k: int | None = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """Fused attention; returns [B, N, H, D] (same layout as inputs)."""
    b, n, h, d = q.shape
    if scale is None:
        scale = 1.0 / np.sqrt(d)
    block_q, block_k = _auto_blocks(n, block_q, block_k)

    def to_bh(x):
        return x.transpose(0, 2, 1, 3).reshape(b * h, n, d)

    bias4 = None
    if bias is not None:
        bias4 = bias[0] if bias.ndim == 4 else bias  # accept [1,H,N,N]
    out = _flash_core(
        to_bh(q), to_bh(k), to_bh(v), bias4, scale, block_q, block_k, interpret
    )
    return out.reshape(b, h, n, d).transpose(0, 2, 1, 3)
