"""Fused multiscale RoIAlign as Pallas TPU kernels (atlas formulation).

The XLA formulation (ops/roi_align.py) materializes a [K, P, C, W_max]
intermediate in HBM between the two separable contractions — ~820 MB per
bs16 step at PubLayNet shapes, and the same again (twice) in the backward:
the detector's single largest memory stream. These kernels keep that
intermediate in VMEM.

Operands come from the SAME level-atlas construction the XLA path uses
(multiscale_roi_align): one feature map [C, H_atlas, W_max] with levels
stacked along H, and level-masked separable weights Wy [K, P, H_atlas] /
Wx [K, P, W_max].

Mosaic-legality notes (probed on v5e): batched ``dot_general`` and
major-dim ``transpose((1,0,2))`` lower fine; merging/splitting the two
minor (tiled) dims does NOT — so the kernels never reshape across the
lane dim, and operands that would need a hard 2D transpose in-kernel
(Wx^T, Wy^T) are passed pre-transposed from XLA (they are tiny).

Forward, per block of KB rois (feature atlas resident in VMEM):
    wyb = broadcast(Wy)                 [W, KB*P, H]
    t2  = bmm_W(wyb, featW)             [W, KB*P, C]   (featW = [W, H, C])
    out = bmm_KP(broadcast(Wx), t2^T)   [KB*P, P, C] -> [KB, Py, Px, C]
Backward (dfeat only — proposals are stop-gradient'd):
    dt2 = bmm_KP(broadcast(Wx^T), dout) [KB*P, W, C]
    dF += bmm_W(broadcast(Wy^T), dt2^T) [W, H, C]      (accumulated)
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_KB = 8  # rois per block: keeps t2 + transpose + acc within VMEM


def _bmm(a, b):
    """Batched matmul over the leading dim, f32 accumulate."""
    return jax.lax.dot_general(
        a, b, (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )


def _fwd_kernel(featw_ref, wy_ref, wx_ref, out_ref, *, p: int):
    featw = featw_ref[:]  # [W, H, C] (resident across roi blocks)
    w_a, h_a, c = featw.shape
    kb = wx_ref.shape[0]

    # wy arrives pre-flattened [KB*P, H] (merging (KB, P) in-kernel would
    # reshape across the second-minor tiled dim — Mosaic rejects that)
    wy = wy_ref[:].astype(featw.dtype)[None]  # [1, KB*P, H]
    wyb = jnp.broadcast_to(wy, (w_a, kb * p, h_a))
    t2 = _bmm(wyb, featw).astype(featw.dtype)  # [W, KB*P, C]
    t2t = jnp.transpose(t2, (1, 0, 2))  # [KB*P(k,py), W, C]

    wx = wx_ref[:].astype(featw.dtype)  # [KB, P(px), W]
    wxb = jnp.broadcast_to(wx[:, None], (kb, p, p, w_a)).reshape(kb * p, p, w_a)
    out = _bmm(wxb, t2t)  # [KB*P(k,py), P(px), C]
    out_ref[:] = out.reshape(kb, p, p, c).astype(out_ref.dtype)


def _bwd_kernel(wyt_ref, wxt_ref, dout_ref, dfeat_ref, acc, *, p: int,
                nblocks: int):
    # grid = (w_blocks, roi_blocks); roi axis innermost so the [WB, H, C]
    # f32 accumulator is valid across it. Blocking the output over W is
    # what keeps scoped VMEM under the 16 MB cap (a full-[W, H, C]
    # accumulator + transients measured 21.4M on v5e at PubLayNet shapes).
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    wxt = wxt_ref[:]  # [KB, WB, P(px)] bf16 (pre-transposed in XLA)
    kb, wb, _ = wxt.shape
    dout = dout_ref[:]  # [KB, P(py), P(px), C]
    c = dout.shape[-1]
    wxtb = jnp.broadcast_to(wxt[:, None], (kb, p, wb, p)).reshape(
        kb * p, wb, p
    )
    dout2 = dout.astype(wxt.dtype).reshape(kb * p, p, c)  # [(k,py), px, C]
    dt2 = _bmm(wxtb, dout2).astype(wxt.dtype)  # [(k,py), WB, C]
    dt2t = jnp.transpose(dt2, (1, 0, 2))  # [WB, (k,py), C]

    wyt = wyt_ref[0]  # [H, KB*P] bf16 (pre-transposed in XLA, per block)
    h_a = wyt.shape[0]
    wytb = jnp.broadcast_to(wyt[None], (wb, h_a, kb * p))
    acc[:] += _bmm(wytb, dt2t)  # [WB, H, C] f32

    @pl.when(j == nblocks - 1)
    def _():
        dfeat_ref[:] = acc[:].astype(dfeat_ref.dtype)


def _pad_rois(x, k_pad):
    return jnp.pad(x, ((0, k_pad - x.shape[0]),) + ((0, 0),) * (x.ndim - 1))


def _fwd(feature, wy, wx, kb, interpret):
    """feature [C, H, W]; wy [K, P, H]; wx [K, P, W] -> [K, Py, Px, C]."""
    c, h_a, w_a = feature.shape
    k, p, _ = wy.shape
    k_pad = (k + kb - 1) // kb * kb
    wy_p, wx_p = _pad_rois(wy, k_pad), _pad_rois(wx, k_pad)
    featw = feature.transpose(2, 1, 0)  # [W, H, C] (one XLA relayout)
    wy2 = wy_p.reshape(k_pad * p, h_a)  # pre-flattened for the kernel

    out = pl.pallas_call(
        functools.partial(_fwd_kernel, p=p),
        grid=(k_pad // kb,),
        in_specs=[
            pl.BlockSpec((w_a, h_a, c), lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb * p, h_a), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, p, w_a), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kb, p, p, c), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k_pad, p, p, c), feature.dtype),
        interpret=interpret,
    )(featw, wy2.astype(feature.dtype), wx_p.astype(feature.dtype))
    return out[:k]


DEFAULT_WB = 16  # dfeat rows (atlas W) per backward block


def _bwd(wy, wx, dout, kb, interpret, wb: int = DEFAULT_WB):
    """-> dfeat [C, H, W] (shapes/dtype derived from the operands)."""
    dtype = dout.dtype
    h_a, w_a, c = wy.shape[-1], wx.shape[-1], dout.shape[-1]
    k, p, _ = wy.shape
    k_pad = (k + kb - 1) // kb * kb
    nblocks = k_pad // kb
    w_pad = (w_a + wb - 1) // wb * wb
    wy_p, wx_p = _pad_rois(wy, k_pad), _pad_rois(wx, k_pad)
    dout_p = _pad_rois(dout, k_pad)
    # pre-transposed operands (tiny; avoids in-kernel lane<->sublane swaps)
    wyt = wy_p.astype(dtype).reshape(nblocks, kb * p, h_a).transpose(0, 2, 1)
    wxt = jnp.pad(
        wx_p.astype(dtype).transpose(0, 2, 1),  # [K_pad, W, P]
        ((0, 0), (0, w_pad - w_a), (0, 0)),
    )

    dfeat_w = pl.pallas_call(
        functools.partial(_bwd_kernel, p=p, nblocks=nblocks),
        grid=(w_pad // wb, nblocks),
        in_specs=[
            pl.BlockSpec((1, h_a, kb * p), lambda iw, j: (j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, wb, p), lambda iw, j: (j, iw, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kb, p, p, c), lambda iw, j: (j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((wb, h_a, c), lambda iw, j: (iw, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((w_pad, h_a, c), dtype),
        scratch_shapes=[pltpu.VMEM((wb, h_a, c), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=interpret,
    )(wyt, wxt, dout_p.astype(dtype))
    return dfeat_w[:w_a].transpose(2, 1, 0)  # [C, H, W]


# -------------------------------------------------------------- public VJP


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def pooled_atlas_pallas(feature, wy, wx, kb=DEFAULT_KB, interpret=False):
    """Fused atlas RoIAlign: feature [C, H, W] + separable level-masked
    weights -> pooled [K, Py, Px, C], with both the forward intermediate
    and the backward's kept in VMEM."""
    return _fwd(feature, wy, wx, kb, interpret)


def _vjp_fwd(feature, wy, wx, kb, interpret):
    out = _fwd(feature, wy, wx, kb, interpret)
    return out, (wy, wx)


def _vjp_bwd(kb, interpret, res, dout):
    wy, wx = res
    dfeat = _bwd(wy, wx, dout, kb, interpret)
    return dfeat, jnp.zeros_like(wy), jnp.zeros_like(wx)


pooled_atlas_pallas.defvjp(_vjp_fwd, _vjp_bwd)
