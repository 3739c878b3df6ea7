"""Ring attention: exact attention over a sequence-sharded mesh axis.

Megatron-style SP (vit.py seq_sharding) keeps the residual stream
token-sharded but the XLA partitioner still all-gathers K/V (and
materializes [B, H, N_local, N] score tiles) inside attention — fine at
dit-base lengths, but the N² term owns memory at very high resolution
(a 2048 px page is ~16k tokens). Ring attention keeps Q, K, V, and the
output sharded N/P per device for the whole computation: each device
accumulates online-softmax partials for its Q shard while the K/V
shards rotate around the mesh axis via ``lax.ppermute`` — P steps, each
overlapping a neighbor exchange with a block of compute, the classic
ICI-friendly schedule (Liu et al. 2023's blockwise pattern; the public
"scaling-book" collective recipe). Memory per device: O(N/P · D) + one
[B, H, N/P, N/P] tile.

Exactness: identical math to softmax attention (online rescaling is the
flash-attention recurrence); gradients come from plain JAX autodiff
through the scan (ppermute transposes to the reverse rotation).

Restrictions: no attention bias (dit/absolute-pos models — rel-pos BEiT
checkpoints keep the XLA/flash paths), sequence padded up to the axis
size with masked keys (handled here; callers pass ragged N).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

# big-but-finite init for the running max: masked scores are -inf, and
# exp(-inf - NEG_INIT) = 0 stays exact while exp(s - m) for the first
# real block is well-defined (an -inf init would give inf - inf = nan
# when a whole block is masked)
_NEG_INIT = -1e30


def _ring_body(q, k0, v0, kmask0, *, axis_name: str, n_dev: int,
               scale: float):
    """Per-device shard_map body.

    q, k0, v0: [B, Nl, H, D] local shards; kmask0: [Nl] key validity.
    Returns [B, Nl, H, D] attention output for the local Q shard.
    """
    b, nl, h, d = q.shape
    qf = q.astype(jnp.float32).transpose(0, 2, 1, 3)  # [B, H, Nl, D]

    def step(carry, _):
        o, m, l, k_blk, v_blk, mask_blk = carry
        s = jnp.einsum(
            "bhnd,bmhd->bhnm", qf, k_blk.astype(jnp.float32)
        ) * scale
        s = jnp.where(mask_blk[None, None, None, :], s, -jnp.inf)
        m_new = jnp.maximum(m, s.max(axis=-1))
        p = jnp.exp(s - m_new[..., None])  # masked -> exp(-inf) = 0
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1)
        o_new = o * alpha[..., None] + jnp.einsum(
            "bhnm,bmhd->bhnd", p, v_blk.astype(jnp.float32)
        )
        perm = [(i, (i + 1) % n_dev) for i in range(n_dev)]
        k_nxt = lax.ppermute(k_blk, axis_name, perm)
        v_nxt = lax.ppermute(v_blk, axis_name, perm)
        mask_nxt = lax.ppermute(mask_blk, axis_name, perm)
        return (o_new, m_new, l_new, k_nxt, v_nxt, mask_nxt), None

    # inits derived from qf so shard_map types them as device-varying
    # (a literal zeros init is "unvarying" and fails the scan carry check)
    init = (
        jnp.zeros_like(qf),
        jnp.full_like(qf[..., 0], _NEG_INIT),
        jnp.zeros_like(qf[..., 0]),
        k0, v0, kmask0,
    )
    (o, _, l, _, _, _), _ = lax.scan(step, init, None, length=n_dev)
    out = o / l[..., None]
    return out.transpose(0, 2, 1, 3).astype(q.dtype)  # [B, Nl, H, D]


def ring_attention_sharded(q, k, v, seq_sharding, scale: float):
    """Exact attention with q/k/v [B, N, H, D] sharded over the token
    axis of ``seq_sharding`` (a NamedSharding like P(None, axis, None)).
    Pads N up to a multiple of the axis size with masked keys."""
    mesh = seq_sharding.mesh
    axis = seq_sharding.spec[1]
    if axis is None:
        raise ValueError("seq_sharding has no token axis to ring over")
    n_dev = mesh.shape[axis]
    b, n, h, d = q.shape
    n_pad = (-n) % n_dev
    if n_pad:
        pad4 = ((0, 0), (0, n_pad), (0, 0), (0, 0))
        q = jnp.pad(q, pad4)
        k = jnp.pad(k, pad4)
        v = jnp.pad(v, pad4)
    kmask = jnp.arange(n + n_pad) < n

    fn = jax.shard_map(
        partial(_ring_body, axis_name=axis, n_dev=n_dev, scale=scale),
        mesh=mesh,
        in_specs=(
            P(None, axis, None, None), P(None, axis, None, None),
            P(None, axis, None, None), P(axis),
        ),
        out_specs=P(None, axis, None, None),
    )
    out = fn(q, k, v, kmask)
    return out[:, :n] if n_pad else out
