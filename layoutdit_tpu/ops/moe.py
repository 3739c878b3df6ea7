"""Mixture-of-Experts MLP (Switch/GShard style) for the ViT encoder.

New capability beyond the reference (SURVEY.md §2.3 lists expert
parallelism as absent upstream): a token-routed sparse MLP whose expert
dimension shards over the mesh's 'model' axis — expert parallelism in
the same declarative-SPMD style as the TP/SP/PP paths (GSPMD inserts the
all-to-all-shaped collectives from the parameter shardings alone).

TPU-first formulation: routing is expressed as dense one-hot dispatch /
combine einsums over a STATIC per-group capacity (the Mesh-TF / GShard
/ Flax pattern) so the whole layer is shape-static and jits — no
gather/scatter with data-dependent shapes. The dispatch tensors are
[B, S, E, C] one-hots contracted on the MXU; tokens beyond an expert's
capacity are dropped (their gate is zero, the residual connection
carries them through — standard Switch semantics).

Routing scheme:
  * router logits/softmax in fp32 (like LN/softmax elsewhere),
  * top-1 (Switch): gate = raw router prob — keeps the router gradient,
  * top-k>1 (Mixtral/GShard): gates renormalized over the chosen k,
  * capacity C = ceil(S * k * capacity_factor / E) per batch group,
    choice-major priority (all first choices fill before second choices),
    token-order priority within a choice,
  * load-balance aux loss (Switch eq. 4): E * sum_e f_e * P_e, where f_e
    is the fraction of tokens whose first choice is e and P_e the mean
    router probability — minimized at uniform routing where it equals 1.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def moe_capacity(tokens: int, num_experts: int, top_k: int,
                 capacity_factor: float) -> int:
    """Static per-group expert capacity (min 1 slot, min top_k total)."""
    return max(top_k, int(math.ceil(tokens * top_k * capacity_factor / num_experts)))


def init_moe_mlp_params(key: jax.Array, hidden_size: int,
                        intermediate_size: int, num_experts: int,
                        initializer_range: float = 0.02) -> dict:
    """Per-layer MoE params. Keys are distinct from the dense mlp_in /
    mlp_out so the TP sharding rules (parallel/sharding.py) can give the
    expert-stacked kernels their EP layout (E sharded over 'model')."""
    d, f, e = hidden_size, intermediate_size, num_experts
    k_r, k_in, k_out = jax.random.split(key, 3)

    def tn(k, shape):
        return (
            jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)
            * initializer_range
        )

    return {
        "router": {"kernel": tn(k_r, (d, e))},
        "moe_in": {
            "kernel": tn(k_in, (e, d, f)),
            "bias": jnp.zeros((e, f), jnp.float32),
        },
        "moe_out": {
            "kernel": tn(k_out, (e, f, d)),
            "bias": jnp.zeros((e, d), jnp.float32),
        },
    }


def moe_mlp(
    y: jnp.ndarray,  # [B, S, D] (post-LN block input)
    params: dict,  # {"router", "moe_in", "moe_out"} as initialized above
    num_experts: int,
    top_k: int = 1,
    capacity_factor: float = 1.25,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Sparse MLP: route each token to its top-k experts, apply the
    expert GELU-MLPs at static capacity, combine gated outputs.

    Returns (out [B, S, D] in y.dtype, aux_loss fp32 scalar).
    """
    b, s, d = y.shape
    e, k = num_experts, top_k
    c = moe_capacity(s, e, k, capacity_factor)

    y32 = y.astype(jnp.float32)
    logits = jnp.dot(y32, params["router"]["kernel"].astype(jnp.float32))
    probs = jax.nn.softmax(logits, axis=-1)  # [B, S, E] fp32

    # top-k by iterative argmax (k is 1 or 2 in practice; unrolled at trace)
    remaining = probs
    choice_onehot: list[jnp.ndarray] = []
    choice_gate: list[jnp.ndarray] = []
    for _ in range(k):
        idx = jnp.argmax(remaining, axis=-1)  # [B, S]
        oh = jax.nn.one_hot(idx, e, dtype=jnp.float32)
        choice_onehot.append(oh)
        choice_gate.append(jnp.sum(remaining * oh, axis=-1))
        remaining = remaining * (1.0 - oh)
    gates = jnp.stack(choice_gate)  # [k, B, S]
    if k > 1:
        gates = gates / jnp.maximum(gates.sum(0, keepdims=True), 1e-9)

    # Switch load-balance loss on the first-choice assignment.
    frac = choice_onehot[0].mean(axis=(0, 1))  # [E]
    prob_mean = probs.mean(axis=(0, 1))  # [E]
    aux = e * jnp.sum(frac * prob_mean)

    # Capacity slots: choice-major, token-order priority within a choice.
    combine = jnp.zeros((b, s, e, c), jnp.float32)
    dispatch = jnp.zeros((b, s, e, c), jnp.float32)
    fill = jnp.zeros((b, e), jnp.float32)  # slots already taken per expert
    for j in range(k):
        oh = choice_onehot[j]  # [B, S, E]
        rank = jnp.cumsum(oh, axis=1) - oh  # rank among this choice's tokens
        pos = rank + fill[:, None, :]
        keep = oh * (pos < c)  # [B, S, E]
        slot = jnp.sum(pos * keep, axis=-1).astype(jnp.int32)  # [B, S]
        disp_j = keep[..., None] * jax.nn.one_hot(slot, c, dtype=jnp.float32)[
            :, :, None, :
        ]
        dispatch = dispatch + disp_j
        combine = combine + gates[j][..., None, None] * disp_j
        fill = fill + keep.sum(axis=1)

    # Expert compute: one [E, G, D] x [E, D, F] batched GEMM pair. E is the
    # EP axis — with moe_in/moe_out sharded P('model', ...) GSPMD runs each
    # expert's GEMMs on its owning shard and inserts the token exchange.
    disp = dispatch.astype(y.dtype)
    xin = jnp.einsum(
        "bsec,bsd->ebcd", disp, y, preferred_element_type=jnp.float32
    ).astype(y.dtype).reshape(e, b * c, d)
    w_in = params["moe_in"]["kernel"].astype(y.dtype)
    h = jnp.einsum(
        "egd,edf->egf", xin, w_in, preferred_element_type=jnp.float32
    ) + params["moe_in"]["bias"][:, None, :]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(y.dtype)
    w_out = params["moe_out"]["kernel"].astype(y.dtype)
    out_e = jnp.einsum(
        "egf,efd->egd", h, w_out, preferred_element_type=jnp.float32
    ) + params["moe_out"]["bias"][:, None, :]
    out = jnp.einsum(
        "ebcd,bsec->bsd",
        out_e.reshape(e, b, c, d).astype(jnp.float32),
        combine,
    )
    return out.astype(y.dtype), aux
