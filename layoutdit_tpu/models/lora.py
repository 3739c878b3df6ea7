"""LoRA adapters for the DiT/BEiT encoder — parameter-efficient fine-tune.

The reference fine-tunes every encoder weight
(/root/reference/src/layoutdit/modeling/model.py:65-70 warm-starts the
full DiT and trains it end to end). On TPU pods the dominant *memory*
cost of that recipe is the optimizer state: AdamW keeps two fp32 moments
per parameter, so an 86M-param dit-base costs ~1GB of HBM before a
single activation. LoRA (Hu et al. 2021, arXiv:2106.09685) freezes the
pretrained weights and trains rank-r factors on the side:

    y = x @ W  +  (alpha / r) * (x @ A) @ B        A: [d_in, r], B: [r, d_out]

with B zero-initialized so the adapted model is exactly the pretrained
one at step 0. Only A/B (and the fresh detection heads, which have no
pretrained prior) receive optimizer moments — `optax.masked` gives the
frozen majority a stateless `MaskedNode`, so moments shrink from
O(params) to O(adapters + heads).

TPU shape of the design:

  * adapters live INSIDE each projection's param dict (`{"kernel", ...,
    "lora_a", "lora_b"}`), so every existing pytree machinery — stacked
    GPipe layers (parallel/pipeline.py), TP/FSDP specs
    (parallel/sharding.py), checkpointing — carries them with no new
    cases; layers stay homogeneous so `stack_layer_params` still stacks.
  * the delta is two skinny GEMMs ([N,d]x[d,r] then [N,r]x[r,d]); at
    r<=64 they ride the MXU's minor dimension and cost <2% of the frozen
    GEMM they shadow. No custom kernel is warranted.
  * under tensor parallelism A is replicated and B is column-sharded
    exactly like the kernel it adapts (row-parallel targets shard A's
    input dim instead), so the partitioner reuses the kernel's collective
    schedule for the delta.
  * `merge_lora` folds W += (alpha/r) A@B for serving/export — zero
    inference overhead, and the int8 path (ops/quant.py) quantizes the
    merged kernel.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Projections LoRA may target; mirrors the per-layer param-dict keys in
# models/vit.py init_vit_params.
LORA_TARGETS = ("q", "k", "v", "attn_out", "mlp_in", "mlp_out")


def lora_scaling(cfg) -> float:
    """alpha / r — the standard LoRA output scale."""
    return float(cfg.lora_alpha) / float(cfg.lora_rank)


def init_lora_entry(key: jax.Array, d_in: int, d_out: int, rank: int) -> dict:
    """A ~ N(0, 1/r) truncated, B = 0: the delta starts exactly zero, and
    A's scale keeps x@A unit-variance-ish so the first B gradients are
    well-conditioned (the LoRA paper's init)."""
    a = jax.random.truncated_normal(
        key, -2.0, 2.0, (d_in, rank), jnp.float32
    ) / jnp.sqrt(jnp.float32(rank))
    return {"lora_a": a, "lora_b": jnp.zeros((rank, d_out), jnp.float32)}


def add_lora_params(vit_params: dict, cfg, key: jax.Array) -> dict:
    """Return a copy of the encoder pytree with lora_a/lora_b added to the
    targeted projections of every layer. Idempotence guard: refuses to
    double-adapt."""
    if cfg.lora_rank <= 0:
        return vit_params
    unknown = set(cfg.lora_targets) - set(LORA_TARGETS)
    if unknown:
        raise ValueError(
            f"unknown lora_targets {sorted(unknown)}; valid: {LORA_TARGETS}"
        )
    out = dict(vit_params)
    layers = []
    keys = jax.random.split(key, max(1, len(vit_params["layers"])))
    for layer, lkey in zip(vit_params["layers"], keys):
        layer = dict(layer)
        tkeys = jax.random.split(lkey, max(1, len(cfg.lora_targets)))
        for name, tkey in zip(cfg.lora_targets, tkeys):
            if name not in layer:
                # MoE layers have no mlp_in/mlp_out; adapters target the
                # dense projections only.
                continue
            proj = dict(layer[name])
            if "lora_a" in proj:
                raise ValueError(f"layer already has LoRA on {name!r}")
            d_in, d_out = proj["kernel"].shape
            proj.update(init_lora_entry(tkey, d_in, d_out, cfg.lora_rank))
            layer[name] = proj
        layers.append(layer)
    out["layers"] = layers
    return out


def lora_delta(x: jnp.ndarray, p: dict, scale: float) -> jnp.ndarray:
    """(alpha/r) * (x @ A) @ B in the caller's compute dtype; fp32
    accumulation on both skinny GEMMs like every other projection."""
    a = p["lora_a"].astype(x.dtype)
    b = p["lora_b"].astype(x.dtype)
    h = jnp.dot(x, a, preferred_element_type=jnp.float32).astype(x.dtype)
    return (
        jnp.dot(h, b, preferred_element_type=jnp.float32) * scale
    ).astype(x.dtype)


def merge_lora(vit_params: dict, cfg) -> dict:
    """Fold every adapter into its kernel (W += (alpha/r) A@B, fp32) and
    strip the lora entries — the serving/export form. The merged model is
    numerically the trained one up to one fp32 rounding of the sum."""
    if cfg.lora_rank <= 0:
        return vit_params
    scale = lora_scaling(cfg)
    out = dict(vit_params)
    layers = []
    for layer in vit_params["layers"]:
        layer = dict(layer)
        for name in LORA_TARGETS:
            if name in layer and "lora_a" in layer[name]:
                proj = dict(layer[name])
                delta = (
                    proj["lora_a"].astype(jnp.float32)
                    @ proj["lora_b"].astype(jnp.float32)
                ) * scale
                proj["kernel"] = (
                    proj["kernel"].astype(jnp.float32) + delta
                ).astype(proj["kernel"].dtype)
                del proj["lora_a"], proj["lora_b"]
                layer[name] = proj
        layers.append(layer)
    out["layers"] = layers
    return out


def has_lora(vit_params: dict) -> bool:
    return any(
        "lora_a" in layer.get(name, {})
        for layer in vit_params.get("layers", ())
        for name in LORA_TARGETS
    )


def merge_lora_detector(params: dict, vit_cfg) -> dict:
    """merge_lora over the encoder inside a full detector param tree —
    the serving/export form (no-op when no adapters are present)."""
    bb = params.get("backbone", {})
    if "vit" not in bb or not has_lora(bb["vit"]):
        return params
    out = dict(params)
    out["backbone"] = dict(bb)
    out["backbone"]["vit"] = merge_lora(bb["vit"], vit_cfg)
    return out


def _is_lora_path(path) -> bool:
    return any(
        getattr(k, "key", None) in ("lora_a", "lora_b") for k in path
    )


def trainable_mask(detector_params: dict) -> dict:
    """Bool pytree over the FULL detector param tree: True = trainable.

    Policy (the LoRA recipe): the pretrained encoder
    (``backbone.vit``) is frozen except its adapters; everything
    trained from scratch — FPN, RPN/heads, DETR decoder, mask branch,
    the patch-independent detection stack — stays fully trainable (it
    has no pretrained prior to preserve)."""

    def pick(path, leaf):
        keys = tuple(getattr(k, "key", None) for k in path)
        in_encoder = len(keys) >= 2 and keys[0] == "backbone" and keys[1] == "vit"
        if not in_encoder:
            return True
        return _is_lora_path(path)

    return jax.tree_util.tree_map_with_path(pick, detector_params)


def frozen_mask(detector_params: dict) -> dict:
    return jax.tree_util.tree_map(lambda b: not b, trainable_mask(detector_params))


def num_trainable(detector_params: dict) -> tuple[int, int]:
    """(trainable, total) parameter counts under the LoRA policy."""
    mask = trainable_mask(detector_params)
    leaves = zip(
        jax.tree_util.tree_leaves(mask),
        jax.tree_util.tree_leaves(detector_params),
    )
    trainable = sum(x.size for m, x in leaves if m)
    total = sum(x.size for x in jax.tree_util.tree_leaves(detector_params))
    return int(trainable), int(total)
