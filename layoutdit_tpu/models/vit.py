"""DiT/BEiT ViT encoder, TPU-native.

Reimplements the behavior the reference imports from HF transformers
(``AutoModel.from_pretrained("microsoft/dit-base")`` with
``output_hidden_states=True`` — /root/reference/src/layoutdit/modeling/
dit_backbone.py:25-47) as pure functions over a parameter pytree:

  * patchify is a reshape + one big matmul (exactly a stride-16 conv,
    but stated in MXU-native form),
  * attention is fused QK^T-softmax-V einsums with fp32 softmax
    (optionally the Pallas flash-attention kernel, see ops/),
  * BEiT specifics faithfully: pre-LN (eps 1e-12), K projection without
    bias, layer-scale lambda_1/lambda_2, CLS token, absolute position
    embeddings and/or (shared) relative position bias,
  * ``hidden_states`` parity: index 0 is the embedding output, index i is
    the output of layer i (pre final-LN), so the detection backbone can tap
    layers [d/3, d/2, 2d/3, d] exactly like the reference.

Everything is shape-static; precision policy: params fp32, matmul inputs
cast to ``compute_dtype``, LayerNorm/softmax statistics in fp32.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    hidden_size: int = 768
    num_hidden_layers: int = 12
    num_attention_heads: int = 12
    intermediate_size: int = 3072
    patch_size: int = 16
    image_size: int = 224
    num_channels: int = 3
    layer_norm_eps: float = 1e-12
    # microsoft/dit-base: absolute position embeddings, layer scale 0.1,
    # no relative position bias.
    use_absolute_position_embeddings: bool = True
    use_relative_position_bias: bool = False
    use_shared_relative_position_bias: bool = False
    layer_scale_init_value: float = 0.1
    initializer_range: float = 0.02
    # Mixture-of-Experts MLP (ops/moe.py) — new capability beyond the
    # reference (SURVEY §2.3: expert parallelism absent upstream).
    # 0 = dense (reference parity). When > 0, every moe_every_n-th block
    # (1-based layer index divisible by moe_every_n) replaces its dense
    # MLP with num_experts token-routed experts; the expert dimension
    # shards over the mesh's 'model' axis (expert parallelism).
    num_experts: int = 0
    moe_top_k: int = 1
    moe_capacity_factor: float = 1.25
    moe_every_n: int = 2
    moe_aux_weight: float = 0.01
    # LoRA adapters (models/lora.py) — parameter-efficient fine-tuning of
    # the pretrained encoder. 0 = off (full fine-tune, reference parity).
    # When > 0, every targeted projection gains rank-r factors
    # (y += alpha/r * x A B, B zero-init) and the Trainer freezes the
    # non-adapter encoder weights (optax.masked — no moments allocated).
    lora_rank: int = 0
    lora_alpha: float = 16.0
    lora_targets: tuple[str, ...] = ("q", "v")
    # ViTDet-style windowed attention for high-res pages (beyond the
    # reference — its grid is pinned at 14x14, dit_backbone.py:44-47,
    # where windowing is pointless). window_size W > 0 restricts
    # attention in non-global layers to W x W patch windows: at a 64x64
    # grid (1024 px) that cuts score FLOPs ~(grid/W)^2 per windowed
    # layer, and W=16 windows are 256 tokens — exactly two 128-lane MXU
    # tiles, no padding waste. global_attn_layers (1-based) keep full
    # attention for cross-window mixing; empty = the backbone's tap
    # layers [d/3, d/2, 2d/3, d], so every tapped feature map is
    # produced by a layer that just mixed globally. 0 = off (reference
    # parity — full attention everywhere).
    window_size: int = 0
    global_attn_layers: tuple[int, ...] = ()
    # Encoder-forward lane-padding probe (PERF_STAGES.md round 5): pad
    # the token axis ONCE at the embedding (197 -> e.g. 256, the next
    # 128-lane multiple) instead of letting every per-layer matmul pay
    # the 197->256 relayout. Padded tokens are excluded from every
    # softmax row via key mask (exact for real tokens: masked keys
    # contribute exp(-inf) = 0) and sliced back off at the taps. 0 = off.
    # Only takes effect on the base-res XLA attention path (windowed /
    # flash / pipeline / SP paths have their own token layouts).
    pad_tokens_to: int = 0
    # Encoder-forward probe #2 (PERF_STAGES.md round 5): store attention
    # scores/probabilities in bfloat16 (half the score-tensor bytes and
    # VPU element throughput) while keeping the softmax DENOMINATOR in
    # fp32 (row max needs only ordering, bf16-safe). ~1e-2 relative prob
    # error — measured effect recorded before any default change.
    # "float32" = exact reference semantics (default).
    score_dtype: str = "float32"

    def is_global_layer(self, layer_idx_1based: int) -> bool:
        if self.window_size <= 0:
            return True
        globals_ = self.global_attn_layers or (
            self.num_hidden_layers // 3,
            self.num_hidden_layers // 2,
            2 * self.num_hidden_layers // 3,
            self.num_hidden_layers,
        )
        return layer_idx_1based in globals_

    def is_moe_layer(self, layer_idx_1based: int) -> bool:
        return (
            self.num_experts > 0
            and layer_idx_1based % max(1, self.moe_every_n) == 0
        )

    @property
    def grid_size(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid_size * self.grid_size

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_attention_heads

    @property
    def lora_scaling(self) -> float:
        return self.lora_alpha / self.lora_rank if self.lora_rank > 0 else 1.0


# Presets mirroring the HF checkpoints the reference can load.
DIT_BASE = ViTConfig()
DIT_LARGE = ViTConfig(
    hidden_size=1024, num_hidden_layers=24, num_attention_heads=16,
    intermediate_size=4096,
)


def _rel_pos_num_entries(cfg: ViTConfig) -> int:
    g = cfg.grid_size
    # (2g-1)^2 pairwise offsets + 3 special entries (cls<->token, cls<->cls)
    return (2 * g - 1) ** 2 + 3


def relative_position_index(grid: int) -> np.ndarray:
    """BEiT relative_position_index for a (grid, grid) window + CLS.

    Mirrors transformers BeitRelativePositionBias.generate_relative_position_index.
    Returns [1+g^2, 1+g^2] int32 indices into the bias table.
    """
    num_rel = (2 * grid - 1) ** 2 + 3
    coords = np.stack(np.meshgrid(np.arange(grid), np.arange(grid), indexing="ij"))
    coords = coords.reshape(2, -1)  # [2, g^2]
    rel = coords[:, :, None] - coords[:, None, :]  # [2, g^2, g^2]
    rel = rel.transpose(1, 2, 0).astype(np.int64)
    rel[:, :, 0] += grid - 1
    rel[:, :, 1] += grid - 1
    rel[:, :, 0] *= 2 * grid - 1
    n = grid * grid
    index = np.zeros((n + 1, n + 1), dtype=np.int64)
    index[1:, 1:] = rel.sum(-1)
    index[0, 0:] = num_rel - 3
    index[0:, 0] = num_rel - 2
    index[0, 0] = num_rel - 1
    return index.astype(np.int32)


def window_relative_position_index(ws: int, grid: int) -> np.ndarray:
    """Indices into a full-grid BEiT bias table for one (ws, ws) window.

    Relative offsets inside a window are a subset of the full grid's
    (|dy|, |dx| <= ws-1 <= grid-1), so windowed layers reuse the SAME
    (2*grid-1)^2(+3) table the global layers gather from — pretrained
    rel-pos checkpoints need no extra parameters to run windowed. No CLS
    rows: windowed attention handles CLS out-of-band (it is not part of
    any window). Returns [ws^2, ws^2] int32.
    """
    if ws > grid:
        raise ValueError(f"window {ws} larger than grid {grid}")
    coords = np.stack(np.meshgrid(np.arange(ws), np.arange(ws), indexing="ij"))
    coords = coords.reshape(2, -1)
    rel = (coords[:, :, None] - coords[:, None, :]).astype(np.int64)
    # same row-major encoding as relative_position_index, with the FULL
    # grid's stride (2*grid-1) so offsets land on the same table entries
    return (
        (rel[0] + grid - 1) * (2 * grid - 1) + (rel[1] + grid - 1)
    ).astype(np.int32)


def _window_partition(
    tokens: jnp.ndarray, gh: int, gw: int, ws: int
) -> tuple[jnp.ndarray, tuple[int, int, int, int]]:
    """[B, gh*gw, D] -> [B*nh*nw, ws*ws, D] (grid zero-padded up to a
    multiple of ws; the softmax masks padded keys, merge drops padded
    queries)."""
    b, _, d = tokens.shape
    ph, pw = (-gh) % ws, (-gw) % ws
    hp, wp = gh + ph, gw + pw
    nh, nw = hp // ws, wp // ws
    x = tokens.reshape(b, gh, gw, d)
    if ph or pw:
        x = jnp.pad(x, ((0, 0), (0, ph), (0, pw), (0, 0)))
    x = x.reshape(b, nh, ws, nw, ws, d)
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(b * nh * nw, ws * ws, d), (hp, wp, nh, nw)


def _window_merge(
    xw: jnp.ndarray, b: int, gh: int, gw: int, ws: int,
    dims: tuple[int, int, int, int],
) -> jnp.ndarray:
    """Inverse of _window_partition; crops the padding back off."""
    hp, wp, nh, nw = dims
    d = xw.shape[-1]
    x = xw.reshape(b, nh, nw, ws, ws, d).transpose(0, 1, 3, 2, 4, 5)
    x = x.reshape(b, hp, wp, d)[:, :gh, :gw]
    return x.reshape(b, gh * gw, d)


def _window_key_mask(gh: int, gw: int, ws: int) -> np.ndarray | None:
    """[nh*nw, ws*ws] bool: True where the window slot holds a real
    (non-padding) token. None when ws divides the grid (nothing to mask).
    Pure numpy — the pattern is static per (grid, ws), computed at trace
    time."""
    ph, pw = (-gh) % ws, (-gw) % ws
    if not (ph or pw):
        return None
    valid = np.zeros((gh + ph, gw + pw), dtype=bool)
    valid[:gh, :gw] = True
    nh, nw = (gh + ph) // ws, (gw + pw) // ws
    return (
        valid.reshape(nh, ws, nw, ws).transpose(0, 2, 1, 3).reshape(nh * nw, ws * ws)
    )


def _windowed_attention(
    x: jnp.ndarray,
    layer: dict,
    cfg: ViTConfig,
    gh: int,
    gw: int,
    rel_grid: int | None,
    shared_table: jnp.ndarray | None,
) -> jnp.ndarray:
    """Attention restricted to ws x ws patch windows (ViTDet-style).

    x is the post-LN [B, 1+gh*gw, D] stream. The CLS token is not a
    member of any window: it attends to itself alone (a 1-token
    sequence), and patch tokens do not see it in windowed layers — the
    fine-tune adapts, exactly the ViTDet finding that a few global
    layers suffice to restore full-attention quality. Padded window
    slots are masked out of the softmax; the QKV/attn_out projections
    commute with the partition (pointwise over tokens), so per-window
    outputs merged back are exactly full attention restricted to each
    window's token set.
    """
    b = x.shape[0]
    ws = cfg.window_size
    cls_tok, toks = x[:, :1], x[:, 1:]
    xw, dims = _window_partition(toks, gh, gw, ws)

    bias = None
    if rel_grid is not None:
        # windowed layers gather the SAME (resampled) tables the global
        # layers use, at within-window offsets (no CLS entries)
        idx = jnp.asarray(window_relative_position_index(ws, rel_grid))
        table = None
        if shared_table is not None:
            table = shared_table
        if "rel_pos_table" in layer:
            own = _rel_table_for_grid(
                layer["rel_pos_table"], cfg.grid_size, rel_grid
            )
            table = own if table is None else own + table
        if table is not None:
            bias = table[idx].transpose(2, 0, 1)[None]  # [1, h, ws^2, ws^2]

    key_mask = _window_key_mask(gh, gw, ws)
    if key_mask is not None:
        nwins = key_mask.shape[0]
        key_mask = jnp.tile(jnp.asarray(key_mask), (b, 1))
        assert key_mask.shape[0] == xw.shape[0], (nwins, xw.shape)

    # Windows are short sequences (ws^2 tokens, e.g. 256) — the measured
    # crossover (ATTENTION_BENCH.md) says XLA batched attention wins
    # there, so windowed layers always take the xla path regardless of
    # the configured impl (flash/ring only pay off at long N).
    ctx = _attention(xw, layer, cfg, bias, impl="xla", key_mask=key_mask)
    merged = _window_merge(ctx, b, gh, gw, ws, dims)
    cls_out = _attention(cls_tok, layer, cfg, None, impl="xla")
    return jnp.concatenate([cls_out, merged], axis=1)


def init_vit_params(key: jax.Array, cfg: ViTConfig) -> dict:
    """Random init matching HF BeitModel (trunc-normal 0.02, zeros bias)."""
    d, i = cfg.hidden_size, cfg.intermediate_size
    patch_in = cfg.num_channels * cfg.patch_size * cfg.patch_size
    keys = iter(jax.random.split(key, 4 + 8 * cfg.num_hidden_layers))

    def tn(k, shape):
        return (
            jax.random.truncated_normal(k, -2.0, 2.0, shape, jnp.float32)
            * cfg.initializer_range
        )

    params: dict = {
        "cls_token": jnp.zeros((d,), jnp.float32),
        "patch_embed": {
            "kernel": tn(next(keys), (patch_in, d)),
            "bias": jnp.zeros((d,), jnp.float32),
        },
    }
    if cfg.use_absolute_position_embeddings:
        params["pos_embed"] = jnp.zeros((cfg.num_patches + 1, d), jnp.float32)
    if cfg.use_shared_relative_position_bias:
        params["shared_rel_pos_table"] = jnp.zeros(
            (_rel_pos_num_entries(cfg), cfg.num_attention_heads), jnp.float32
        )

    layers = []
    for li in range(1, cfg.num_hidden_layers + 1):
        layer = {
            "ln1": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "ln2": {"scale": jnp.ones((d,)), "bias": jnp.zeros((d,))},
            "q": {"kernel": tn(next(keys), (d, d)), "bias": jnp.zeros((d,))},
            "k": {"kernel": tn(next(keys), (d, d))},  # no bias in BEiT
            "v": {"kernel": tn(next(keys), (d, d)), "bias": jnp.zeros((d,))},
            "attn_out": {"kernel": tn(next(keys), (d, d)), "bias": jnp.zeros((d,))},
        }
        if cfg.is_moe_layer(li):
            from layoutdit_tpu.ops.moe import init_moe_mlp_params

            layer.update(
                init_moe_mlp_params(
                    next(keys), d, i, cfg.num_experts, cfg.initializer_range
                )
            )
        else:
            layer["mlp_in"] = {
                "kernel": tn(next(keys), (d, i)), "bias": jnp.zeros((i,))
            }
            layer["mlp_out"] = {
                "kernel": tn(next(keys), (i, d)), "bias": jnp.zeros((d,))
            }
        if cfg.layer_scale_init_value > 0:
            layer["lambda_1"] = jnp.full((d,), cfg.layer_scale_init_value)
            layer["lambda_2"] = jnp.full((d,), cfg.layer_scale_init_value)
        if cfg.use_relative_position_bias:
            layer["rel_pos_table"] = jnp.zeros(
                (_rel_pos_num_entries(cfg), cfg.num_attention_heads), jnp.float32
            )
        layers.append(layer)
    params["layers"] = layers
    if cfg.lora_rank > 0:
        # fold_in rather than consuming from `keys`: the base-weight RNG
        # stream stays bit-identical to the rank=0 init, so seed-pinned
        # tests (convergence floors, goldens) are unaffected by adapters.
        from layoutdit_tpu.models.lora import add_lora_params

        params = add_lora_params(params, cfg, jax.random.fold_in(key, 0x10FA))
    return params


def _layer_norm(x: jnp.ndarray, p: dict, eps: float) -> jnp.ndarray:
    x32 = x.astype(jnp.float32)
    mean = x32.mean(-1, keepdims=True)
    var = jnp.mean(jnp.square(x32 - mean), -1, keepdims=True)
    y = (x32 - mean) * jax.lax.rsqrt(var + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _linear(x: jnp.ndarray, p: dict, lora_scale: float = 1.0) -> jnp.ndarray:
    if "kernel_q" in p:
        # int8 serving path (ops/quant.py): s8xs8->s32 on the MXU at 2x
        # the bf16 rate, dequantized by row x column scales. Adapters are
        # merged into the kernel before quantization (quantize_vit_params),
        # so no lora branch here.
        from layoutdit_tpu.ops.quant import int8_linear

        return int8_linear(x, p)
    y = jnp.dot(x, p["kernel"].astype(x.dtype), preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    y = y.astype(x.dtype)
    if "lora_a" in p:
        from layoutdit_tpu.models.lora import lora_delta

        y = y + lora_delta(x, p, lora_scale)
    return y


def patchify(pixels: jnp.ndarray, patch: int) -> jnp.ndarray:
    """[B, C, H, W] -> [B, (H/p)*(W/p), C*p*p] with (c, kh, kw) flattening
    to match torch Conv2d weight.reshape(out, -1) layout."""
    b, c, h, w = pixels.shape
    gh, gw = h // patch, w // patch
    x = pixels.reshape(b, c, gh, patch, gw, patch)
    x = x.transpose(0, 2, 4, 1, 3, 5)  # [B, gh, gw, C, p, p]
    return x.reshape(b, gh * gw, c * patch * patch)


def _attention(
    x: jnp.ndarray,
    layer: dict,
    cfg: ViTConfig,
    rel_bias: jnp.ndarray | None,
    impl: str = "xla",
    seq_sharding=None,
    key_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    b, n, d = x.shape
    h, hd = cfg.num_attention_heads, cfg.head_dim
    # Fused QKV: one [D, 3D] GEMM instead of three [D, D] — one pass over
    # the activations and a 3x-larger MXU launch. Params stay separate
    # q/k/v entries (HF BeitModel state_dict layout, weights_io.py); the
    # trace-time concat is constant-folded per step and costs nothing
    # next to the GEMM. BEiT quirk preserved: K has no bias.
    qkv_bias = jnp.concatenate(
        [
            layer["q"]["bias"],
            jnp.zeros_like(layer["q"]["bias"]),
            layer["v"]["bias"],
        ]
    )
    if "kernel_q" in layer["q"]:
        # int8 serving path: quantize the activations once for all three
        # projections (ops/quant.py W8A8 dynamic scheme).
        from layoutdit_tpu.ops.quant import (
            int8_matmul_quantized_rhs,
            quantize_activations,
        )

        qkv_kernel_q = jnp.concatenate(
            [layer["q"]["kernel_q"], layer["k"]["kernel_q"], layer["v"]["kernel_q"]],
            axis=1,
        )
        qkv_scale = jnp.concatenate(
            [
                layer["q"]["kernel_scale"],
                layer["k"]["kernel_scale"],
                layer["v"]["kernel_scale"],
            ]
        )
        xq, xs = quantize_activations(x)
        qkv = (
            int8_matmul_quantized_rhs(xq, xs, qkv_kernel_q, qkv_scale) + qkv_bias
        ).astype(x.dtype)
    else:
        qkv_kernel = jnp.concatenate(
            [layer["q"]["kernel"], layer["k"]["kernel"], layer["v"]["kernel"]],
            axis=1,
        ).astype(x.dtype)
        qkv = (
            jnp.dot(x, qkv_kernel, preferred_element_type=jnp.float32) + qkv_bias
        ).astype(x.dtype)
    if any("lora_a" in layer[nm] for nm in ("q", "k", "v")):
        # LoRA deltas ride beside the fused GEMM: same pre-LN input, two
        # skinny rank-r GEMMs per adapted projection (models/lora.py).
        from layoutdit_tpu.models.lora import lora_delta

        scale = cfg.lora_scaling
        qkv = qkv + jnp.concatenate(
            [
                lora_delta(x, layer[nm], scale)
                if "lora_a" in layer[nm]
                else jnp.zeros_like(qkv[..., :d])
                for nm in ("q", "k", "v")
            ],
            axis=-1,
        )
    q = qkv[..., :d].reshape(b, n, h, hd)
    k = qkv[..., d:2 * d].reshape(b, n, h, hd)
    v = qkv[..., 2 * d:].reshape(b, n, h, hd)

    if impl == "auto":
        # measured v5e crossover (ATTENTION_BENCH.md): XLA's batched
        # matmuls win at base-res token counts — including vs the fused
        # single-block short kernel, whose 128-lane padding (197->256,
        # 1.69x scores FLOPs) and backward P-recompute cost more than
        # the avoided HBM score round trip saves — and the blockwise
        # flash kernel wins from ~2k tokens (high-res document pages).
        from layoutdit_tpu.ops.flash_attention import AUTO_FLASH_MIN_SEQ

        impl = "pallas" if n >= AUTO_FLASH_MIN_SEQ else "xla"
        if impl == "pallas" and jax.default_backend() != "tpu":
            # Mosaic kernels only compile for TPU; on the CPU backend
            # (tests, local dev) "auto" must stay on the XLA path —
            # explicit impl="pallas"/"short" still works via interpret
            # mode.
            impl = "xla"

    if key_mask is not None and impl != "xla":
        raise ValueError("key_mask is only supported on the xla path")
    if impl == "ring":
        # sequence-sharded exact attention: K/V rotate over the mesh's
        # token axis, everything stays N/P-resident (ops/ring_attention)
        if rel_bias is not None:
            raise ValueError(
                "ring attention supports absolute-pos models only "
                "(dit); rel-pos-bias checkpoints use the xla/flash paths"
            )
        if seq_sharding is None:
            raise ValueError(
                "attention_impl='ring' needs vit_forward(seq_sharding=...)"
            )
        from layoutdit_tpu.ops.ring_attention import ring_attention_sharded

        ctx = ring_attention_sharded(
            q, k, v, seq_sharding, scale=1.0 / np.sqrt(hd)
        )
    elif impl == "short":
        # base-resolution fused kernel: softmax(QK^T)V in one VMEM pass,
        # O(N^2) tensors never reach HBM (ops/short_attention.py)
        if rel_bias is not None:
            raise ValueError(
                "attention_impl='short' is bias-free by design; rel-pos-"
                "bias checkpoints use the xla/flash paths"
            )
        from layoutdit_tpu.ops import short_attention as _sa

        ctx = _sa.short_attention(q, k, v, scale=1.0 / np.sqrt(hd))
    elif impl == "pallas":
        from layoutdit_tpu.ops.flash_attention import flash_attention

        ctx = flash_attention(q, k, v, bias=rel_bias, scale=1.0 / np.sqrt(hd))
    elif cfg.score_dtype == "bfloat16":
        # probe path: bf16 score/prob storage, fp32 row statistics —
        # halves the [B, h, N, N] tensor bytes and the VPU exp/divide
        # element traffic; the denominator stays fp32 so small probs
        # don't vanish in the normalization. Opt-in; measured vs exact
        # in PERF_STAGES.md.
        # python-float divisor: weak-typed, keeps the bf16 storage dtype
        scores = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.bfloat16
        ) / float(np.sqrt(hd))
        if rel_bias is not None:
            scores = scores + rel_bias.astype(jnp.bfloat16)
        if key_mask is not None:
            scores = jnp.where(
                key_mask[:, None, None, :], scores, -jnp.inf
            )
        m = jax.lax.stop_gradient(scores.max(axis=-1, keepdims=True))
        e = jnp.exp(scores - m)  # bf16
        denom = jnp.sum(e, axis=-1, keepdims=True, dtype=jnp.float32)
        probs = (e.astype(jnp.float32) / denom).astype(x.dtype)
        ctx = jnp.einsum(
            "bhnm,bmhd->bnhd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    else:
        scores = jnp.einsum(
            "bnhd,bmhd->bhnm", q, k, preferred_element_type=jnp.float32
        ) / np.sqrt(hd)
        if rel_bias is not None:
            scores = scores + rel_bias
        if key_mask is not None:
            # padded window slots (windowed attention over a grid the
            # window size does not divide): excluded from every softmax
            # row. -inf is safe — each window keeps >= 1 real key (the
            # padding band is < ws wide), and XLA fuses the where into
            # the softmax, so no [.., n, m] mask tensor is materialized.
            scores = jnp.where(
                key_mask[:, None, None, :], scores, -jnp.inf
            )
        probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(x.dtype)
        ctx = jnp.einsum(
            "bhnm,bmhd->bnhd", probs, v, preferred_element_type=jnp.float32
        ).astype(x.dtype)
    return _linear(ctx.reshape(b, n, d), layer["attn_out"], cfg.lora_scaling)


def _pos_embed_for_grid(pos_embed: jnp.ndarray, gh: int, gw: int) -> jnp.ndarray:
    """Absolute position embeddings for a (gh, gw) patch grid.

    When the input grid differs from the trained one (high-res document
    pages), the patch embeddings are bicubically resampled exactly like HF
    BeitEmbeddings.interpolate_pos_encoding (modeling_beit.py, torch
    bicubic align_corners=False); the CLS entry passes through unchanged.
    """
    from layoutdit_tpu.ops.interpolate import resize_bicubic

    n_pos = pos_embed.shape[0] - 1
    if n_pos == gh * gw:
        return pos_embed
    g0 = int(np.sqrt(n_pos))
    d = pos_embed.shape[1]
    cls_pos = pos_embed[:1]
    patch = pos_embed[1:].reshape(g0, g0, d).transpose(2, 0, 1)
    patch = resize_bicubic(patch, gh, gw)
    patch = patch.transpose(1, 2, 0).reshape(gh * gw, d)
    return jnp.concatenate([cls_pos, patch], axis=0)


def _gather_rel_bias(table: jnp.ndarray, index: jnp.ndarray) -> jnp.ndarray:
    """bias [1, heads, N, N] from table [entries, heads] and index [N, N]."""
    bias = table[index]  # [N, N, heads]
    return bias.transpose(2, 0, 1)[None]


def _rel_table_for_grid(table: jnp.ndarray, g0: int, g: int) -> jnp.ndarray:
    """Resample a BEiT relative-position-bias table trained at grid g0 for
    a (g, g) input grid — HF BeitRelativePositionBias.forward semantics
    (modeling_beit.py interpolate_pos_encoding path, behind the reference's
    dit_backbone.py:26-31): the (2g0-1)^2 offset entries are bilinearly
    resized on their (2g0-1, 2g0-1) grid (torch F.interpolate bilinear,
    align_corners=False); the 3 special CLS entries pass through."""
    if g == g0:
        return table
    from layoutdit_tpu.ops.interpolate import resize_bilinear

    heads = table.shape[1]
    old = 2 * g0 - 1
    new = 2 * g - 1
    patch = table[:-3].reshape(old, old, heads).transpose(2, 0, 1)
    patch = resize_bilinear(patch, new, new)
    patch = patch.transpose(1, 2, 0).reshape(new * new, heads)
    return jnp.concatenate([patch, table[-3:]], axis=0)


def _layer_rel_bias(layer: dict, cfg: ViTConfig, rel_grid, shared_bias):
    """Per-layer attention bias: the layer's own relative-position table
    (resampled to the current grid) added onto the shared one, if any."""
    bias = shared_bias
    if "rel_pos_table" in layer:
        idx = jnp.asarray(relative_position_index(rel_grid))
        own = _gather_rel_bias(
            _rel_table_for_grid(layer["rel_pos_table"], cfg.grid_size, rel_grid),
            idx,
        )
        bias = own if bias is None else own + bias
    return bias


def encoder_block_aux(
    x: jnp.ndarray,
    layer: dict,
    cfg: ViTConfig,
    bias,
    attention_impl: str,
    seq_sharding=None,
    window: tuple | None = None,
    key_mask: jnp.ndarray | None = None,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """One pre-LN transformer block (attention + MLP, optional BEiT
    layerscale). The MLP is the dense GELU pair or, when the layer params
    carry a router (ops/moe.py), a token-routed mixture of experts.

    window: (gh, gw, rel_grid, shared_table) — restrict this layer's
    attention to cfg.window_size patch windows (None = full attention).

    key_mask: [B, N] bool — keys excluded from every softmax row (the
    embedding-time token-padding probe, ViTConfig.pad_tokens_to).

    Returns (block output, fp32 aux scalar — the MoE load-balance loss,
    0 for dense layers)."""
    x_ln = _layer_norm(x, layer["ln1"], cfg.layer_norm_eps)
    if window is not None:
        gh, gw, rel_grid, shared_table = window
        attn = _windowed_attention(x_ln, layer, cfg, gh, gw, rel_grid, shared_table)
    else:
        attn = _attention(x_ln, layer, cfg, bias, attention_impl, seq_sharding,
                          key_mask=key_mask)
    if "lambda_1" in layer:
        attn = attn * layer["lambda_1"].astype(attn.dtype)
    x = x + attn
    y = _layer_norm(x, layer["ln2"], cfg.layer_norm_eps)
    aux = jnp.zeros((), jnp.float32)
    if "router" in layer:
        from layoutdit_tpu.ops.moe import moe_mlp

        y, aux = moe_mlp(
            y, layer, cfg.num_experts, cfg.moe_top_k, cfg.moe_capacity_factor
        )
    else:
        y = _linear(y, layer["mlp_in"], cfg.lora_scaling)
        y = jax.nn.gelu(y.astype(jnp.float32), approximate=False).astype(y.dtype)
        y = _linear(y, layer["mlp_out"], cfg.lora_scaling)
    if "lambda_2" in layer:
        y = y * layer["lambda_2"].astype(y.dtype)
    return x + y, aux


def encoder_block(
    x: jnp.ndarray,
    layer: dict,
    cfg: ViTConfig,
    bias,
    attention_impl: str,
) -> jnp.ndarray:
    """Dense-layer block (the pipeline schedule's per-stage body,
    parallel/pipeline.py — MoE layers are guarded out of the pipeline
    path in vit_forward, so the dropped aux is always 0 here)."""
    x, _ = encoder_block_aux(x, layer, cfg, bias, attention_impl)
    return x


def vit_forward(
    params: dict,
    pixels: jnp.ndarray,
    cfg: ViTConfig,
    taps: Sequence[int] = (),
    compute_dtype: jnp.dtype = jnp.float32,
    attention_impl: str = "xla",
    remat: bool = False,
    remat_policy: str = "full",
    seq_sharding=None,
    pipeline=None,
    aux_out: dict | None = None,
) -> list[jnp.ndarray]:
    """Run the encoder; return hidden states at ``taps`` (HF indexing:
    0 = embedding output, i = output of layer i). Empty taps -> [final].

    aux_out: optional dict the caller owns; MoE encoders write the summed
    load-balance loss into ``aux_out["moe_aux"]`` (fp32 scalar tracer,
    valid in the caller's trace). Dense encoders write 0.

    pixels: [B, C, H, W] float (already normalized). H, W must be multiples
    of patch_size. For grids other than the trained one, absolute position
    embeddings are bicubically resampled and relative-position-bias tables
    bilinearly resampled (both HF interpolate_pos_encoding parity) —
    high-res document pages work for every BEiT-family checkpoint.

    seq_sharding: optional ``NamedSharding`` for the [B, N, D] residual
    stream (sequence parallelism: tokens sharded over the mesh's model
    axis, e.g. ``NamedSharding(mesh, P(None, "model", None))``). The
    constraint is applied to every block boundary; XLA's partitioner
    derives the Megatron-SP collective schedule from it together with the
    TP parameter shardings (all-gather tokens into the column-parallel
    matmuls, reduce-scatter back to token shards after the row-parallel
    ones). Numerics are unchanged — this only pins activation layouts.
    Attention under SP: the XLA path by default (the partitioner
    all-gathers K/V around it; a pallas_call would forfeit the sharding),
    or ``attention_impl="ring"`` to keep K/V sequence-sharded end to end
    (ops/ring_attention.py — ppermute rotation, O(N/P) per device).

    pipeline: optional ``parallel.pipeline.PipelineConfig`` — run the
    layer stack as a GPipe pipeline over the mesh's ``pipe`` axis instead
    of the sequential loop (numerics-identical; mutually exclusive with
    seq_sharding; forces the XLA attention path inside the shard_map).
    """
    if pipeline is not None and seq_sharding is not None:
        raise ValueError("pipeline and seq_sharding are mutually exclusive")
    _, _, _img_h, _img_w = pixels.shape
    win_active = cfg.window_size > 0 and cfg.window_size < max(
        _img_h // cfg.patch_size, _img_w // cfg.patch_size
    )
    if win_active and pipeline is not None:
        raise ValueError(
            "windowed attention layers are heterogeneous (windowed vs "
            "global) — incompatible with the GPipe stage body's stacked "
            "homogeneous layers; use window_size=0 with pipeline"
        )
    if win_active and seq_sharding is not None:
        raise ValueError(
            "windowed attention repartitions the token axis per layer — "
            "incompatible with sequence parallelism (token-sharded "
            "stream); shard the batch/window axis instead (DP) or use "
            "window_size=0 with SP/ring"
        )
    if pipeline is not None and cfg.num_experts > 0:
        raise ValueError(
            "pipeline parallelism does not support MoE layers (the GPipe "
            "stage body stacks homogeneous dense layers); shard experts "
            "over the 'model' axis instead (expert parallelism)"
        )
    if pipeline is not None:
        attention_impl = "xla"
    elif seq_sharding is not None and attention_impl != "ring":
        # GSPMD derives the Megatron-SP schedule around XLA attention;
        # "ring" instead keeps K/V sequence-sharded (ops/ring_attention)
        attention_impl = "xla"
    elif seq_sharding is None and attention_impl == "ring":
        # ring is only meaningful WITH a token-sharded stream. Callers
        # that run the same config without SP — the evaluator's predict,
        # the serving engine, the predict CLI — must not crash on a
        # training-oriented config: degrade to the measured auto choice.
        attention_impl = "auto"
    taps = tuple(taps) or (cfg.num_hidden_layers,)
    _, _, img_h, img_w = pixels.shape
    gh, gw = img_h // cfg.patch_size, img_w // cfg.patch_size
    x = patchify(pixels, cfg.patch_size).astype(compute_dtype)
    x = _linear(x, params["patch_embed"])
    b = x.shape[0]
    cls = jnp.broadcast_to(
        params["cls_token"].astype(compute_dtype), (b, 1, cfg.hidden_size)
    )
    x = jnp.concatenate([cls, x], axis=1)
    if "pos_embed" in params:
        x = x + _pos_embed_for_grid(params["pos_embed"], gh, gw).astype(
            compute_dtype
        )

    n = x.shape[1]
    rel_grid = None
    if "shared_rel_pos_table" in params or any(
        "rel_pos_table" in l for l in params["layers"]
    ):
        if gh != gw:
            raise ValueError(
                "relative position bias requires a square patch grid "
                f"(got {gh}x{gw}); absolute-pos models handle any grid"
            )
        rel_grid = gh
    shared_bias = None
    shared_table = None
    if "shared_rel_pos_table" in params:
        table = _rel_table_for_grid(
            params["shared_rel_pos_table"], cfg.grid_size, rel_grid
        )
        idx = jnp.asarray(relative_position_index(rel_grid))
        shared_bias = _gather_rel_bias(table, idx)
        if win_active:
            # windowed layers gather within-window offsets straight from
            # the resampled table (the full-grid [1,h,N,N] bias above is
            # only ever built for the global layers)
            shared_table = table

    def seq_constrain(t):
        if seq_sharding is None:
            return t
        return jax.lax.with_sharding_constraint(t, seq_sharding)

    x = seq_constrain(x)

    # Embedding-time lane padding (ViTConfig.pad_tokens_to): pay the
    # 197->256 token-axis padding ONCE here instead of per-layer matmul
    # relayouts. Exact for real tokens — padded keys are masked to
    # exp(-inf) = 0 in every softmax row and sliced off at the taps.
    n_real = x.shape[1]
    key_mask = None
    if (
        cfg.pad_tokens_to > n_real
        and not win_active
        and pipeline is None
        and seq_sharding is None
        # MoE routers would let padded tokens compete for expert
        # capacity slots (not exact) — keep the probe dense-only
        and cfg.num_experts == 0
    ):
        pad = cfg.pad_tokens_to - n_real
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
        key_mask = jnp.broadcast_to(
            jnp.arange(cfg.pad_tokens_to) < n_real, (b, cfg.pad_tokens_to)
        )

    # collect by layer index, then emit in tap order (taps may repeat for
    # very shallow test configs)
    collected: dict[int, jnp.ndarray] = {}
    if 0 in taps:
        collected[0] = x

    def run_layer(x, layer, windowed=False):
        if windowed:
            y, aux = encoder_block_aux(
                x, layer, cfg, None, attention_impl, seq_sharding,
                window=(gh, gw, rel_grid, shared_table),
            )
        else:
            bias = _layer_rel_bias(layer, cfg, rel_grid, shared_bias)
            if bias is not None and key_mask is not None:
                # zero bias on padded entries; the key mask handles
                # exclusion, so the values are irrelevant
                pad = key_mask.shape[1] - bias.shape[-1]
                bias = jnp.pad(
                    bias, ((0, 0),) * (bias.ndim - 2) + ((0, pad), (0, pad))
                )
            y, aux = encoder_block_aux(
                x, layer, cfg, bias, attention_impl, seq_sharding,
                key_mask=key_mask,
            )
        return seq_constrain(y), aux

    if pipeline is not None:
        from layoutdit_tpu.parallel.pipeline import (
            pipeline_encoder,
            stack_layer_params,
        )

        # Stacking per call is a device-local relayout under jit; a
        # production pipeline run can pre-stack once with
        # stack_layer_params + shard_stacked_layers and keep that as the
        # param layout (grads flow back to per-layer leaves either way).
        hs = pipeline_encoder(
            stack_layer_params(params["layers"]), x, cfg,
            dataclasses.replace(pipeline, remat=pipeline.remat or remat),
            rel_grid=rel_grid, shared_bias=shared_bias,
        )
        for li in taps:
            if li > 0:
                collected[li] = hs[li - 1]
        if aux_out is not None:
            aux_out["moe_aux"] = jnp.zeros((), jnp.float32)
        return [collected[t] for t in taps]

    if remat:
        # remat_policy picks WHAT the backward recomputes per layer:
        #   "full" — save only block boundaries; recompute everything,
        #     including the GEMMs (the classic 4/3x-FLOPs remat; maximum
        #     memory saving — the high-res OOM lever);
        #   "dots" — jax.checkpoint_policies.dots_with_no_batch_dims_saveable:
        #     projection GEMM outputs (qkv / attn_out / mlp) are SAVED,
        #     only the VPU work (LN, softmax, gelu) and the batched
        #     attention einsums recompute. Near-zero extra MXU FLOPs for
        #     most of the memory win — measured on-chip in PERF_STAGES.md.
        if remat_policy == "dots":
            run_layer = jax.checkpoint(
                run_layer,
                policy=jax.checkpoint_policies.dots_with_no_batch_dims_saveable,
                static_argnums=(2,),
            )
        elif remat_policy == "full":
            run_layer = jax.checkpoint(run_layer, static_argnums=(2,))
        else:
            raise ValueError(
                f"unknown remat_policy {remat_policy!r}; use 'full' or 'dots'"
            )

    total_aux = jnp.zeros((), jnp.float32)
    for li, layer in enumerate(params["layers"], start=1):
        x, aux = run_layer(x, layer, win_active and not cfg.is_global_layer(li))
        total_aux = total_aux + aux
        if li in taps:
            collected[li] = x
    if aux_out is not None:
        aux_out["moe_aux"] = total_aux
    # slice the lane padding back off (no-op when key_mask is None)
    return [collected[t][:, :n_real] for t in taps]
