"""DETR set-prediction head — NMS-free detection, the TPU-native endgame.

The reference is an anchored two-stage detector (torchvision FasterRCNN,
/root/reference/src/layoutdit/modeling/model.py:45-55) whose dynamic
proposal machinery this framework re-expresses as padded budgets. DETR
(facebookresearch/detr, "End-to-End Object Detection with Transformers")
is the detector family with NO dynamic machinery to begin with: a fixed
set of learned queries cross-attends to the image and emits exactly
num_queries (class, box) pairs — no anchors, no proposal filtering, no
RoI pooling, no NMS. Every tensor is statically shaped by construction,
which is why this is the natural TPU formulation of detection.

Semantics follow the original DETR recipe:

  * memory: one backbone pyramid level (default stride 16) 1x1-projected
    to d_model, + 2D sine positional embeddings (normalize=True,
    temperature 10000) added to attention KEYS each layer
  * decoder: 6 post-norm layers — query self-attention (query pos added
    to q,k), cross-attention into the memory, FFN; a final LayerNorm is
    applied to every layer's output (return_intermediate semantics)
  * heads (shared across layers): Linear -> NC+1 class logits (channel 0
    is this framework's background == DETR's "no object", kept at index
    0 rather than DETR's last index — same math, framework-consistent
    labels 1..NC) and a 3-layer ReLU MLP -> sigmoid (cx, cy, w, h) in
    [0, 1] normalized page coordinates
  * matching: per image, per decoder layer, an EXACT Hungarian
    assignment (ops/matching.py, on-device — no host round-trip) over
    cost = 1 * (-softmax prob of the gt class) + 5 * L1(cxcywh) +
    2 * (-GIoU)
  * losses: weighted CE over all queries (background weight
    eos_coef=0.1; torch F.cross_entropy weighted-mean semantics) + (5 *
    L1 + 2 * (1-GIoU) on matched pairs) / batch-total gt count; repeated
    per decoder layer (aux_loss)
  * inference: softmax -> per-query best foreground class; all
    num_queries detections returned score-sorted, NO NMS

Weight init: matrices xavier_uniform (DETR resets every dim>1 transformer
parameter to xavier), query embeddings normal(0,1), biases zero (DETR
keeps torch's MHA zero in-proj biases; Linear micro-biases differ —
immaterial for from-scratch training and documented here).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from layoutdit_tpu.models.detection.roi_heads import Detections
from layoutdit_tpu.ops.boxes import clip_boxes_to_image, generalized_box_iou
from layoutdit_tpu.ops.matching import linear_sum_assignment

CLASS_WEIGHT = 1.0
BBOX_WEIGHT = 5.0
GIOU_WEIGHT = 2.0


# ----------------------------------------------------------------- params


def _xavier(key, shape):
    fan_in, fan_out = shape[0], shape[-1]
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, jnp.float32, -bound, bound)


def _linear(key, d_in, d_out):
    return {
        "kernel": _xavier(key, (d_in, d_out)),
        "bias": jnp.zeros((d_out,), jnp.float32),
    }


def _mha(key, d):
    k1, k2 = jax.random.split(key)
    return {
        # packed qkv like torch MHA in_proj: [d, 3d]
        "in_proj": _linear(k1, d, 3 * d),
        "out_proj": _linear(k2, d, d),
    }


def _ln(d):
    return {"scale": jnp.ones((d,), jnp.float32),
            "bias": jnp.zeros((d,), jnp.float32)}


def init_detr_params(
    key: jax.Array,
    in_channels: int,
    num_classes_bg: int,
    d_model: int = 256,
    num_heads: int = 8,
    num_layers: int = 6,
    ffn_dim: int = 2048,
    num_queries: int = 100,
) -> dict:
    keys = jax.random.split(key, num_layers + 5)
    layers = {}
    for i in range(num_layers):
        ks = jax.random.split(keys[i], 4)
        layers[f"layer{i}"] = {
            "self_attn": _mha(ks[0], d_model),
            "cross_attn": _mha(ks[1], d_model),
            "ln1": _ln(d_model), "ln2": _ln(d_model), "ln3": _ln(d_model),
            "ffn1": _linear(ks[2], d_model, ffn_dim),
            "ffn2": _linear(ks[3], ffn_dim, d_model),
        }
    kp, kq, kc, kb = keys[num_layers : num_layers + 4]
    kb1, kb2, kb3 = jax.random.split(kb, 3)
    return {
        # 1x1 input projection (DETR input_proj)
        "proj": {
            "kernel": _xavier(kp, (in_channels, d_model)),
            "bias": jnp.zeros((d_model,), jnp.float32),
        },
        "query_embed": jax.random.normal(kq, (num_queries, d_model)),
        "decoder": layers,
        "decoder_norm": _ln(d_model),
        "class_head": _linear(kc, d_model, num_classes_bg),
        "bbox_mlp": {
            "fc1": _linear(kb1, d_model, d_model),
            "fc2": _linear(kb2, d_model, d_model),
            "fc3": _linear(kb3, d_model, 4),
        },
    }


# ---------------------------------------------------------------- forward


def _apply_linear(p, x):
    y = jnp.dot(x, p["kernel"].astype(x.dtype),
                preferred_element_type=jnp.float32)
    return (y + p["bias"]).astype(x.dtype)


def _layer_norm(p, x):
    x32 = x.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = x32.var(-1, keepdims=True)
    out = (x32 - mu) * jax.lax.rsqrt(var + 1e-5) * p["scale"] + p["bias"]
    return out.astype(x.dtype)


def _attention(p, q_in, k_in, v_in, num_heads):
    """torch nn.MultiheadAttention semantics with a packed qkv projection;
    softmax statistics in fp32. Shapes [..., N, d]."""
    d = q_in.shape[-1]
    dh = d // num_heads
    w = p["in_proj"]["kernel"].astype(q_in.dtype)
    b = p["in_proj"]["bias"]
    q = jnp.dot(q_in, w[:, :d], preferred_element_type=jnp.float32) + b[:d]
    k = jnp.dot(k_in, w[:, d : 2 * d], preferred_element_type=jnp.float32) + b[d : 2 * d]
    v = jnp.dot(v_in, w[:, 2 * d :], preferred_element_type=jnp.float32) + b[2 * d :]

    def split(x):  # [..., N, d] -> [..., h, N, dh]
        return x.reshape(*x.shape[:-1], num_heads, dh).swapaxes(-3, -2)

    qh, kh, vh = split(q.astype(q_in.dtype)), split(k.astype(q_in.dtype)), split(
        v.astype(q_in.dtype)
    )
    scores = jnp.einsum(
        "...qd,...kd->...qk", qh, kh, preferred_element_type=jnp.float32
    ) / math.sqrt(dh)
    probs = jax.nn.softmax(scores.astype(jnp.float32), axis=-1).astype(q_in.dtype)
    out = jnp.einsum("...qk,...kd->...qd", probs, vh,
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    out = out.swapaxes(-3, -2).reshape(*q_in.shape[:-1], d)
    return _apply_linear(p["out_proj"], out)


def sine_position_embedding(h: int, w: int, d_model: int) -> jnp.ndarray:
    """DETR PositionEmbeddingSine (normalize=True, temperature 1e4,
    scale 2*pi) -> [h*w, d_model]; first half y-features, second half x."""
    half = d_model // 2
    eps = 1e-6
    scale = 2 * math.pi
    y = (jnp.arange(h, dtype=jnp.float32) + 1.0) / (h + eps) * scale  # [h]
    x = (jnp.arange(w, dtype=jnp.float32) + 1.0) / (w + eps) * scale
    dim_t = 10000.0 ** (2 * (jnp.arange(half) // 2) / half)  # [half]

    def enc(coord):  # [n] -> [n, half]: interleaved sin/cos
        v = coord[:, None] / dim_t[None, :]
        return jnp.stack(
            [jnp.sin(v[:, 0::2]), jnp.cos(v[:, 1::2])], axis=2
        ).reshape(coord.shape[0], half)

    pos_y = jnp.repeat(enc(y), w, axis=0)  # [h*w, half], y varies slowly
    pos_x = jnp.tile(enc(x), (h, 1))
    return jnp.concatenate([pos_y, pos_x], axis=-1)


def detr_forward(
    params: dict,
    feat: jnp.ndarray,  # [B, C, H, W] backbone level
    num_heads: int,
    return_intermediate: bool = True,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """-> (class_logits [L, B, Q, NC+1] fp32, boxes [L, B, Q, 4] fp32
    sigmoid cxcywh in [0,1]); L=1 (final layer only) unless
    return_intermediate."""
    b, c, h, w = feat.shape
    mem = _apply_linear(params["proj"], feat.reshape(b, c, h * w).swapaxes(1, 2))
    pos = sine_position_embedding(h, w, mem.shape[-1]).astype(mem.dtype)[None]
    qpos = params["query_embed"].astype(mem.dtype)[None]  # [1, Q, d]
    tgt = jnp.zeros((b,) + params["query_embed"].shape, mem.dtype)

    intermediates = []
    i = 0
    while f"layer{i}" in params["decoder"]:
        lp = params["decoder"][f"layer{i}"]
        q = tgt + qpos
        tgt = _layer_norm(
            lp["ln1"], tgt + _attention(lp["self_attn"], q, q, tgt, num_heads)
        )
        tgt = _layer_norm(
            lp["ln2"],
            tgt + _attention(
                lp["cross_attn"], tgt + qpos, mem + pos, mem, num_heads
            ),
        )
        ff = _apply_linear(lp["ffn2"], jax.nn.relu(_apply_linear(lp["ffn1"], tgt)))
        tgt = _layer_norm(lp["ln3"], tgt + ff)
        intermediates.append(_layer_norm(params["decoder_norm"], tgt))
        i += 1

    hs = jnp.stack(intermediates if return_intermediate else intermediates[-1:])
    logits = _apply_linear(params["class_head"], hs).astype(jnp.float32)
    x = jax.nn.relu(_apply_linear(params["bbox_mlp"]["fc1"], hs))
    x = jax.nn.relu(_apply_linear(params["bbox_mlp"]["fc2"], x))
    boxes = jax.nn.sigmoid(
        _apply_linear(params["bbox_mlp"]["fc3"], x).astype(jnp.float32)
    )
    return logits, boxes


# ------------------------------------------------------------------- loss


def _cxcywh_to_xyxy(b):
    cx, cy, w, h = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )


def _xyxy_to_cxcywh(b):
    x1, y1, x2, y2 = b[..., 0], b[..., 1], b[..., 2], b[..., 3]
    return jnp.stack(
        [(x1 + x2) / 2, (y1 + y2) / 2, x2 - x1, y2 - y1], axis=-1
    )


def _match_single(logits, boxes01, gt01, gt_labels, gt_valid):
    """Hungarian match for one image -> query index per gt slot [G]."""
    prob = jax.nn.softmax(logits, axis=-1)  # [Q, K]
    cost_class = -prob[:, gt_labels]  # [Q, G]
    cost_bbox = jnp.abs(boxes01[:, None, :] - gt01[None, :, :]).sum(-1)
    cost_giou = -generalized_box_iou(
        _cxcywh_to_xyxy(boxes01)[:, None, :],
        jnp.broadcast_to(
            _cxcywh_to_xyxy(gt01)[None, :, :],
            (boxes01.shape[0],) + gt01.shape,
        ),
    )
    cost = (
        BBOX_WEIGHT * cost_bbox
        + CLASS_WEIGHT * cost_class
        + GIOU_WEIGHT * cost_giou
    )
    # padded gt slots: a CONSTANT row cannot change which queries the real
    # slots win (tests/test_matching.py) — they just absorb spare queries
    cost = jnp.where(gt_valid[None, :], cost, 0.0)
    return linear_sum_assignment(jax.lax.stop_gradient(cost).T)  # [G]


def detr_loss_one_level(
    logits: jnp.ndarray,  # [B, Q, K] fp32
    boxes01: jnp.ndarray,  # [B, Q, 4] cxcywh [0,1]
    gt01: jnp.ndarray,  # [B, G, 4] cxcywh [0,1]
    gt_labels: jnp.ndarray,  # [B, G]
    gt_valid: jnp.ndarray,  # [B, G]
    num_boxes: jnp.ndarray,  # scalar, batch-total valid gt (>=1)
    eos_coef: float,
    match: jnp.ndarray | None = None,  # [B, G] precomputed assignment
) -> dict[str, jnp.ndarray]:
    if match is None:
        match = jax.vmap(_match_single)(
            logits, boxes01, gt01, gt_labels, gt_valid
        )  # [B, G] query index per gt slot

    # classification: scatter gt labels onto matched queries, bg elsewhere
    b, q = logits.shape[:2]
    tgt_class = jnp.zeros((b, q), jnp.int32)
    tgt_class = jax.vmap(
        lambda t, m, l, v: t.at[m].max(jnp.where(v, l, 0))
    )(tgt_class, match, gt_labels, gt_valid)
    logp = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(logp, tgt_class[..., None], axis=-1)[..., 0]
    wts = jnp.where(tgt_class == 0, eos_coef, 1.0)
    loss_ce = (wts * ce).sum() / wts.sum()  # torch weighted-mean CE

    # box losses on matched (valid) pairs
    pred = jax.vmap(lambda bx, m: bx[m])(boxes01, match)  # [B, G, 4]
    l1 = jnp.abs(pred - gt01).sum(-1)
    giou = generalized_box_iou(_cxcywh_to_xyxy(pred), _cxcywh_to_xyxy(gt01))
    loss_bbox = jnp.where(gt_valid, l1, 0.0).sum() / num_boxes
    loss_giou = jnp.where(gt_valid, 1.0 - giou, 0.0).sum() / num_boxes
    return {
        "loss_ce": CLASS_WEIGHT * loss_ce,
        "loss_bbox": BBOX_WEIGHT * loss_bbox,
        "loss_giou": GIOU_WEIGHT * loss_giou,
    }


def detr_loss(
    logits: jnp.ndarray,  # [L, B, Q, K]
    boxes01: jnp.ndarray,  # [L, B, Q, 4]
    gt_boxes: jnp.ndarray,  # [B, G, 4] xyxy, image coords
    gt_labels: jnp.ndarray,
    gt_valid: jnp.ndarray,
    image_size: int,
    eos_coef: float,
    aux_loss: bool,
    shared_matching: bool = False,
) -> dict[str, jnp.ndarray]:
    """DETR SetCriterion over the final layer (+ each aux layer when
    aux_loss, keys suffixed _aux{i}); weights folded into the values so
    the trainer's sum-of-dict contract applies unchanged.

    shared_matching: solve the Hungarian assignment on the FINAL decoder
    layer only and reuse it for every aux layer — a matcher-latency
    mitigation (1/L the solve work; the JV solver is serial-depth-bound,
    PERF_STAGES.md "DETR matcher batching"). Departs from the DETR paper,
    which re-matches per layer; quality cost measured on the fixture
    (docs/convergence.md)."""
    gt01 = _xyxy_to_cxcywh(gt_boxes) / image_size
    # padded slots -> degenerate zeros; keep them harmless in the coder
    gt01 = jnp.where(gt_valid[..., None], gt01, 0.0)
    num_boxes = jnp.maximum(gt_valid.sum(), 1).astype(jnp.float32)

    # ONE vmapped Hungarian solve over every (decoder layer, image) pair.
    # The JV solver (ops/matching.py) is serial in its row/Dijkstra loops;
    # vmapping the level axis into the batch pays that serial depth once
    # instead of once per decoder layer (measured 3.3x on the isolated
    # matcher at L=6/B=8/Q=100/G=32 on-chip — PERF_STAGES.md "DETR
    # matcher batching").
    lv = logits if (aux_loss and not shared_matching) else logits[-1:]
    bv = boxes01 if (aux_loss and not shared_matching) else boxes01[-1:]
    match_all = jax.vmap(
        jax.vmap(_match_single), in_axes=(0, 0, None, None, None)
    )(lv, bv, gt01, gt_labels, gt_valid)  # [L or 1, B, G]

    losses = detr_loss_one_level(
        logits[-1], boxes01[-1], gt01, gt_labels, gt_valid, num_boxes,
        eos_coef, match=match_all[-1],
    )
    if aux_loss:
        for i in range(logits.shape[0] - 1):
            aux = detr_loss_one_level(
                logits[i], boxes01[i], gt01, gt_labels, gt_valid, num_boxes,
                eos_coef,
                match=match_all[-1] if shared_matching else match_all[i],
            )
            losses.update({f"{k}_aux{i}": v for k, v in aux.items()})
    return losses


# ---------------------------------------------------------------- predict


def detr_postprocess(
    logits: jnp.ndarray,  # [B, Q, K] final layer
    boxes01: jnp.ndarray,  # [B, Q, 4]
    image_size: int,
    score_thresh: float,
) -> Detections:
    """DETR PostProcess: per-query best foreground class; every query is
    a detection (no NMS), returned score-sorted."""
    prob = jax.nn.softmax(logits, axis=-1)
    fg = prob[..., 1:]
    scores = fg.max(-1)
    labels = fg.argmax(-1).astype(jnp.int32) + 1
    boxes = clip_boxes_to_image(
        _cxcywh_to_xyxy(boxes01) * image_size, image_size, image_size
    )
    order = jnp.argsort(-scores, axis=-1)
    scores = jnp.take_along_axis(scores, order, axis=-1)
    labels = jnp.take_along_axis(labels, order, axis=-1)
    boxes = jnp.take_along_axis(boxes, order[..., None], axis=-2)
    return Detections(
        boxes=boxes, scores=scores, labels=labels,
        valid=scores > score_thresh,
    )
