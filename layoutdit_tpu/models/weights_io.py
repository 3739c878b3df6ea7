"""Import pretrained DiT/BEiT weights (HF torch checkpoints) into pytrees.

The reference warm-starts its encoder from HF (``AutoModel.from_pretrained``
dit_backbone.py:26-31) or from a GCS ``state_dict`` checkpoint loaded with
``strict=False`` into only the DiT encoder (model.py:65-70). This module is
the TPU equivalent: a one-time offline conversion of a BEiT ``state_dict``
(torch .pth / .bin or safetensors) to the ``models.vit`` parameter pytree.

Conversion is name-based and pure numpy — torch is only needed to
deserialize ``.pth`` files.
"""

from __future__ import annotations

from typing import Mapping

import jax.numpy as jnp
import numpy as np

from layoutdit_tpu.log import get_logger
from layoutdit_tpu.models.vit import ViTConfig

logger = get_logger(__name__)

# HF BeitModel parameter name templates (prefix-stripped).
_EMB = "embeddings."
_LAYER = "encoder.layer.{i}."


def _np(t) -> np.ndarray:
    """torch tensor / numpy array -> float32 numpy."""
    if hasattr(t, "detach"):
        t = t.detach().cpu().numpy()
    return np.asarray(t, dtype=np.float32)


def beit_state_dict_to_params(
    state_dict: Mapping[str, "np.ndarray"], cfg: ViTConfig
) -> dict:
    """Convert an HF BeitModel state_dict to a vit.py parameter pytree.

    Accepts keys with or without a leading ``beit.`` / ``dit.`` / ``model.``
    prefix; ignores pooler / final-layernorm / mask_token / lm-head weights
    (they are not part of the backbone tap path).
    """
    sd: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        for pre in ("beit.", "dit.", "model.", "backbone.backbone.dit."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v

    def take(name: str) -> np.ndarray:
        return _np(sd[name])

    d = cfg.hidden_size
    patch_in = cfg.num_channels * cfg.patch_size * cfg.patch_size

    conv_w = take(_EMB + "patch_embeddings.projection.weight")  # [D, C, p, p]
    params: dict = {
        "cls_token": jnp.asarray(take(_EMB + "cls_token").reshape(d)),
        "patch_embed": {
            # conv [D, C, p, p] -> matmul kernel [(C*p*p), D]; patchify()
            # flattens patches in the same (c, kh, kw) order.
            "kernel": jnp.asarray(conv_w.reshape(d, patch_in).T),
            "bias": jnp.asarray(take(_EMB + "patch_embeddings.projection.bias")),
        },
    }
    if _EMB + "position_embeddings" in sd:
        params["pos_embed"] = jnp.asarray(
            take(_EMB + "position_embeddings").reshape(-1, d)
        )
    shared = "encoder.relative_position_bias.relative_position_bias_table"
    if shared in sd:
        params["shared_rel_pos_table"] = jnp.asarray(take(shared))

    layers = []
    for i in range(cfg.num_hidden_layers):
        p = _LAYER.format(i=i)
        layer = {
            "ln1": {
                "scale": jnp.asarray(take(p + "layernorm_before.weight")),
                "bias": jnp.asarray(take(p + "layernorm_before.bias")),
            },
            "ln2": {
                "scale": jnp.asarray(take(p + "layernorm_after.weight")),
                "bias": jnp.asarray(take(p + "layernorm_after.bias")),
            },
            # torch Linear weight is [out, in] -> transpose to [in, out]
            "q": {
                "kernel": jnp.asarray(take(p + "attention.attention.query.weight").T),
                "bias": jnp.asarray(take(p + "attention.attention.query.bias")),
            },
            "k": {"kernel": jnp.asarray(take(p + "attention.attention.key.weight").T)},
            "v": {
                "kernel": jnp.asarray(take(p + "attention.attention.value.weight").T),
                "bias": jnp.asarray(take(p + "attention.attention.value.bias")),
            },
            "attn_out": {
                "kernel": jnp.asarray(take(p + "attention.output.dense.weight").T),
                "bias": jnp.asarray(take(p + "attention.output.dense.bias")),
            },
            "mlp_in": {
                "kernel": jnp.asarray(take(p + "intermediate.dense.weight").T),
                "bias": jnp.asarray(take(p + "intermediate.dense.bias")),
            },
            "mlp_out": {
                "kernel": jnp.asarray(take(p + "output.dense.weight").T),
                "bias": jnp.asarray(take(p + "output.dense.bias")),
            },
        }
        if p + "lambda_1" in sd:
            layer["lambda_1"] = jnp.asarray(take(p + "lambda_1"))
            layer["lambda_2"] = jnp.asarray(take(p + "lambda_2"))
        rel = p + "attention.attention.relative_position_bias.relative_position_bias_table"
        if rel in sd:
            layer["rel_pos_table"] = jnp.asarray(take(rel))
        layers.append(layer)
    params["layers"] = layers
    return params


def load_beit_checkpoint(path: str, cfg: ViTConfig) -> dict:
    """Load a BEiT encoder checkpoint from (fsspec) ``path`` and convert it.

    Accepts torch ``.pth``/``.bin`` or safetensors state_dicts
    (reference-compatible with the GCS checkpoints of model.py:90-121) as
    well as natively converted ``.msgpack`` artifacts produced offline by
    ``tools/convert_hf_checkpoint.py`` (no torch needed at load time)."""
    import fsspec

    if path.endswith(".msgpack"):
        import jax

        from layoutdit_tpu.models.vit import init_vit_params
        from layoutdit_tpu.train.checkpoint import load_checkpoint

        template = init_vit_params(jax.random.PRNGKey(0), cfg)
        state = load_checkpoint(path, params_template=template)
        logger.info(
            "Loaded converted encoder checkpoint %s (%s)",
            path, state["extra"].get("preset", "?"),
        )
        return state["params"]

    with fsspec.open(path, "rb") as f:
        if path.endswith(".safetensors"):
            from safetensors.numpy import load as st_load

            sd = st_load(f.read())
        else:
            import torch

            sd = torch.load(f, map_location="cpu", weights_only=True)
    logger.info("Loaded BEiT state_dict with %d entries from %s", len(sd), path)
    return beit_state_dict_to_params(sd, cfg)


# --------------------------------------------------------- full detector

def _linear_np(sd: Mapping, name: str) -> dict:
    return {
        "kernel": jnp.asarray(_np(sd[name + ".weight"]).T),
        "bias": jnp.asarray(_np(sd[name + ".bias"])),
    }


def _conv_np(sd: Mapping, *names: str) -> dict:
    """First present key wins (torchvision renamed conv containers across
    versions: plain Conv2d vs Conv2dNormActivation's ``.0``). Our conv
    kernels use torch's [out, in, kh, kw] layout directly (fpn.py)."""
    for name in names:
        if name + ".weight" in sd:
            return {
                "kernel": jnp.asarray(_np(sd[name + ".weight"])),
                "bias": jnp.asarray(_np(sd[name + ".bias"])),
            }
    raise KeyError(f"none of {names} in state_dict")


def detector_state_dict_to_params(state_dict: Mapping, cfg) -> dict:
    """Convert a REFERENCE full-detector checkpoint (torch
    ``LayoutDetectionModel.state_dict()`` — torchvision FasterRCNN over
    the DiT+FPN backbone, model.py:90-121) into this framework's
    detector pytree: encoder + FPN + RPN head + box head + predictor.

    This is the migration path for users arriving with trained reference
    checkpoints: convert once offline
    (``tools/convert_reference_checkpoint.py``), then train/serve here.
    Name-based, pure numpy; shapes validated against the target config.
    """
    from layoutdit_tpu.models.detection.detector import init_detector_params

    if getattr(cfg, "cascade_iou_threshs", None):
        raise ValueError(
            "reference checkpoints are plain Faster R-CNN; target a "
            "non-cascade config (cascade heads have no source weights)"
        )

    sd: dict[str, np.ndarray] = {}
    for k, v in state_dict.items():
        for pre in ("module.", "model."):
            if k.startswith(pre):
                k = k[len(pre):]
        sd[k] = v

    # encoder (reference: backbone.backbone.dit.<HF BeitModel keys>)
    enc_sd = {
        k[len("backbone.backbone.dit."):]: v
        for k, v in sd.items()
        if k.startswith("backbone.backbone.dit.")
    }
    if not enc_sd:
        raise ValueError(
            "no DiT encoder weights under backbone.backbone.dit.* — "
            "not a reference detector checkpoint?"
        )
    params: dict = {
        "backbone": {
            "vit": beit_state_dict_to_params(enc_sd, cfg.backbone.vit),
            "fpn": {
                "inner": [
                    _conv_np(sd, f"backbone.fpn.inner_blocks.{i}.0",
                             f"backbone.fpn.inner_blocks.{i}")
                    for i in range(4)
                ],
                "layer": [
                    _conv_np(sd, f"backbone.fpn.layer_blocks.{i}.0",
                             f"backbone.fpn.layer_blocks.{i}")
                    for i in range(4)
                ],
            },
        },
        "rpn_head": {
            "conv": _conv_np(sd, "rpn.head.conv.0.0", "rpn.head.conv"),
            "cls": _conv_np(sd, "rpn.head.cls_logits"),
            "bbox": _conv_np(sd, "rpn.head.bbox_pred"),
        },
        "box_predictor": {
            "cls": _linear_np(sd, "roi_heads.box_predictor.cls_score"),
            "bbox": _linear_np(sd, "roi_heads.box_predictor.bbox_pred"),
        },
    }

    # TwoMLPHead: torch flattens pooled [K, C, Py, Px] in (c, py, px) row
    # order; our fc6 kernel is 4D [Px, Py, C, rep] consuming the RoIAlign
    # native [K, Px, Py, C] layout (heads.py init_box_head_params) — same
    # permutation applied here.
    w6 = _np(sd["roi_heads.box_head.fc6.weight"]).T  # [in, rep]
    c = cfg.backbone.fpn_out_channels
    p = cfg.roi_output_size
    rep = w6.shape[1]
    if w6.shape[0] != c * p * p:
        raise ValueError(
            f"fc6 expects {c}x{p}x{p} pooled features "
            f"(fpn_out_channels x roi_output_size^2) but the checkpoint "
            f"has in_features={w6.shape[0]} — config mismatch"
        )
    params["box_head"] = {
        "fc6": {
            "kernel": jnp.asarray(
                w6.reshape(c, p, p, rep).transpose(2, 1, 0, 3)
            ),
            "bias": jnp.asarray(_np(sd["roi_heads.box_head.fc6.bias"])),
        },
        "fc7": _linear_np(sd, "roi_heads.box_head.fc7"),
    }

    # shape validation against the target config's ABSTRACT template
    # (eval_shape: no multi-hundred-MB random init just to compare shapes)
    import jax

    template = jax.eval_shape(
        lambda k: init_detector_params(k, cfg), jax.random.PRNGKey(0)
    )
    flat_t = jax.tree_util.tree_flatten_with_path(template)[0]
    flat_p = dict(
        (tuple(str(x) for x in path), leaf)
        for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]
    )
    errors = []
    for path, leaf in flat_t:
        key = tuple(str(x) for x in path)
        got = flat_p.get(key)
        if got is None:
            errors.append(f"missing {key}")
        elif tuple(got.shape) != tuple(leaf.shape):
            errors.append(f"{key}: {tuple(got.shape)} != {tuple(leaf.shape)}")
    if len(flat_p) != len(flat_t):
        tkeys = {tuple(str(x) for x in path) for path, _ in flat_t}
        extra = sorted(set(flat_p) - tkeys)
        errors.extend(f"unexpected {k}" for k in extra[:8])
    if errors:
        raise ValueError(
            "converted checkpoint does not match the target config: "
            + "; ".join(errors[:12])
            + (f"; +{len(errors) - 12} more" if len(errors) > 12 else "")
            + f" (leaves: {len(flat_p)} vs {len(flat_t)})"
        )
    logger.info(
        "Converted reference detector checkpoint: %d leaves", len(flat_p)
    )
    return params
