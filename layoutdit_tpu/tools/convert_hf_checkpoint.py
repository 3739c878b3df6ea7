"""Offline conversion: HF DiT/BEiT torch checkpoint -> layoutdit_tpu pytree.

The reference downloads ``microsoft/dit-base`` at model-build time
(dit_backbone.py:26-31); in a zero-egress TPU environment the checkpoint is
converted ONCE offline and shipped as a native artifact:

  python -m layoutdit_tpu.tools.convert_hf_checkpoint \
      /path/to/pytorch_model.bin --preset dit-base --out dit-base.msgpack

The source state_dict is validated key-for-key (names AND shapes) against
the committed manifest (manifests/{preset}_hf_manifest.json, generated from
the HF BeitModel architecture) so a wrong / truncated / differently-shaped
checkpoint fails loudly instead of silently degrading fine-tune quality
(SURVEY.md §7 hard part #3). A sidecar ``.provenance.json`` records SHA256
of source and output.

The produced ``.msgpack`` loads through ``LayoutDetectionModel.
load_dit_encoder`` / ``previous_layout_dit_checkpoint`` exactly like a raw
state_dict file.
"""

from __future__ import annotations

import argparse
import hashlib
import json
import os

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)

# keys present in the HF checkpoint but not part of the backbone tap path
IGNORABLE = ("pooler.", "embeddings.mask_token", "layernorm.")

PRESETS = {"dit-base", "dit-large"}

# Local pretrained-bytes pointer: when set, the converter (and the trainer's
# warm start, main.py) use this checkpoint without any flag. This narrows
# the zero-egress gap to the download alone: drop the file anywhere, export
# the env var, everything downstream works (VERDICT r3 next-round #3).
CKPT_ENV = {
    "dit-base": "LAYOUTDIT_DIT_BASE_PTH",
    "dit-large": "LAYOUTDIT_DIT_LARGE_PTH",
}


def local_checkpoint(preset: str = "dit-base") -> str | None:
    """Path to a locally cached HF checkpoint for ``preset``, if the
    ``LAYOUTDIT_DIT_{BASE,LARGE}_PTH`` env var points at an existing file
    (legacy alias ``LAYOUTDIT_DIT_BASE_CKPT`` also honoured)."""
    names = [CKPT_ENV[preset]]
    if preset == "dit-base":
        names.append("LAYOUTDIT_DIT_BASE_CKPT")
    for name in names:
        path = os.environ.get(name)
        if path and os.path.exists(path):
            return path
    return None


def expected_manifest(preset: str) -> dict[str, list[int]]:
    """The HF ``BeitModel`` state_dict tree (names AND shapes) implied by
    the preset's architecture, derived from ``models.vit`` config alone.

    This is the independent structural oracle for the committed
    ``manifests/{preset}_hf_manifest.json`` files: the manifests were
    captured from real HF models, this function re-derives them from the
    documented BEiT parameterisation (per layer: biasless K, q/k/v,
    attention output, MLP in/out, two layernorms, layer-scale lambdas;
    embeddings: cls+mask tokens, patch projection, absolute positions for
    197 = 1 + (224/16)^2 tokens; plus the non-backbone pooler layernorm).
    """
    from layoutdit_tpu.models import vit as vit_mod

    cfg = vit_mod.DIT_LARGE if preset == "dit-large" else vit_mod.DIT_BASE
    d, m = cfg.hidden_size, cfg.intermediate_size
    p, c = cfg.patch_size, cfg.num_channels
    tokens = 1 + (cfg.image_size // p) ** 2
    keys: dict[str, list[int]] = {
        "embeddings.cls_token": [1, 1, d],
        "embeddings.mask_token": [1, 1, d],
        "embeddings.patch_embeddings.projection.weight": [d, c, p, p],
        "embeddings.patch_embeddings.projection.bias": [d],
        "embeddings.position_embeddings": [1, tokens, d],
        "pooler.layernorm.weight": [d],
        "pooler.layernorm.bias": [d],
    }
    for i in range(cfg.num_hidden_layers):
        pre = f"encoder.layer.{i}."
        keys[pre + "attention.attention.query.weight"] = [d, d]
        keys[pre + "attention.attention.query.bias"] = [d]
        keys[pre + "attention.attention.key.weight"] = [d, d]  # biasless K
        keys[pre + "attention.attention.value.weight"] = [d, d]
        keys[pre + "attention.attention.value.bias"] = [d]
        keys[pre + "attention.output.dense.weight"] = [d, d]
        keys[pre + "attention.output.dense.bias"] = [d]
        keys[pre + "intermediate.dense.weight"] = [m, d]
        keys[pre + "intermediate.dense.bias"] = [m]
        keys[pre + "output.dense.weight"] = [d, m]
        keys[pre + "output.dense.bias"] = [d]
        keys[pre + "layernorm_before.weight"] = [d]
        keys[pre + "layernorm_before.bias"] = [d]
        keys[pre + "layernorm_after.weight"] = [d]
        keys[pre + "layernorm_after.bias"] = [d]
        keys[pre + "lambda_1"] = [d]
        keys[pre + "lambda_2"] = [d]
    return keys


def _manifest_path(preset: str) -> str:
    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    return os.path.join(root, "manifests", f"{preset}_hf_manifest.json")


def _strip(k: str) -> str:
    for pre in ("beit.", "dit.", "model."):
        if k.startswith(pre):
            return k[len(pre):]
    return k


def validate_state_dict(sd: dict, preset: str) -> list[str]:
    """Check names+shapes against the committed manifest.

    Returns the list of ignored (non-backbone) keys; raises ValueError on
    any missing key or shape mismatch.
    """
    with open(_manifest_path(preset)) as f:
        manifest = json.load(f)["keys"]

    got = {_strip(k): tuple(v.shape) for k, v in sd.items()}
    problems, ignored = [], []
    for key, shape in manifest.items():
        if any(s in key for s in IGNORABLE):
            if key in got:
                ignored.append(key)
            continue
        if key not in got:
            problems.append(f"missing: {key}")
        elif got[key] != tuple(shape):
            problems.append(f"shape {key}: got {got[key]}, want {tuple(shape)}")
    for key in got:
        if key not in manifest:
            if any(s in key for s in IGNORABLE):
                ignored.append(key)
            else:
                problems.append(f"unexpected: {key}")
    if problems:
        raise ValueError(
            f"state_dict does not match the {preset} manifest "
            f"({len(problems)} problems):\n  " + "\n  ".join(problems[:20])
        )
    return ignored


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def convert(src: str, preset: str, out: str) -> dict:
    import torch

    from layoutdit_tpu.models import vit as vit_mod
    from layoutdit_tpu.models.weights_io import beit_state_dict_to_params
    from layoutdit_tpu.train.checkpoint import save_checkpoint

    if src.endswith(".safetensors"):
        from safetensors.torch import load_file

        sd = load_file(src)
    else:
        sd = torch.load(src, map_location="cpu", weights_only=True)
    ignored = validate_state_dict(sd, preset)
    logger.info(
        "Validated %d keys against %s manifest (%d non-backbone keys ignored)",
        len(sd), preset, len(ignored),
    )

    cfg = vit_mod.DIT_LARGE if preset == "dit-large" else vit_mod.DIT_BASE
    params = beit_state_dict_to_params(sd, cfg)
    save_checkpoint(out, params=params, extra={"preset": preset, "kind": "vit_encoder"})

    prov = {
        "preset": preset,
        "source": os.path.abspath(src),
        "source_sha256": _sha256(src),
        "output_sha256": _sha256(out),
        "n_source_keys": len(sd),
        "ignored_keys": sorted(ignored),
    }
    with open(out + ".provenance.json", "w") as f:
        json.dump(prov, f, indent=1)
    logger.info("Wrote %s (+.provenance.json)", out)
    return prov


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument(
        "src", nargs="?", default=None,
        help="HF state_dict (.bin/.pth/.safetensors); defaults to "
             "$LAYOUTDIT_DIT_{BASE,LARGE}_PTH for the chosen preset",
    )
    ap.add_argument("--preset", choices=sorted(PRESETS), default="dit-base")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args()
    src = args.src or local_checkpoint(args.preset)
    if not src:
        ap.error(
            f"no source checkpoint: pass a path or set {CKPT_ENV[args.preset]}"
        )
    convert(src, args.preset, args.out)


if __name__ == "__main__":
    main()
