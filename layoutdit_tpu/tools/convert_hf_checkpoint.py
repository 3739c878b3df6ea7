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
    ap.add_argument("src", help="HF state_dict (.bin/.pth/.safetensors)")
    ap.add_argument("--preset", choices=sorted(PRESETS), default="dit-base")
    ap.add_argument("--out", required=True, help="output .msgpack path")
    args = ap.parse_args()
    convert(args.src, args.preset, args.out)


if __name__ == "__main__":
    main()
