"""Fold trained LoRA adapters into the base weights for serving/export.

Usage::

    LAYOUTDIT_CONFIG=cfg.json python -m layoutdit_tpu.tools.merge_lora \
        --checkpoint ckpt.msgpack --out merged.msgpack

Loads a fine-tuned checkpoint trained with ``lora_rank > 0``, folds every
adapter into its kernel (W += alpha/r * A@B — models/lora.py), and writes
a params-only checkpoint in the rank-0 layout: it loads under a config
with ``lora_rank: 0`` and serves with zero adapter overhead (and is the
required form for ``--int8`` quantized serving/export).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="fine-tuned msgpack/orbax checkpoint (lora_rank > 0)")
    ap.add_argument("--out", required=True,
                    help="output msgpack path for the merged params")
    args = ap.parse_args(argv)

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.log import get_logger
    from layoutdit_tpu.models.lora import has_lora, merge_lora_detector
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.train.checkpoint import save_checkpoint

    logger = get_logger(__name__)
    cfg = get_layout_dit_config()
    if cfg.detection_model_config.lora_rank <= 0:
        raise SystemExit(
            "config has lora_rank=0 — the checkpoint template would not "
            "carry adapters; point LAYOUTDIT_CONFIG at the training config"
        )
    model = build_model(cfg, warm_start=False)
    model.restore_checkpoint(args.checkpoint)
    if not has_lora(model.params["backbone"]["vit"]):
        raise SystemExit(f"{args.checkpoint} carries no LoRA adapters")
    merged = merge_lora_detector(model.params, model.cfg.backbone.vit)
    save_checkpoint(args.out, params=merged, epoch=0,
                    extra={"merged_lora": True})
    logger.info("merged LoRA checkpoint written to %s (load with "
                "lora_rank=0)", args.out)


if __name__ == "__main__":
    main()
