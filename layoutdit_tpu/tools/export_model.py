"""Export a trained detector to a self-contained serving artifact.

Usage::

    LAYOUTDIT_CONFIG=cfg.json python -m layoutdit_tpu.tools.export_model \
        --out /path/to/artifact --checkpoint ckpt.msgpack \
        --sizes 224,448,896 --batch-size 8 [--platforms cpu,tpu]

The artifact (StableHLO buckets + flat weights, see layoutdit_tpu/
export.py) runs with jax+numpy alone — no model code, no config. The
reference has no deployment path at all (inference = re-running the
training repo, reference main.py:12-43).
"""

from __future__ import annotations

import argparse
import os


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="artifact directory")
    ap.add_argument("--checkpoint", default=None,
                    help="msgpack checkpoint to load (default: warm-start "
                         "weights from the config, or random init)")
    ap.add_argument("--sizes", default="224",
                    help="comma-separated serving bucket resolutions")
    ap.add_argument("--batch-size", type=int, default=8)
    ap.add_argument("--platforms", default=None,
                    help="comma-separated lowering platforms, e.g. cpu,tpu "
                         "(default: current backend)")
    ap.add_argument("--int8", action="store_true",
                    help="bake W8A8-dynamic int8 encoder quantization into "
                         "the artifact (ops/quant.py; measured neutral for "
                         "dit-base on v5e — see PERF_STAGES.md)")
    args = ap.parse_args(argv)

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")

    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.export import export_detector
    from layoutdit_tpu.log import get_logger
    from layoutdit_tpu.models.model import build_model

    logger = get_logger(__name__)
    cfg = get_layout_dit_config()
    model = build_model(
        cfg, seed=cfg.train_config.seed, warm_start=not args.checkpoint
    )
    if args.checkpoint:
        model.restore_checkpoint(args.checkpoint)

    sizes = [int(s) for s in args.sizes.split(",")]
    platforms = args.platforms.split(",") if args.platforms else None
    params = model.params
    if args.int8:
        # quantize BEFORE tracing: the int8 weights + scales become the
        # artifact's flat leaves and the StableHLO program carries the
        # dynamic-activation-quant matmuls — the serving box never sees
        # a quantization pass
        from layoutdit_tpu.models.lora import merge_lora_detector
        from layoutdit_tpu.ops.quant import quantize_detector_params

        params = quantize_detector_params(
            merge_lora_detector(params, model.cfg.backbone.vit)
        )
    manifest = export_detector(
        params, model.cfg, args.out,
        image_sizes=sizes, batch_size=args.batch_size, platforms=platforms,
    )
    logger.info("exported %s -> %s", manifest, args.out)


if __name__ == "__main__":
    main()
