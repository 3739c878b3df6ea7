"""Offline conversion: reference full-detector torch checkpoint -> this
framework's .msgpack checkpoint.

The reference saves ``torch.save(LayoutDetectionModel.state_dict())`` to
GCS (model.py:90-121, ``epoch_N_{gpu,cpu}.pth``). This CLI converts one
of those — encoder + FPN + RPN head + box head + predictor, every
weight — so users migrate trained models, not just configs:

  python -m layoutdit_tpu.tools.convert_reference_checkpoint \
      --torch gs://layoutdit/run/model_checkpoints/epoch_20_cpu.pth \
      --out ./converted.msgpack [--config partial_cfg.json]

The result restores with ``LayoutDetectionModel.restore_checkpoint`` /
``--resume`` (params only; fresh optimizer state) and serves directly.
"""

from __future__ import annotations

import argparse
import os

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(
        description="Convert a reference torch detector checkpoint"
    )
    parser.add_argument("--torch", required=True, dest="torch_path",
                        help="reference .pth (local or fsspec URL)")
    parser.add_argument("--out", required=True,
                        help="output .msgpack checkpoint path")
    parser.add_argument("--config", default=None,
                        help="partial config JSON for the target model "
                             "(defaults to the library defaults)")
    args = parser.parse_args(argv)

    os.environ.setdefault("LAYOUTDIT_SKIP_REMOTE_CONFIG", "1")
    if args.config:
        os.environ["LAYOUTDIT_CONFIG"] = args.config

    import fsspec
    import torch

    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.models.detection.detector import DetectorConfig
    from layoutdit_tpu.models.weights_io import detector_state_dict_to_params
    from layoutdit_tpu.train.checkpoint import save_checkpoint

    with fsspec.open(args.torch_path, "rb") as f:
        # weights_only: a state_dict is plain tensors; never run pickle
        # reduce code from an external checkpoint
        state_dict = torch.load(f, map_location="cpu", weights_only=True)
    logger.info("Loaded %d torch tensors from %s",
                len(state_dict), args.torch_path)

    config = get_layout_dit_config()
    cfg = DetectorConfig.from_model_config(
        config.detection_model_config,
        precision_dtype=config.precision.compute_dtype,
    )
    params = detector_state_dict_to_params(state_dict, cfg)
    save_checkpoint(args.out, params=params, opt_state=None, epoch=0,
                    extra={"source": args.torch_path})
    logger.info("Wrote converted checkpoint to %s", args.out)


if __name__ == "__main__":
    main()
