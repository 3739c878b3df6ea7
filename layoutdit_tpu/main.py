"""CLI entry point — parity with /root/reference/src/layoutdit/main.py:12-43.

``layoutdit`` console script: build config -> model -> train -> score ->
visualize. Both flags are FUNCTIONAL here (the reference parses
``--local_mode``/``--read_config`` but never consumes them, main.py:14-25):
  * --local_mode: train on the sample split / local paths,
  * --read_config: opt IN to the remote gs:// config probe (default off in
    this zero-egress-friendly build; LAYOUTDIT_CONFIG env always wins),
  * --resume CKPT: true full-state resume (new capability).
"""

from __future__ import annotations

import argparse
import os

from layoutdit_tpu.log import get_logger

logger = get_logger(__name__)


def main() -> None:
    parser = argparse.ArgumentParser(description="LayoutDit training script")
    parser.add_argument(
        "--local_mode", action="store_true",
        help="Use local samples for training",
    )
    parser.add_argument(
        "--read_config", action="store_true",
        help="Read config from gs://layoutdit/layout_dit_config.json",
    )
    parser.add_argument(
        "--resume", default=None,
        help="Checkpoint path to resume from, or 'auto' to pick the "
             "newest checkpoint in the run directory (starts fresh when "
             "none exists — safe in preemption restart loops)"
    )
    parser.add_argument(
        "--skip-train", action="store_true", help="Evaluate only"
    )
    parser.add_argument(
        "--skip-eval", action="store_true", help="Train only"
    )
    args = parser.parse_args()

    if not args.read_config and "LAYOUTDIT_SKIP_REMOTE_CONFIG" not in os.environ:
        os.environ["LAYOUTDIT_SKIP_REMOTE_CONFIG"] = "1"

    # persistent XLA compilation cache: the full-size train step takes
    # minutes to compile; every CLI invocation after the first should pay
    # seconds, not minutes (override dir via LAYOUTDIT_JAX_CACHE, disable
    # with LAYOUTDIT_JAX_CACHE=0)
    cache_dir = os.environ.get(
        "LAYOUTDIT_JAX_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "layoutdit_jax"),
    )
    if cache_dir != "0":
        import jax

        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)

    from layoutdit_tpu.config import get_layout_dit_config
    from layoutdit_tpu.eval.evaluator import Evaluator
    from layoutdit_tpu.models.model import build_model
    from layoutdit_tpu.parallel.mesh import maybe_distributed_init
    from layoutdit_tpu.train.trainer import Trainer

    layout_dit_config = get_layout_dit_config()
    if args.local_mode:
        layout_dit_config.local_mode = True

    # multi-host bring-up must precede ANY backend-touching jax call
    # (model init below) — see parallel/mesh.py:maybe_distributed_init
    maybe_distributed_init(layout_dit_config.mesh_config)

    logger.info("Starting LayoutDit training (args=%s)", vars(args))

    model = build_model(layout_dit_config, seed=layout_dit_config.train_config.seed)
    logger.info("Initialized model (%.1fM params)", model.num_params() / 1e6)

    if not args.skip_train:
        trainer = Trainer(layout_dit_config, model)
        if args.resume:
            trainer.resume(args.resume)
        trainer.train()
        if trainer.ema_params is not None:
            # evaluate the EMA weights (TrainingConfig.ema_decay) — the
            # raw weights are still in the checkpoint's params slot
            logger.info("Evaluating with EMA parameters (decay=%s)",
                        layout_dit_config.train_config.ema_decay)
            model.params = trainer.ema_params

    if not args.skip_eval:
        evaluator = Evaluator(model=model, layout_dit_config=layout_dit_config)
        metrics = evaluator.score()
        if metrics is not None:
            logger.info("Final metrics: %s", metrics)
        evaluator.visualize_preds()
        evaluator.visualize_gt()


if __name__ == "__main__":
    main()
