"""Progressive-distillation entry point (beyond-reference capability).

Restores a trained DDPM checkpoint, runs the halving phases of
``train/distiller.py`` on the training data, and saves a few-step student
checkpoint.  Sample the result with ``MODEL.DDPM.SAMPLER: Distilled`` (set
``DISTILL_STEPS`` to the student's step count) through the ordinary
``generate-samples`` / ``generate-metrics`` / ``serve`` surfaces, loading
the ``D<steps>`` checkpoint tag.
"""

from __future__ import annotations

import logging
import os


def build_parser():
    from crowdmod_tpu.cli import common_parser

    p = common_parser("Distill a trained DDPM into a few-step sampler.")
    p.add_argument("--steps", type=int, default=8,
                   help="Target sampler step count for the final student.")
    p.add_argument("--start-steps", type=int, default=64,
                   help="First student's step count; must be a power-of-two "
                        "multiple of --steps.")
    p.add_argument("--epochs-per-phase", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--model-to-load", type=str, default="000",
                   help="Teacher checkpoint epoch tag; 000 = best-loss.")
    p.add_argument("--save-intermediate", action="store_true",
                   help="Also save each phase's student checkpoint.")
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()

    from crowdmod_tpu.cli import setup_logging
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.config.validate import require_valid
    from crowdmod_tpu.data.ingest import get_training_dataset
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.distiller import distilled_tag, progressive_distill
    from crowdmod_tpu.train.trainer import Trainer
    from crowdmod_tpu.utils.tracker import RunTracker

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    require_valid(cfg, args.arch)
    setup_logging(
        os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "distill.log")
    )

    trainer = Trainer(cfg, args.arch, seed=args.seed)
    path = os.path.join(
        cfg.DATA_FS.SAVE_DIR,
        ckpt.checkpoint_name(cfg, args.arch, args.model_to_load),
    )
    trainer.load(path)
    logging.info("teacher checkpoint restored from %s", path)

    train_ds, _ = get_training_dataset(
        cfg, trainer.mprops_count, seed=args.seed
    )
    tracker = RunTracker(trainer.run_dir, config=cfg, use_wandb=False)
    try:
        history = progressive_distill(
            trainer, train_ds,
            target_steps=args.steps,
            start_steps=args.start_steps,
            epochs_per_phase=args.epochs_per_phase,
            lr=args.lr,
            save_dir=cfg.DATA_FS.SAVE_DIR,
            save_intermediate=args.save_intermediate,
            tracker=tracker,
            seed=args.seed,
        )
    finally:
        tracker.finish()

    final = history["loss"][args.steps][-1]
    logging.info(
        "distillation complete: %s -> %d steps (final loss %.5f); sample "
        "with MODEL.DDPM.SAMPLER=Distilled DISTILL_STEPS=%d, checkpoint "
        "tag %s",
        " -> ".join(str(n) for n in history["phases"]), args.steps, final,
        args.steps, distilled_tag(args.steps),
    )
    return 0
