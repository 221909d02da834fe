"""ReFlow entry point: rectify a trained flow-matching model for few-step
Euler sampling (beyond-reference capability; the FM twin of ``crowdmod
distill`` — see ``models/flow_matching/reflow.py``).

The rectified ``RF<n>`` checkpoint samples through the ordinary surfaces;
set a small step count to cash in the straightened trajectories, e.g.
``MODEL.FM.INTEGRATOR_STEPS.EULER: 4``.
"""

from __future__ import annotations

import logging
import os


def build_parser():
    from crowdmod_tpu.cli import common_parser

    p = common_parser("Rectify a trained FM model (ReFlow).")
    p.add_argument("--rounds", type=int, default=1,
                   help="Rectification rounds (1 is usually enough).")
    p.add_argument("--coupling-steps", type=int, default=100,
                   help="Teacher Euler steps when generating coupled pairs.")
    p.add_argument("--epochs-per-round", type=int, default=8)
    p.add_argument("--lr", type=float, default=1e-4)
    p.add_argument("--model-to-load", type=str, default="000",
                   help="Teacher checkpoint epoch tag; 000 = best-loss.")
    p.add_argument("--save-intermediate", action="store_true",
                   help="Also save each round's rectified checkpoint.")
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
    from crowdmod_tpu.train.distiller import reflow, reflow_tag
    from crowdmod_tpu.train.trainer import Trainer
    from crowdmod_tpu.utils.tracker import RunTracker

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    require_valid(cfg, args.arch)
    setup_logging(
        os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "reflow.log")
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
        history = reflow(
            trainer, train_ds,
            rounds=args.rounds,
            coupling_steps=args.coupling_steps,
            epochs_per_round=args.epochs_per_round,
            lr=args.lr,
            save_dir=cfg.DATA_FS.SAVE_DIR,
            save_intermediate=args.save_intermediate,
            tracker=tracker,
            seed=args.seed,
        )
    finally:
        tracker.finish()

    final = history["loss"][args.rounds][-1]
    logging.info(
        "reflow complete: %d round(s), final loss %.5f; sample checkpoint "
        "tag %s with a small MODEL.FM.INTEGRATOR_STEPS (e.g. EULER: 4)",
        args.rounds, final, reflow_tag(args.rounds),
    )
    return 0
