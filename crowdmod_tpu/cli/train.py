"""Training entry point (reference /root/reference/train.py:23-82).

Dispatches any of the five architectures through the unified
:class:`~crowdmod_tpu.train.trainer.Trainer`; logs through
:class:`~crowdmod_tpu.utils.tracker.RunTracker` (local JSONL, optional W&B)
and writes a loss-curve PNG at the end (reference convRNN.py:62-96 behavior,
generalized to every family).
"""

from __future__ import annotations

import logging
import os

from crowdmod_tpu.cli import common_parser, setup_logging


def build_parser():
    p = common_parser("Train a crowd macroprop model on TPU.")
    p.add_argument(
        "--baseline-ckpt", type=str, default=None,
        help="Warm-start model weights from this checkpoint "
             "(optimizer state is NOT restored; reference ddpm.py:160-163).",
    )
    p.add_argument("--epochs", type=int, default=None,
                   help="Override the config's epoch budget.")
    p.add_argument("--resume", action="store_true",
                   help="Resume model state from the emergency 'abort' "
                        "checkpoint if one exists.")
    p.add_argument("--run-dir", type=str, default=None)
    p.add_argument(
        "--data-parallel", action="store_true",
        help="Shard the batch over all visible devices via a 1-D mesh.",
    )
    p.add_argument(
        "--fsdp", action="store_true",
        help="With --data-parallel: also shard parameters, optimizer state "
             "and EMA over the data axis (ZeRO-3) for models too large to "
             "replicate per chip.",
    )
    p.add_argument(
        "--model-parallel", type=int, default=None, metavar="N",
        help="With --data-parallel: tensor-parallel axis size (large "
             "kernels channel-sharded over N chips); overrides "
             "TPU.MESH.MODEL.",
    )
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.ingest import get_training_dataset
    from crowdmod_tpu.train.trainer import Trainer
    from crowdmod_tpu.utils.tracker import RunTracker
    from crowdmod_tpu.viz.plot_crowd import plot_losses

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    from crowdmod_tpu.config.validate import require_valid

    require_valid(cfg, args.arch)
    setup_logging(os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "train.log"))

    mesh = None
    if args.data_parallel:
        from crowdmod_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(cfg, args.model_parallel)
        logging.info("mesh: %s", dict(mesh.shape))
    elif args.fsdp or args.model_parallel:
        raise SystemExit(
            "--fsdp/--model-parallel require --data-parallel"
        )

    trainer = Trainer(cfg, args.arch, mesh=mesh, run_dir=args.run_dir,
                      param_sharding="fsdp" if args.fsdp else "tp",
                      seed=args.seed)
    if args.resume and trainer.resume_from_abort():
        logging.info("resumed from emergency checkpoint")
    mprops = trainer.mprops_count
    logging.info("loading training data (mprops_count=%d)", mprops)
    train_ds, val_ds = get_training_dataset(cfg, mprops, seed=args.seed)
    logging.info("train windows: %d, val windows: %d",
                 len(train_ds), len(val_ds) if val_ds else 0)

    with RunTracker(trainer.run_dir, config=cfg) as tracker:
        history = trainer.fit(
            train_ds, val_ds,
            baseline_ckpt=args.baseline_ckpt,
            epochs=args.epochs,
            tracker=tracker,
        )

    plot_losses(
        history["train_loss"], history["val_loss"],
        subtitle=f"{args.arch} on {cfg.DATASET.NAME}",
        save_path=os.path.join(trainer.run_dir, "losses.png"),
    )
    if history.get("aborted"):
        logging.error(
            "training ABORTED (NaN watchdog); checkpoints in %s are from "
            "before the divergence", cfg.DATA_FS.SAVE_DIR,
        )
        return 1
    logging.info("training done; best checkpoints in %s", cfg.DATA_FS.SAVE_DIR)
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
