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
    p.add_argument(
        "--multihost", action="store_true",
        help="Join the multi-process runtime before touching devices "
             "(jax.distributed.initialize: TPU pods autodetect; CPU "
             "harnesses export CROWDMOD_COORDINATOR/NUM_PROCESSES/"
             "PROCESS_ID).  Every host runs this same command; "
             "checkpoints commit once via process 0.",
    )
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.ingest import get_training_dataset
    from crowdmod_tpu.train.trainer import Trainer
    from crowdmod_tpu.utils.tracker import RunTracker
    from crowdmod_tpu.viz.plot_crowd import plot_losses

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    from crowdmod_tpu.config.validate import require_valid

    require_valid(cfg, args.arch)

    is_main = True
    log_name = "train.log"
    if args.multihost:
        # Flag sanity BEFORE forming the runtime: initialize() blocks on
        # coordinator discovery, so a late check would hang a dev box (or
        # strand a whole pod past the train-exit barrier) before the
        # friendly error ever printed.
        if not args.data_parallel:
            raise SystemExit("--multihost requires --data-parallel")
        # Must run before any other jax device use so the global runtime
        # forms; every host loads the identical corpus (same files, same
        # seed) and device_put scatters only the local shards, so the data
        # path needs no per-host branching — DCN carries just the gradient
        # all-reduce.  Scale-out input (per-host file shards) is the
        # FileWindowStream + host_shard + global_batch path (docs/SCALING.md).
        import jax

        from crowdmod_tpu.parallel import multiprocess

        multiprocess.initialize()
        is_main = multiprocess.is_main()
        log_name = f"train.p{jax.process_index()}.log"
    setup_logging(os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", log_name))
    if args.multihost:
        import jax

        logging.info(
            "multihost: process %d/%d, %d local / %d global %s devices",
            jax.process_index(), jax.process_count(),
            len(jax.local_devices()), len(jax.devices()),
            jax.default_backend(),
        )

    mesh = None
    if args.data_parallel:
        from crowdmod_tpu.parallel.mesh import mesh_from_config

        mesh = mesh_from_config(cfg, args.model_parallel)
        logging.info("mesh: %s", dict(mesh.shape))
    elif args.fsdp or args.model_parallel:
        raise SystemExit(
            "--fsdp/--model-parallel require --data-parallel"
        )

    run_dir = args.run_dir
    if args.multihost and not is_main:
        # Single-writer rule: only process 0 owns the canonical run dir
        # (tracker JSONL, loss plot); secondaries log beside it.
        import jax

        base = run_dir or os.path.join(cfg.DATA_FS.OUTPUT_DIR, "runs",
                                       args.arch)
        run_dir = os.path.join(base, f".proc{jax.process_index()}")
    trainer = Trainer(cfg, args.arch, mesh=mesh, run_dir=run_dir,
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

    if is_main:
        plot_losses(
            history["train_loss"], history["val_loss"],
            subtitle=f"{args.arch} on {cfg.DATASET.NAME}",
            save_path=os.path.join(trainer.run_dir, "losses.png"),
        )
    if args.multihost:
        # Rejoin before exit: secondaries finish fit() first while process 0
        # still writes run artifacts — without this, the fast exiters trip
        # jax's shutdown barrier and the whole job reports failure.
        from crowdmod_tpu.parallel import multiprocess

        multiprocess.barrier("train-exit")
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
