"""Metrics entry point (reference /root/reference/generate_metrics.py:19-83).

Runs the repeated-past sampling protocol (``samples_per_batch = BATCH_SIZE ×
chunk``) and the full on-device metric suite, writing CSVs, the
``metrics_files.json`` manifest, and boxplot PNGs.
"""

from __future__ import annotations

import json
import logging
import os

from crowdmod_tpu.cli import common_parser, setup_logging


def build_parser():
    p = common_parser("Compute the evaluation-metric suite for a model.")
    p.add_argument(
        "--metric", type=str, default="ALL",
        help="PSNR|SSIM|MOTION_FEAT_BHATT|ENERGY|RE_DENSITY|ALL",
    )
    p.add_argument(
        "--chunk-repd-past-seq", type=int, default=None,
        help="Samples drawn per repeated past sequence "
             "(default cfg.METRICS.CHUNK_REPD_PAST_SEQ or 20).",
    )
    p.add_argument("--batches-to-use", type=int, default=1)
    p.add_argument("--model-sample-to-load", type=str, default="000")
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="Batch-parallel sampling over all visible devices "
                        "(the repeated-past protocol shards cleanly).")
    p.add_argument("--sample-weights", choices=("ema", "raw"), default="ema",
                   help="Sample with EMA weights (default) or the raw "
                        "training weights (EMA ablation / regression "
                        "demonstration).")
    p.add_argument("--multihost", action="store_true",
                   help="Join the multi-process runtime: every host runs "
                        "this same command, the protocol batch shards over "
                        "the global data axis, and process 0 commits the "
                        "CSV/manifest (secondaries write to a .procN "
                        "scratch dir for cross-host agreement checks).")
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.ingest import get_test_dataset
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.trainer import Trainer

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    from crowdmod_tpu.config.validate import require_valid

    require_valid(cfg, args.arch)
    log_name = "genMetrics.log"
    if args.multihost:
        # Same ordering rules as `crowdmod train --multihost`
        # (cli/train.py:76-96): flag sanity before the blocking
        # coordinator handshake, runtime up before any device use.
        if not args.data_parallel:
            raise SystemExit("--multihost requires --data-parallel")
        import jax

        from crowdmod_tpu.parallel import multiprocess

        multiprocess.initialize()
        log_name = f"genMetrics.p{jax.process_index()}.log"
    setup_logging(
        os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", log_name)
    )
    if args.multihost:
        import jax

        logging.info(
            "multihost: process %d/%d, %d local / %d global %s devices",
            jax.process_index(), jax.process_count(),
            len(jax.local_devices()), len(jax.devices()),
            jax.default_backend(),
        )

    chunk = args.chunk_repd_past_seq
    if chunk is None:
        chunk = cfg.METRICS.get("CHUNK_REPD_PAST_SEQ", 20)

    mesh = None
    if args.data_parallel:
        import jax

        from crowdmod_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=jax.device_count())
        logging.info("batch-parallel sampling over %d devices",
                     jax.device_count())
    trainer = Trainer(cfg, args.arch, mesh=mesh, seed=args.seed)
    tag = args.model_sample_to_load
    path = os.path.join(
        cfg.DATA_FS.SAVE_DIR, ckpt.checkpoint_name(cfg, args.arch, tag)
    )
    trainer.load(path)
    trainer.sample_weights = args.sample_weights
    logging.info("checkpoint restored from %s (sampling with %s weights)",
                 path, args.sample_weights)

    test_ds = get_test_dataset(cfg, trainer.mprops_count, seed=args.seed)
    out_dir = args.output_dir or os.path.join(
        cfg.DATA_FS.OUTPUT_DIR, "metrics", args.arch
    )
    if args.multihost:
        # Single-writer rule: process 0 commits the canonical CSV/manifest;
        # secondaries compute the identical suite into a scratch dir (their
        # artifacts double as a cross-host agreement check).
        import jax

        from crowdmod_tpu.parallel import multiprocess

        if not multiprocess.is_main():
            out_dir = os.path.join(out_dir, f".proc{jax.process_index()}")
    results = trainer.generate_metrics(
        test_ds,
        metric=args.metric,
        chunk=chunk,
        batches_to_use=args.batches_to_use,
        output_dir=out_dir,
        epoch_tag=tag,
        seed=args.seed,
    )
    summary = {
        k: float(v.mean()) for k, v in results.items()
        if hasattr(v, "mean")
    }
    logging.info("metric means: %s", json.dumps(summary, indent=2))
    logging.info("metric artifacts written to %s", out_dir)
    if args.multihost:
        # Rejoin before exit (cli/train.py:152 rationale): fast exiters
        # must not trip jax's shutdown barrier while process 0 writes.
        from crowdmod_tpu.parallel import multiprocess

        multiprocess.barrier("generate-metrics-exit")
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
