"""Sampling entry point (reference /root/reference/generate_samples.py:45-114).

Loads the test set (optionally the fixed-past comparison set), restores a
checkpoint by epoch tag, draws ``MODEL.NSAMPLES4PLOTS`` conditioned samples
with the family's configured sampler, and renders static SVG grids, animated
GIFs with on-device metric overlays, and density-over-time plots.
"""

from __future__ import annotations

import logging
import os

import numpy as np

from crowdmod_tpu.cli import common_parser, setup_logging


def build_parser():
    p = common_parser("Generate and plot samples from a trained model.")
    p.add_argument("--plot-mprop", type=str, default="Density&Vel",
                   help="Density|Uncertainty|Density&Vel")
    p.add_argument("--plot-past", type=str, default="Last2",
                   help="All|Last2|Alternate")
    p.add_argument("--plot-type", type=str, default="Static",
                   help="Static (.svg) or Dynamic (.gif)")
    p.add_argument("--vel-scale", type=float, default=0.5)
    p.add_argument("--vel-unc-scale", type=float, default=1.0)
    p.add_argument("--headwidth", type=int, default=5)
    p.add_argument("--same-past-seq", action="store_true",
                   help="Repeat one past sequence for every sample.")
    p.add_argument("--from-fixed-past", action="store_true",
                   help="Sample from the fixed 4sampling past set.")
    p.add_argument("--model-sample-to-load", type=str, default="000",
                   help="Checkpoint epoch tag; 000 = best-loss model.")
    p.add_argument("--output-dir", type=str, default=None)
    p.add_argument("--data-parallel", action="store_true",
                   help="Batch-parallel sampling over all visible devices.")
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.ingest import get_test_dataset
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.trainer import Trainer
    from crowdmod_tpu.viz.plot_samples import (
        MacropropPlotter,
        setup_predictions_plot,
    )

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    from crowdmod_tpu.config.validate import require_valid

    require_valid(cfg, args.arch)
    setup_logging(
        os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "genSamples.log")
    )

    mesh = None
    if args.data_parallel:
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
    logging.info("checkpoint restored from %s", path)

    test_ds = get_test_dataset(
        cfg, trainer.mprops_count, from_fixed_past=args.from_fixed_past,
        seed=args.seed,
    )
    key = jax.random.PRNGKey(args.seed)
    ksel, ksamp = jax.random.split(key)
    nsamples = cfg.MODEL.NSAMPLES4PLOTS
    # Select window ids first and gather ONLY those: real test splits have
    # stride-1 overlapping windows, so materializing every window on device
    # would be ~(PAST+FUTURE)× the raw tensor just to pick a handful.
    idx = Trainer.select_ids(
        len(test_ds), nsamples, ksel, same_past=args.same_past_seq
    )
    past, future = test_ds.gather(np.asarray(idx))
    logging.info("sampling %d sequences with %s", past.shape[0], args.arch)
    pred = trainer.sample(past, ksamp)
    # Reference ddpm.py:322-324 logs the L1 norm of the samples as a sanity
    # check; keep that observable.
    logging.info("sample L1 norm: %.4f", float(abs(pred).sum()))

    out_dir = args.output_dir or os.path.join(
        cfg.DATA_FS.OUTPUT_DIR, "samples", args.arch
    )
    plotter = MacropropPlotter(
        cfg, out_dir, arch=args.arch,
        vel_scale=args.vel_scale, vel_unc_scale=args.vel_unc_scale,
        headwidth=args.headwidth,
        run_tag=ckpt.run_tag(cfg, args.arch, tag),
    )
    artifacts = setup_predictions_plot(
        pred, past, future, plotter,
        plot_type=args.plot_type, plot_mprop=args.plot_mprop,
        plot_past=args.plot_past,
    )
    from crowdmod_tpu.utils.tracker import RunTracker

    with RunTracker(out_dir, config=cfg, use_wandb=None) as tracker:
        for k, v in artifacts.items():
            if k == "overlays":
                continue
            logging.info("wrote %s: %s", k, v)
            for path in (v if isinstance(v, list) else [v]):
                tracker.log_artifact(path, kind=k)
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
