"""Command-line entry points (reference repo-root scripts, SURVEY.md §2.8).

Each subcommand is runnable as ``python -m crowdmod_tpu.cli.<name>`` or via
the ``crowdmod`` console script:

  * ``etl``               — raw sensor CSVs → aggregated CSVs → macroprop
    pickles + DATA_LIST (the reference's offline aggregateData /
    computeMacroProps / count_samples stages in one chain)
  * ``train``             — train any of the five architectures
  * ``generate_samples``  — sample a trained model + render plots/GIFs
  * ``generate_metrics``  — repeated-past metric suite → CSV/manifest/boxplots
  * ``sweep``             — random-search hyperparameter sweeps
  * ``distill``           — progressive distillation to a few-step sampler
  * ``reflow``            — rectify an FM model for few-step Euler sampling
  * ``serve``             — HTTP inference server (batching, health, metrics)
  * ``import-checkpoint`` — migrate a reference torch checkpoint
  * ``export``            — serialize a sampler as a StableHLO artifact
  * ``doctor``            — deployment environment self-check
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def common_parser(description: str) -> argparse.ArgumentParser:
    """Flags shared by every entry point (reference train.py:74-80)."""
    p = argparse.ArgumentParser(description=description)
    p.add_argument(
        "--config-yml-file", type=str, default="configs/4test/ATC.yml",
        help="Configuration YML file for specific dataset.",
    )
    p.add_argument(
        "--configList-yml-file", type=str, default=None,
        help="Optional YML with the DATA_LIST of macroprop pickles.",
    )
    p.add_argument(
        "--arch", type=str, default="DDPM-UNet",
        help="DDPM-UNet|DDPM-DiT|FM-UNet|FM-DiT|ConvRNN",
    )
    p.add_argument("--seed", type=int, default=42)
    return p


def setup_logging(logfile: str | None = None):
    handlers = [logging.StreamHandler(sys.stdout)]
    if logfile:
        os.makedirs(os.path.dirname(logfile) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(logfile))
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s %(levelname)s %(message)s",
        handlers=handlers,
        force=True,
    )


def main(argv: list[str] | None = None) -> int:
    """Dispatch ``crowdmod <subcommand> ...``."""
    argv = list(sys.argv[1:] if argv is None else argv)
    commands = {
        "etl": "crowdmod_tpu.cli.etl",
        "train": "crowdmod_tpu.cli.train",
        "generate-samples": "crowdmod_tpu.cli.generate_samples",
        "generate-metrics": "crowdmod_tpu.cli.generate_metrics",
        "sweep": "crowdmod_tpu.cli.sweep",
        "distill": "crowdmod_tpu.cli.distill",
        "reflow": "crowdmod_tpu.cli.reflow",
        "serve": "crowdmod_tpu.cli.serve",
        "import-checkpoint": "crowdmod_tpu.cli.import_checkpoint",
        "export": "crowdmod_tpu.export_artifact",
        "compare": "crowdmod_tpu.viz.compare_models",
        "view": "crowdmod_tpu.viz.html_viewer",
        "params": "crowdmod_tpu.utils.model_info",
        "doctor": "crowdmod_tpu.cli.doctor",
    }
    if not argv or argv[0] in ("-h", "--help"):
        print("usage: crowdmod {" + ",".join(commands) + "} [args...]")
        return 0
    cmd = argv.pop(0)
    if cmd not in commands:
        print(f"unknown command {cmd!r}; expected one of {list(commands)}")
        return 2
    import importlib

    mod = importlib.import_module(commands[cmd])
    return mod.run(argv) or 0
