"""Serialized sampler artifacts via ``jax.export`` (StableHLO).

Production deployment capability beyond the reference (whose only shippable
artifact is a torch checkpoint that needs the full Python model code to
run).  Here a trained sampler — the entire reverse chain, weights baked in —
serializes to one versioned StableHLO program that any later process can
deserialize and call without the model class, the config, or even this
package's model code: the artifact carries its own compiled math.

Notes:
  * The PRNG enters as a plain ``uint32`` seed (folded into a key inside the
    traced function) so the artifact's calling convention is plain arrays.
  * ``platforms`` allows cross-lowering: a CPU host can emit a TPU artifact
    (e.g. ``platforms=("tpu",)``) for a serving fleet; by default the
    artifact targets the exporting process's backend.
  * jax guarantees serialized-artifact compatibility across jax releases
    (export calling-convention versioning), making this the stable serving
    hand-off format.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def sampler_fn(trainer) -> Callable:
    """The trainer's configured sampler as ``(past, seed:uint32) -> future``
    with the sampling weights (EMA when enabled) baked in as constants."""
    params = trainer._sample_params()

    def sample(past, seed):
        key = jax.random.PRNGKey(seed)
        return trainer._sample_impl(past, key, params=params)

    return sample


def export_sampler(
    trainer,
    path: str | os.PathLike,
    *,
    batch_size: int,
    platforms: Sequence[str] | None = None,
) -> dict:
    """Export the trainer's sampler to ``path`` (+ ``.json`` sidecar).

    Returns the sidecar metadata dict.  The artifact is shape-specialized to
    ``batch_size`` (serving buckets export one artifact per bucket — static
    shapes are the TPU deal).
    """
    from jax import export as jexport

    p, f, h, w = trainer._grid_shapes()
    c = trainer.mprops_count
    past_spec = jax.ShapeDtypeStruct((batch_size, p, h, w, c), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)

    fn = jax.jit(sampler_fn(trainer))
    exported = jexport.export(
        fn, platforms=tuple(platforms) if platforms else None
    )(past_spec, seed_spec)
    blob = exported.serialize()

    path = os.fspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(blob)

    meta = {
        "format": "jax.export/stablehlo",
        "arch": trainer.arch,
        "platforms": list(exported.platforms),
        "batch_size": batch_size,
        "past_shape": [batch_size, p, h, w, c],
        "future_shape": [batch_size, f, h, w, c],
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
        "bytes": len(blob),
    }
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh, indent=2)
    return meta


def load_sampler(path: str | os.PathLike) -> tuple[Callable, dict]:
    """Deserialize an exported sampler: ``(callable(past, seed), metadata)``.

    The callable jit-compiles the embedded StableHLO on first use for the
    current backend (which must be one of the artifact's ``platforms``).
    """
    from jax import export as jexport

    path = os.fspath(path)
    with open(path, "rb") as fh:
        exported = jexport.deserialize(fh.read())
    meta = {}
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            meta = json.load(fh)

    call = jax.jit(exported.call)

    def sample(past, seed):
        past = jnp.asarray(past, jnp.float32)
        seed = jnp.asarray(seed, jnp.uint32)
        return call(past, seed)

    return sample, meta


def run(argv=None) -> int:
    """CLI: ``crowdmod export`` — checkpoint → serialized sampler artifact."""
    import argparse
    import logging

    from crowdmod_tpu.cli import common_parser, setup_logging
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.config.validate import require_valid
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.trainer import Trainer

    p = common_parser("Export a trained sampler as a StableHLO artifact.")
    p.add_argument("--model-to-load", type=str, default="000",
                   help="Checkpoint epoch tag; 000 = best-loss model.")
    p.add_argument("--batch", type=int, default=None,
                   help="Batch size to specialize to "
                        "(default DATASET.BATCH_SIZE).")
    p.add_argument("--platform", action="append", default=None,
                   help="Target platform(s), e.g. --platform tpu "
                        "(repeatable; default: current backend).")
    p.add_argument("--output", type=str, required=True,
                   help="Artifact path; a .json metadata sidecar is "
                        "written next to it.")
    args = p.parse_args(argv)

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    require_valid(cfg, args.arch)
    setup_logging(os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "export.log"))

    trainer = Trainer(cfg, args.arch, seed=args.seed)
    path = os.path.join(
        cfg.DATA_FS.SAVE_DIR,
        ckpt.checkpoint_name(cfg, args.arch, args.model_to_load),
    )
    trainer.load(path)
    logging.info("checkpoint restored from %s", path)

    meta = export_sampler(
        trainer, args.output,
        batch_size=args.batch or cfg.DATASET.BATCH_SIZE,
        platforms=args.platform,
    )
    logging.info("exported %s: %s", args.output, json.dumps(meta))
    print(args.output)
    return 0
