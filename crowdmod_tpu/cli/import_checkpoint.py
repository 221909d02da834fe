"""Import a reference torch checkpoint so our CLIs can serve it.

Bridges a reference training run into this framework: point it at the
``.pt`` file the reference's ``save_checkpoint`` wrote (reference
utils/utils.py:140-147) and it writes an orbax checkpoint under
``DATA_FS.SAVE_DIR`` with the exact name ``generate-samples`` /
``generate-metrics`` / ``serve`` resolve for ``--model-sample-to-load``.

The config/arch must be the ones the torch model was trained with — the
mapped tree is structurally verified against a freshly built model and any
mismatch is reported param-by-param before anything is written.

Note on numerics: imported DiT weights reproduce the torch forward bit-for-
bit only under ``CROWDMOD_GELU=exact`` (the parity-test mode); the TPU
default tanh GELU differs by ~1e-3 relative activation, which the e2e
quality runs showed is noise-level (PERF.md).
"""

from __future__ import annotations

import logging
import os

from crowdmod_tpu.cli import common_parser, setup_logging


def build_parser():
    p = common_parser("Import a reference torch checkpoint.")
    p.add_argument("--torch-ckpt", type=str, required=True,
                   help="Path to the reference .pt checkpoint file.")
    p.add_argument("--epoch-label", type=str, default="000",
                   help="Epoch tag for the imported checkpoint name "
                        "(000 = the best-loss slot).")
    p.add_argument("--out-dir", type=str, default=None,
                   help="Override DATA_FS.SAVE_DIR as the destination.")
    return p


def run(argv=None) -> int:
    args = build_parser().parse_args(argv)
    from crowdmod_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()
    import jax.numpy as jnp

    from crowdmod_tpu.compat import import_torch_checkpoint, verify_tree_matches
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.config.validate import require_valid
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.trainer import Trainer

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    require_valid(cfg, args.arch)
    setup_logging(
        os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "importCkpt.log")
    )

    mapped = import_torch_checkpoint(args.torch_ckpt, arch=args.arch)

    trainer = Trainer(cfg, args.arch, seed=args.seed)
    template = trainer.init_params()
    verify_tree_matches(mapped, template)
    # Adopt the template's leaf order/dtype so Trainer.load's unflatten
    # round-trips exactly.
    import jax

    state = jax.tree.map(
        lambda t, m: jnp.asarray(m, dtype=t.dtype), template, mapped
    )

    out_dir = args.out_dir or cfg.DATA_FS.SAVE_DIR
    name = ckpt.checkpoint_name(cfg, args.arch, args.epoch_label)
    path = os.path.join(out_dir, name)
    meta = ckpt.build_metadata(
        cfg, args.arch, args.epoch_label,
        extra={"source": f"torch-import:{os.path.abspath(args.torch_ckpt)}"},
    )
    ckpt.save_checkpoint(path, state, metadata=meta)
    logging.info("imported %s -> %s", args.torch_ckpt, path)
    print(path)
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
