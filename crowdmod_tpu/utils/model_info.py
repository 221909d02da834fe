"""Model parameter accounting.

Rebuild of /root/reference/utils/metrics/model_details.py:3-9 and the CLI
/root/reference/utils/count/count_params.py:13-42: count trainable parameters
per top-level module and in total for any architecture/config pair.
"""

from __future__ import annotations

import jax
import numpy as np


def count_trainable_params(params) -> int:
    """Total parameter count of a flax params pytree."""
    return int(sum(np.prod(p.shape) for p in jax.tree.leaves(params)))


def param_breakdown(params) -> dict[str, int]:
    """→ {top-level module: parameter count}."""
    tree = params.get("params", params)
    return {
        name: count_trainable_params(sub)
        for name, sub in sorted(tree.items())
    }


def run(argv=None) -> int:
    from crowdmod_tpu.cli import common_parser
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.models.factory import ARCHS
    from crowdmod_tpu.train.trainer import Trainer

    p = common_parser("Count trainable parameters per architecture.")
    p.add_argument("--all-archs", action="store_true",
                   help="Report every architecture, not just --arch.")
    args = p.parse_args(argv)
    cfg = load_config(args.config_yml_file, args.configList_yml_file)

    archs = ARCHS if args.all_archs else (args.arch,)
    for arch in archs:
        trainer = Trainer(cfg, arch)
        params = trainer.init_params()
        total = count_trainable_params(params)
        print(f"{arch}: {total:,} trainable params")
        for name, n in param_breakdown(params).items():
            print(f"  {name}: {n:,}")
    return 0


if __name__ == "__main__":
    raise SystemExit(run())
