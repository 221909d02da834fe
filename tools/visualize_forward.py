#!/usr/bin/env python
"""Forward-diffusion sanity visualization.

Rebuild of /root/reference/models/crowdPredTrainFwdExample.py:45-73 (the
"visualization-as-test" harness, SURVEY.md §4): renders q(x_t | x_0) of one
macroprop sequence at a ladder of timesteps so the noising schedule can be
eyeballed — density should fade into isotropic noise as t → T.

Usage::

    python tools/visualize_forward.py --config-yml-file configs/4test/ATC.yml \
        --timesteps 0 100 250 500 750 999 --out forward_process.png
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--config-yml-file", default="configs/4test/ATC.yml")
    p.add_argument("--configList-yml-file", default=None)
    p.add_argument("--timesteps", nargs="*", type=int,
                   default=[0, 100, 250, 500, 750, 999])
    p.add_argument("--out", default="forward_process.png")
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--synthetic", action="store_true",
                   help="Use the synthetic walker field instead of pickles.")
    args = p.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    import jax

    # Eyeball-scale work: run on host CPU rather than paying remote TPU
    # compiles for a handful of tiny q-samples.
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.core.schedule import linear_schedule, q_sample

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    h, w = cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS
    f = cfg.DATASET.FUTURE_LEN

    if args.synthetic or args.configList_yml_file is None:
        from crowdmod_tpu.data.synthetic import synthetic_walkers

        seq = synthetic_walkers(1, h, w, f)[0]  # (F, H, W, 3)
    else:
        from crowdmod_tpu.data.ingest import get_test_dataset

        ds = get_test_dataset(cfg, 3, seed=args.seed)
        _, future = ds.gather(np.arange(1))
        seq = np.asarray(future[0])

    sched = linear_schedule(cfg.MODEL.DDPM.TIMESTEPS, scale=cfg.MODEL.DDPM.SCALE)
    x0 = jnp.asarray(seq)[None]  # (1, F, H, W, C)

    ts = [t for t in args.timesteps if t < sched.timesteps]
    fig, axes = plt.subplots(
        1, len(ts), figsize=(2.2 * len(ts), 2.6), facecolor="white",
        squeeze=False,
    )
    for ax, t in zip(axes[0], ts):
        noisy, _ = q_sample(
            sched, x0, jnp.array([t]), jax.random.PRNGKey(args.seed + t)
        )
        ax.matshow(np.asarray(noisy)[0, 0, ..., 0], cmap=plt.cm.Blues)
        ax.set_title(f"t={t}", fontsize=9)
        ax.axis("off")
    fig.suptitle("Forward process q(x_t | x_0), density channel")
    fig.tight_layout()
    fig.savefig(args.out, dpi=150, bbox_inches="tight")
    print(args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
