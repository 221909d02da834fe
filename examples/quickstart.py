#!/usr/bin/env python
"""Library quickstart: the whole framework in ~80 lines, no CLI.

Trains a small DDPM on the synthetic walker dataset, samples futures three
ways (ancestral / DDIM / DPM-Solver), scores them on device, and renders a
prediction GIF — the same flow a production user composes from the library.

    python examples/quickstart.py            # runs anywhere (CPU or TPU)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from crowdmod_tpu.config import load_config
from crowdmod_tpu.core.schedule import ddim_tau_schedule
from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.data.windows import WindowDataset
from crowdmod_tpu.metrics import functional as F
from crowdmod_tpu.models.diffusion import ddim_sample, dpm_solver_sample
from crowdmod_tpu.train.trainer import Trainer


def main():
    # 1. Config: the YAML schema is the reference project's — override what
    #    you need as a plain dict.
    cfg = load_config("4test/ATC.yml").updated({
        "DATA_FS": {"SAVE_DIR": "/tmp/qs_ckpts", "OUTPUT_DIR": "/tmp/qs_out"},
        "DATASET": {"BATCH_SIZE": 16},
        "MACROPROPS": {"ROWS": 8, "COLS": 12},   # small grid → fast anywhere
        "MODEL": {"DDPM": {"TIMESTEPS": 100,
                           "UNET": {"BASE_CH": 16, "BASE_CH_MULT": [1, 2],
                                    "APPLY_ATTENTION": [False, False],
                                    "TRAIN": {"EPOCHS": 8}}}},
    })

    # 2. Data: any (N, T, H, W, C) array becomes a device-resident windowed
    #    dataset.  Real pipelines use crowdmod_tpu.data.ingest / etl.
    walkers = synthetic_walkers(64, cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS, 16)
    ds = WindowDataset(jnp.asarray(walkers), past_len=5, future_len=3, stride=4)

    # 3. Train: one Trainer for DDPM / FM / ConvRNN.
    trainer = Trainer(cfg, "DDPM-UNet", run_dir="/tmp/qs_run")
    history = trainer.fit(ds, epochs=10)
    print(f"final loss: {history['train_loss'][-1]:.4f}")

    # 4. Sample three ways.  trainer.sample uses the configured sampler;
    #    the sampler functions are also usable directly.
    past, future = ds.gather(np.arange(8))
    key = jax.random.PRNGKey(0)
    shape = (8, 3, cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS, 3)
    denoise = trainer._denoise_fn()

    ancestral = trainer.sample(past, key)
    ddim = ddim_sample(denoise, trainer.sched, past, key, shape,
                       ddim_tau_schedule(100, 10))
    fast = dpm_solver_sample(denoise, trainer.sched, past, key, shape, steps=15)

    # 5. Score on device.
    ranges = F.channel_ranges(future)
    for name, pred in [("ancestral", ancestral), ("ddim/10", ddim),
                       ("dpm-solver/15", fast)]:
        psnr = float(jnp.mean(F.psnr_over_time(pred, future, ranges)[..., 0]))
        print(f"{name:>14}: density PSNR {psnr:6.2f} dB "
              f"({pred.shape[0]} samples)")

    # 6. Render one prediction GIF.
    from crowdmod_tpu.viz.plot_crowd import render_pred_vs_gt_gif

    gif = render_pred_vs_gt_gif(
        np.asarray(fast[0]), np.asarray(future[0]), "/tmp/qs_out/pred.gif"
    )
    print(f"wrote {gif}")


if __name__ == "__main__":
    main()
