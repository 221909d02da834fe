#!/usr/bin/env python
"""Batch scaling of the DDPM samplers on one chip.

The BASELINE.md metric is fixed at batch 64, but production serving wants
the chip's saturation point: how far does throughput rise (and per-sample
latency fall) as the sampler batch grows?  Round-1 recorded ~83k steps/s
for the DiT flagship at batch 256 with the burst-biased harness; this tool
re-measures the curve under the round-2 methodology (T=1000 chains are
long, so per-dispatch readback-minus-round-trip timing is valid —
tools/bench_suite.py::timeit).

Usage::

    python tools/bench_batch_scaling.py [--quick] [--backbone unet|dit|both]
        [--batches 16,32,64,128,256,512]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

from tools.bench_suite import timeit  # noqa: E402

P, F, H, W, C = 5, 3, 12, 36, 3


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--backbone", choices=["unet", "dit", "both"],
                   default="dit")
    p.add_argument("--batches", default="16,32,64,128,256,512")
    args = p.parse_args(argv)
    batches = [int(b) for b in args.batches.split(",")]

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized
    from crowdmod_tpu.models.diffusion import ddpm_sample

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    timesteps = 100 if args.quick else 1000
    sched = linear_schedule(timesteps, scale=0.5)

    models = {}
    if args.backbone in ("unet", "both"):
        models["unet"] = UNet3D(
            out_channels=C, base_channels=32,
            base_channels_multiples=(1, 2, 4),
            apply_attention=(False, False, True, False),
            dropout_rate=0.1, dtype=dtype,
        )
    if args.backbone in ("dit", "both"):
        models["dit"] = DiT4DFactorized(
            out_channels=C, grid_rows=H, grid_cols=W,
            patch_size=4, hidden_size=256, depth=6, num_heads=4,
            mlp_ratio=4.0, dropout_rate=0.1, time_multiple=4,
            past_len=P, future_len=F, t_patch_size=4, dtype=dtype,
        )

    for name, model in models.items():
        for b in batches:
            past = jnp.zeros((b, P, H, W, C), jnp.float32)
            future = jnp.zeros((b, F, H, W, C), jnp.float32)
            params = model.init(
                jax.random.PRNGKey(0), future, jnp.zeros((b,)), past
            )
            denoise = lambda x, t, c: model.apply(params, x, t, c)
            f = jax.jit(lambda p_, k: ddpm_sample(
                denoise, sched, p_, k, (b, F, H, W, C)))
            dt = timeit(f, past, jax.random.PRNGKey(1), reps=3)
            print(json.dumps({
                "metric": f"ddpm_{name}_steps_per_sec",
                "batch": b,
                "value": round(b * timesteps / dt, 1),
                "chain_latency_s": round(dt, 3),
                "unit": "sample-steps/s",
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
