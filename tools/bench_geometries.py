#!/usr/bin/env python
"""Sampler throughput across every bundled dataset geometry.

The reference ships six grid geometries (SURVEY §2.1 / its config/*.yml);
all perf work so far measured only the canonical ATC 12×36.  This sweep
runs the two DDPM samplers (UNet3D and the DiT flagship, both at their
reference ATC model configs) at every bundled geometry, proving the
static-shape compile story spans the whole config surface and showing how
throughput scales with grid area.

Timing: the T=1000 fused `lax.scan` chain is long (~0.5-5 s), so the
per-dispatch readback-minus-round-trip harness of tools/bench_suite.py is
valid here (PERF.md round-2 methodology).

Usage::

    python tools/bench_geometries.py [--quick] [--backbone unet|dit|both]
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

B, P, F, C = 64, 5, 3, 3

# Bundled configs with distinct grids (the -OBST variants share geometry
# with their base configs).
GEOMETRY_CONFIGS = [
    "ATC.yml",            # 12×36
    "HERMES-BO.yml",      # 12×24
    "HERMES-BN.yml",      # 28×16
    "HERMES-CR-90.yml",   # 12×20
    "HERMES-CR-120.yml",  # 28×24
    "ETHUCY.yml",         # 8×12
]


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument("--backbone", choices=["unet", "dit", "both"],
                   default="both")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized
    from crowdmod_tpu.models.diffusion import ddpm_sample

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    timesteps = 100 if args.quick else 1000
    sched = linear_schedule(timesteps, scale=0.5)

    for cfg_name in GEOMETRY_CONFIGS:
        cfg = load_config(cfg_name)
        h, w = int(cfg.MACROPROPS.ROWS), int(cfg.MACROPROPS.COLS)
        past = jnp.zeros((B, P, h, w, C), jnp.float32)
        future = jnp.zeros((B, F, h, w, C), jnp.float32)

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
                out_channels=C, grid_rows=h, grid_cols=w,
                patch_size=4, hidden_size=256, depth=6, num_heads=4,
                mlp_ratio=4.0, dropout_rate=0.1, time_multiple=4,
                past_len=P, future_len=F, t_patch_size=4, dtype=dtype,
            )

        for name, model in models.items():
            params = model.init(
                jax.random.PRNGKey(0), future, jnp.zeros((B,)), past
            )
            denoise = lambda x, t, c: model.apply(params, x, t, c)
            f = jax.jit(lambda p_, k: ddpm_sample(
                denoise, sched, p_, k, (B, F, h, w, C)))
            dt = timeit(f, past, jax.random.PRNGKey(1), reps=3)
            print(json.dumps({
                "metric": f"ddpm_{name}_steps_per_sec",
                "geometry": f"{h}x{w}",
                "config": cfg_name,
                "value": round(B * timesteps / dt, 1),
                "unit": "sample-steps/s (batch 64)",
            }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
