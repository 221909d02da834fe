#!/usr/bin/env python
"""Benchmark: DDPM reverse-sampling throughput on the flagship model.

Metric (BASELINE.md): denoise steps/sec/chip at batch 64 on the canonical ATC
geometry — one "denoise step" is one sample advanced one reverse timestep, so
rate = batch * timesteps / wall_time for the full fused ``lax.scan`` sampler.
Target: >= 25,000 on TPU v5e.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import time

import jax
import jax.numpy as jnp

BASELINE_STEPS_PER_SEC = 25_000.0


def main():
    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.diffusion import ddpm_sample

    on_tpu = jax.default_backend() == "tpu"
    compute_dtype = jnp.bfloat16 if on_tpu else jnp.float32

    b, p, f, h, w, c = 64, 5, 3, 12, 36, 3
    timesteps = 1000

    model = UNet3D(
        out_channels=c,
        base_channels=32,
        base_channels_multiples=(1, 2, 4),
        apply_attention=(False, False, True, False),
        dropout_rate=0.1,
        dtype=compute_dtype,
    )
    past = jnp.zeros((b, p, h, w, c), jnp.float32)
    future = jnp.zeros((b, f, h, w, c), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((b,)), past)
    sched = linear_schedule(timesteps, scale=0.5)

    def denoise(x, t, cond):
        return model.apply(params, x, t, cond)

    @jax.jit
    def sample(past, key):
        return ddpm_sample(denoise, sched, past, key, (b, f, h, w, c))

    # Warmup / compile.
    out = sample(past, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    reps = 3
    start = time.perf_counter()
    for i in range(reps):
        out = sample(past, jax.random.PRNGKey(2 + i))
    jax.block_until_ready(out)
    elapsed = (time.perf_counter() - start) / reps

    steps_per_sec = b * timesteps / elapsed
    print(
        json.dumps(
            {
                "metric": "ddpm_denoise_steps_per_sec_per_chip",
                "value": round(steps_per_sec, 1),
                "unit": "sample-steps/s (batch 64, ATC 12x36x3 grid, UNet3D, T=1000)",
                "vs_baseline": round(steps_per_sec / BASELINE_STEPS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
