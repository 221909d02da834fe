#!/usr/bin/env python
"""Sampler performance lab: measure the knobs that matter on this chip.

Maintained version of the ad-hoc profiling used to tune the reverse-sampler
hot path (see PERF.md for recorded results).  Measures end-to-end 1000-step
ancestral-sampling throughput for combinations of:

  * Pallas kernel routing  (CROWDMOD_FORCE_PALLAS: off | compiled)
  * Conv3D lowering        (CROWDMOD_CONV3D_IMPL: direct | split_t | fold_t)
  * lax.scan unroll factor

Usage::

    python tools/profile_sampler.py                  # default sweep
    python tools/profile_sampler.py --quick          # one config, T=200
"""

from __future__ import annotations

import argparse
import itertools
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def measure(pallas: str, conv_impl: str, unroll: int, timesteps: int,
            reps: int) -> float:
    os.environ["CROWDMOD_FORCE_PALLAS"] = pallas
    os.environ["CROWDMOD_CONV3D_IMPL"] = conv_impl

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.diffusion import ddpm_sample

    b, p, f, h, w, c = 64, 5, 3, 12, 36, 3
    on_tpu = jax.default_backend() == "tpu"
    model = UNet3D(
        out_channels=c, base_channels=32, base_channels_multiples=(1, 2, 4),
        apply_attention=(False, False, True, False), dropout_rate=0.1,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32,
    )
    past = jnp.zeros((b, p, h, w, c), jnp.float32)
    future = jnp.zeros((b, f, h, w, c), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((b,)), past)
    sched = linear_schedule(timesteps, scale=0.5)
    sample = jax.jit(lambda past, key: ddpm_sample(
        lambda x, t, cond: model.apply(params, x, t, cond),
        sched, past, key, (b, f, h, w, c), unroll=unroll))
    out = sample(past, jax.random.PRNGKey(1))
    _ = float(jnp.ravel(out)[0])  # readback: tunnels can resolve block early
    triv = jax.jit(lambda x: x + 1.0)
    y = triv(jnp.zeros((8,)))
    _ = float(y[0])
    t0 = time.perf_counter()
    for _ in range(5):
        y = triv(y)
        _ = float(y[0])
    rt = (time.perf_counter() - t0) / 5  # dispatch+readback round trip
    times = []
    for i in range(reps):
        t0 = time.perf_counter()
        out = sample(past, jax.random.PRNGKey(2 + i))
        _ = float(jnp.ravel(out)[0])
        times.append(time.perf_counter() - t0 - rt)
    return b * timesteps / min(times)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--quick", action="store_true")
    p.add_argument("--timesteps", type=int, default=None)
    p.add_argument("--reps", type=int, default=3)
    p.add_argument("--pallas", nargs="*", default=None)
    p.add_argument("--conv", nargs="*", default=None)
    p.add_argument("--unroll", nargs="*", type=int, default=None)
    args = p.parse_args(argv)

    timesteps = args.timesteps or (200 if args.quick else 1000)
    pallas_opts = args.pallas or (["off"] if args.quick else ["off", "compiled"])
    conv_opts = args.conv or (["direct"] if args.quick else ["direct", "split_t"])
    unroll_opts = args.unroll or [1]

    best = (None, 0.0)
    for pl, cv, un in itertools.product(pallas_opts, conv_opts, unroll_opts):
        rate = measure(pl, cv, un, timesteps, args.reps)
        tag = f"pallas={pl} conv={cv} unroll={un}"
        print(f"{tag}: {rate:.0f} denoise steps/s")
        if rate > best[1]:
            best = (tag, rate)
    print(f"best: {best[0]} @ {best[1]:.0f} steps/s")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
