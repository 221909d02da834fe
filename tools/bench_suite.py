#!/usr/bin/env python
"""Extended benchmark suite: every hot path, one JSON line per metric.

`bench.py` reports the single headline metric the driver records; this suite
covers the rest of the perf surface (training step, DDIM, flow-matching
integrators, ConvRNN rollout, on-device metric suite) for PERF.md and
regression tracking.

Usage::

    python tools/bench_suite.py [--quick]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

B, P, F, H, W, C = 64, 5, 3, 12, 36, 3


def _readback(x):
    """Force real completion: on tunneled TPU backends block_until_ready can
    resolve before the device finishes, and bursts of identical dispatches
    coalesce — a scalar readback per rep defeats both."""
    import jax
    import jax.numpy as jnp

    return float(jnp.ravel(jax.tree.leaves(x)[0])[0])


_RT = None


def _round_trip():
    global _RT
    if _RT is None:
        import jax
        import jax.numpy as jnp

        triv = jax.jit(lambda x: x + 1.0)
        y = triv(jnp.zeros((8,)))
        _readback(y)
        t0 = time.perf_counter()
        for _ in range(5):
            y = triv(y)
            _readback(y)
        _RT = (time.perf_counter() - t0) / 5
    return _RT


def timeit(fn, *args, reps=5):
    """Per-dispatch timing with readback and round-trip subtraction.

    Only valid for LONG programs (the sampler/integrator scans, ~0.5-5 s):
    for short single-dispatch programs the terminal coalesces repeated
    identical dispatches and `elapsed - round_trip` collapses to ~0 —
    use timeit_scan for those (PERF.md round-2 methodology)."""
    _readback(fn(*args))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        _readback(out)
        times.append(time.perf_counter() - t0 - _round_trip())
    return max(min(times), 1e-9)


def timeit_scan(fn, x, *rest, iters=20, reps=3):
    """On-device iteration loop for short programs: chain ``iters``
    evaluations of ``fn(x, *rest)`` inside one jitted ``lax.scan`` with a
    scalar *mean* coupling (a single-element coupling gets DCE-sliced),
    read back once, subtract the round trip, divide by ``iters``."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, *rest):
        def body(s, _):
            out = fn(x + s, *rest)
            leaves = jax.tree.leaves(out)
            m = sum(jnp.mean(l.astype(jnp.float32)) for l in leaves)
            return m * 1e-20, None

        s, _ = jax.lax.scan(body, jnp.float32(0), None, length=iters)
        return s

    _readback(run(x, *rest))
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        _readback(run(x, *rest))
        times.append(time.perf_counter() - t0 - _round_trip())
    return max(min(times) / iters, 1e-9)


def report(metric, value, unit):
    print(json.dumps({"metric": metric, "value": round(value, 1), "unit": unit}))


SECTIONS = (
    "ddpm", "dit", "ddim", "distilled", "train", "fm", "convrnn", "metrics"
)


def main(argv=None) -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--quick", action="store_true")
    p.add_argument(
        "--only", default=None,
        help="comma-separated subset of sections to run: "
             + ",".join(SECTIONS),
    )
    args = p.parse_args(argv)
    only = set(args.only.split(",")) if args.only else set(SECTIONS)
    unknown = only - set(SECTIONS)
    if unknown:
        p.error(f"unknown sections {sorted(unknown)}")
    run = only.__contains__

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.core.schedule import ddim_tau_schedule, linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.diffusion import ddim_sample, ddpm_loss, ddpm_sample
    from crowdmod_tpu.models.flow_matching import euler_sample, fm_loss, heun_sample
    from crowdmod_tpu.train.optim import adam_with_plateau
    from crowdmod_tpu.train.state import TrainState, make_train_step

    on_tpu = jax.default_backend() == "tpu"
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    T = 200 if args.quick else 1000

    model = UNet3D(
        out_channels=C, base_channels=32, base_channels_multiples=(1, 2, 4),
        apply_attention=(False, False, True, False), dropout_rate=0.1,
        dtype=dtype,
    )
    past = jnp.zeros((B, P, H, W, C), jnp.float32)
    future = jnp.zeros((B, F, H, W, C), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((B,)), past)
    denoise = lambda x, t, cond: model.apply(params, x, t, cond)
    sched = linear_schedule(T, scale=0.5)

    # 1. DDPM ancestral sampling (headline).
    if run("ddpm"):
        f = jax.jit(lambda p_, k: ddpm_sample(denoise, sched, p_, k, (B, F, H, W, C)))
        dt = timeit(f, past, jax.random.PRNGKey(1), reps=3)
        report("ddpm_denoise_steps_per_sec", B * T / dt, "sample-steps/s")

    # 1b. DDPM-DiT flagship (reference DDPM-DiT config).
    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized

    if run("dit"):
        dit = DiT4DFactorized(
            out_channels=C, grid_rows=H, grid_cols=W,
            patch_size=4, hidden_size=256, depth=6, num_heads=4,
            mlp_ratio=4.0, dropout_rate=0.1, time_multiple=4,
            past_len=P, future_len=F, t_patch_size=4, dtype=dtype,
        )
        dit_params = dit.init(jax.random.PRNGKey(0), future, jnp.zeros((B,)), past)
        f = jax.jit(lambda p_, k: ddpm_sample(
            lambda x, t, c_: dit.apply(dit_params, x, t, c_),
            sched, p_, k, (B, F, H, W, C)))
        dt = timeit(f, past, jax.random.PRNGKey(1), reps=3)
        report("ddpm_dit_denoise_steps_per_sec", B * T / dt, "sample-steps/s")

    # 2. DDIM (divider 10).
    if run("ddim"):
        taus = ddim_tau_schedule(T, 10)
        f = jax.jit(lambda p_, k: ddim_sample(
            denoise, sched, p_, k, (B, F, H, W, C), taus))
        dt = timeit(f, past, jax.random.PRNGKey(1), reps=3)
        report("ddim10_samples_per_sec", B / dt, "full samples/s (batch 64)")

    # 2b. Distilled few-step sampler (DiT flagship geometry; the chain is
    # milliseconds, so the scan harness is mandatory).
    if run("distilled"):
        from crowdmod_tpu.models.diffusion import distilled_sample

        d_model = DiT4DFactorized(
            out_channels=C, grid_rows=H, grid_cols=W,
            patch_size=4, hidden_size=256, depth=6, num_heads=4,
            mlp_ratio=4.0, dropout_rate=0.1, time_multiple=4,
            past_len=P, future_len=F, t_patch_size=4, dtype=dtype,
        )
        d_params = d_model.init(
            jax.random.PRNGKey(0), future, jnp.zeros((B,)), past
        )
        d_fn = lambda x, t, c_: d_model.apply(d_params, x, t, c_)
        dt = timeit_scan(
            lambda p_, k: distilled_sample(
                d_fn, sched, p_, k, (B, F, H, W, C), 8
            ),
            past, jax.random.PRNGKey(1), iters=50, reps=3,
        )
        report("distilled8_samples_per_sec", B / dt,
               "full samples/s (batch 64, 8-step DiT student)")

    # 3. Training step throughput.
    if run("train"):
        def loss_fn(prm, batch, key):
            p_, f_ = batch
            d = lambda x, t, c_: model.apply(
                prm, x, t, c_, deterministic=False, rngs={"dropout": key}
            )
            return ddpm_loss(d, sched, f_, p_, key)

        state = TrainState.create(params, adam_with_plateau(1e-4))
        step = make_train_step(loss_fn, donate=False)
        dt = timeit(step, state, (past, future), jax.random.PRNGKey(2), reps=10)
        report("train_steps_per_sec", 1.0 / dt, "optimizer steps/s (batch 64)")
        report("train_samples_per_sec", B / dt, "training samples/s")

    # 4. Flow matching integrators.
    if run("fm"):
        steps = 100 if args.quick else 1000
        f = jax.jit(lambda p_, k: euler_sample(
            denoise, p_, k, (B, F, H, W, C), steps=steps, time_max_pos=T))
        dt = timeit(f, past, jax.random.PRNGKey(3), reps=3)
        report("fm_euler_steps_per_sec", B * steps / dt, "integrator steps/s")

        f = jax.jit(lambda p_, k: heun_sample(
            denoise, p_, k, (B, F, H, W, C), steps=steps // 2, time_max_pos=T))
        dt = timeit(f, past, jax.random.PRNGKey(3), reps=3)
        report("fm_heun_steps_per_sec", B * (steps // 2) / dt, "integrator steps/s")

    # 5. ConvRNN rollout.
    from crowdmod_tpu.models.convrnn import CELLS, Forecaster

    if run("convrnn"):
        conv_model = Forecaster(
            out_channels=4,
            cell=CELLS["ConvGRUCell"],
            dtype=dtype,
        )
        past4 = jnp.zeros((B, P, H, W, 4), jnp.float32)
        cparams = conv_model.init(jax.random.PRNGKey(4), past4, future_len=F,
                                  teacher_forcing=False)
        f = lambda x: conv_model.apply(
            cparams, x, future_len=F, teacher_forcing=False)
        dt = timeit_scan(f, past4, iters=200)
        report("convrnn_rollouts_per_sec", B / dt, "forecasts/s (batch 64)")

    # 6. On-device metric suite.
    from crowdmod_tpu.metrics import functional as mf

    if run("metrics"):
        key = jax.random.PRNGKey(5)
        pred = jax.random.uniform(key, (256, F, H, W, C))
        gt = jax.random.uniform(jax.random.fold_in(key, 1), (256, F, H, W, C))

        def metric_suite(pred, gt):
            r = mf.channel_ranges(gt)
            return (
                mf.psnr_over_time(pred, gt, r),
                mf.psnr_over_time(pred, gt, r, masked=True),
                mf.ssim_over_time(pred, gt, r),
                mf.tv_over_time(pred, gt),
                mf.re_density(pred, gt),
            )

        dt = timeit_scan(metric_suite, pred, gt, iters=600)
        report("metric_suite_seqs_per_sec", 256 / dt,
               "sequences/s (PSNR+mPSNR+SSIM+TV+RE)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
