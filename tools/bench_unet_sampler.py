#!/usr/bin/env python
"""UNet ancestral-sampler perf lab — remote-execution-safe methodology.

The axon TPU tunnel makes naive timing loops lie twice: repeated identical
dispatches coalesce (yielding impossible >peak TF/s), and every dispatch
with fresh inputs pays a ~40-130 ms round trip.  Every measurement here
therefore (a) puts the iteration loop ON DEVICE (fori_loop/scan inside one
jit), (b) forces a scalar readback, and (c) subtracts the measured
dispatch+readback round trip.  A 4096³ bf16 GEMM calibration must land
below the chip's ~394 TF/s peak or the run is rejected.

Run ALONE on the chip — concurrent TPU work invalidates every number.
"""

import argparse
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

import numpy as np

import jax
import jax.numpy as jnp

_RT = None


def round_trip() -> float:
    """Measured dispatch + scalar-readback round trip, cached."""
    global _RT
    if _RT is None:
        triv = jax.jit(lambda x: x + 1.0)
        y = triv(jnp.zeros((8,)))
        _ = float(y[0])
        t0 = time.perf_counter()
        for _ in range(5):
            y = triv(y)
            _ = float(y[0])
        _RT = (time.perf_counter() - t0) / 5
        print(f"round-trip baseline: {_RT*1e3:.1f} ms", flush=True)
    return _RT


def timed_call(fn, *args) -> float:
    """Wall time of ONE dispatch of ``fn`` (must return something whose
    [0] flattens to a scalar), readback included, round trip removed."""
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return time.perf_counter() - t0 - round_trip()


def calibrate():
    n = 4096
    rng = np.random.default_rng(0)
    a = jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    b = (
        jnp.asarray(rng.normal(size=(n, n)).astype(np.float32)) / np.sqrt(n)
    ).astype(jnp.bfloat16)
    iters = 50

    def body(i, acc):
        return jnp.dot(
            acc, b, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    loop = jax.jit(lambda a: jax.lax.fori_loop(0, iters, body, a))
    _ = float(jnp.ravel(loop(a))[0])  # warm
    dt = min(timed_call(loop, a) for _ in range(3)) / iters
    tf = 2 * n**3 / dt / 1e12
    print(f"CALIBRATION bf16 {n}^3 GEMM: {dt*1e6:.0f}us = {tf:.0f} TF/s "
          f"(sane iff < ~394)", flush=True)
    if tf > 420:
        raise SystemExit("calibration exceeds hardware peak — timing broken")


def bench_op(coupler, iters=30):
    """Build an on-device timing loop for an op, chained via ``coupler``.

    ``coupler(x, s)`` must return a valid input given carry scalar ``s`` —
    the data dependency that stops XLA/the terminal from collapsing the
    loop.  Overhead of the coupler is measured with an identity op and
    subtracted.
    """

    def loop_fn(op):
        def body(carry, _):
            x, s = carry
            y = op(coupler(x, s))
            return (x, jnp.ravel(y)[0].astype(jnp.float32) * 1e-20), None

        def run(x):
            (x, s), _ = jax.lax.scan(body, (x, 0.0), None, length=iters)
            return s

        return jax.jit(run)

    return loop_fn


def conv_table():
    from crowdmod_tpu.ops.conv3d import conv3d_same
    from crowdmod_tpu.ops.pallas.conv3d import conv3d_same_im2col

    rng = np.random.default_rng(0)
    b = 64
    cases = [
        ("L0 first", (8, 12, 36), 3, 32),
        ("L0 rb", (8, 12, 36), 32, 32),
        ("L0 dec-cat", (8, 12, 36), 96, 32),
        ("L1 rb", (4, 6, 18), 64, 64),
        ("L2 rb", (2, 3, 9), 128, 128),
    ]
    iters = 30
    print(f"{'case':>11} {'shape':>11} {'Cin->Cout':>9}   "
          f"xla32    xla16    pl32     pl16   (us/conv, coupler-corrected)",
          flush=True)
    for name, (t, h, w), cin, cout in cases:
        x = jnp.asarray(
            rng.normal(size=(b, t, h, w, cin)).astype(np.float32)
        )
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.1
        )
        k16 = k.astype(jnp.bfloat16)
        coupler = lambda x, s: x + s
        harness = bench_op(coupler, iters)

        def run_variant(op):
            fn = harness(op)
            _ = float(fn(x))  # warm/compile
            return min(timed_call(fn, x) for _ in range(2)) / iters

        base = run_variant(lambda xx: xx)  # coupler+copy overhead
        variants = {
            "xla32": lambda xx: conv3d_same(xx, k, "direct"),
            "xla16": lambda xx: conv3d_same(
                xx.astype(jnp.bfloat16), k16, "direct"),
            "pl32": lambda xx: conv3d_same_im2col(xx, k),
            "pl16": lambda xx: conv3d_same_im2col(
                xx.astype(jnp.bfloat16), k16,
                compute_dtype=jnp.bfloat16),
        }
        res = []
        for vname, op in variants.items():
            try:
                res.append(max(run_variant(op) - base, 0.0) * 1e6)
            except Exception as e:
                print(f"  {name} {vname} failed: {str(e)[:100]}", flush=True)
                res.append(float("nan"))
        print(f"{name:>11} {str((t,h,w)):>11} {cin:>4}->{cout:<4}"
              + " ".join(f"{r:8.1f}" for r in res)
              + f"   (loop overhead {base*1e6:.1f})", flush=True)


def sampler(dtype, conv_impl, timesteps, reps=3):
    os.environ["CROWDMOD_CONV3D_IMPL"] = conv_impl
    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.diffusion import ddpm_sample

    b, p, f, h, w, c = 64, 5, 3, 12, 36, 3
    model = UNet3D(
        out_channels=c, base_channels=32, base_channels_multiples=(1, 2, 4),
        apply_attention=(False, False, True, False), dropout_rate=0.1,
        dtype=dtype,
    )
    past = jnp.zeros((b, p, h, w, c), jnp.float32)
    future = jnp.zeros((b, f, h, w, c), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), future, jnp.zeros((b,)), past)
    sched = linear_schedule(timesteps, scale=0.5)
    sample = jax.jit(lambda past, key: ddpm_sample(
        lambda x, t, cond: model.apply(params, x, t, cond),
        sched, past, key, (b, f, h, w, c)))
    _ = float(jnp.ravel(sample(past, jax.random.PRNGKey(1)))[0])  # compile
    dts = [
        timed_call(sample, past, jax.random.PRNGKey(2 + i))
        for i in range(reps)
    ]
    dt = min(dts)
    sps = b * timesteps / dt
    print(f"SAMPLER dtype={dtype.__name__:>9} conv={conv_impl:>7} "
          f"T={timesteps}: {sps:,.0f} steps/s ({dt*1e3:.0f} ms/chain)",
          flush=True)
    return sps


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--timesteps", type=int, default=1000)
    ap.add_argument("--skip-table", action="store_true")
    ap.add_argument("--impls", nargs="*", default=["direct", "pallas"])
    ap.add_argument("--dtypes", nargs="*", default=["bfloat16", "float32"])
    args = ap.parse_args()
    print("backend:", jax.default_backend(), flush=True)
    round_trip()
    calibrate()
    if not args.skip_table:
        conv_table()
    for dname in args.dtypes:
        for impl in args.impls:
            try:
                sampler(getattr(jnp, dname), impl, args.timesteps)
            except Exception as e:
                print(f"sampler {dname}/{impl} failed: {str(e)[:200]}",
                      flush=True)


if __name__ == "__main__":
    main()
