#!/usr/bin/env python
"""Measure the im2col Pallas Conv3D against XLA's native conv on TPU.

The VERDICT round-1 item 3 deliverable: a MEASURED kernel at the reference
UNet's narrow-channel shapes (not a projection).  Prints a table of
µs/conv and effective TF/s for each (Cin, Cout) level of the UNet at the
ATC sampling workload (B=64, 3×12×36 grid), XLA vs Pallas f32/bf16.

Run on the real chip: ``python tools/bench_conv_kernel.py``.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=50, warmup=5):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    from crowdmod_tpu.ops.conv3d import conv3d_same
    from crowdmod_tpu.ops.pallas.conv3d import conv3d_same_im2col

    b, t, h, w = 64, 3, 12, 36
    shapes = [(32, 32), (64, 32), (96, 32), (3, 32), (64, 64), (128, 128)]
    rng = np.random.default_rng(0)
    xla = jax.jit(lambda x, k: conv3d_same(x, k, "direct"))
    xla16 = jax.jit(
        lambda x, k: conv3d_same(
            x.astype(jnp.bfloat16), k.astype(jnp.bfloat16), "direct"
        ).astype(jnp.float32)
    )

    print(f"B={b} vol=({t},{h},{w})  iters=50  "
          f"backend={jax.default_backend()}")
    print(f"{'Cin->Cout':>10} {'XLA f32':>9} {'XLA bf16':>9} "
          f"{'pallas f32':>10} {'pallas bf16':>11}  (µs, eff TF/s)")
    for cin, cout in shapes:
        # 64-ch levels run at T,H,W/2; 128 at /4 — use the real volumes.
        scale = 1 if cout <= 32 else (2 if cout == 64 else 4)
        tt, hh, ww = max(t // scale, 1), h // scale, w // scale
        x = jnp.asarray(
            rng.normal(size=(b, tt, hh, ww, cin)).astype(np.float32)
        )
        k = jnp.asarray(
            rng.normal(size=(3, 3, 3, cin, cout)).astype(np.float32) * 0.1
        )
        flops = 2 * b * tt * hh * ww * 27 * cin * cout

        res = {}
        res["xla32"] = timeit(xla, x, k)
        res["xla16"] = timeit(xla16, x, k)
        try:
            res["pl32"] = timeit(conv3d_same_im2col, x, k)
        except Exception as e:
            print(f"  pallas f32 failed for {cin}->{cout}: {e}")
            res["pl32"] = float("nan")
        try:
            pl16 = jax.jit(
                lambda x, k: conv3d_same_im2col(
                    x, k, compute_dtype=jnp.bfloat16
                )
            )
            res["pl16"] = timeit(pl16, x, k)
        except Exception as e:
            print(f"  pallas bf16 failed for {cin}->{cout}: {e}")
            res["pl16"] = float("nan")

        # Parity spot check on the compiled kernels.
        try:
            err = float(jnp.abs(conv3d_same_im2col(x, k) - xla(x, k)).max())
        except Exception as e:
            err = float("nan")
            print(f"  parity check failed for {cin}->{cout}: {e}")
        line = f"{cin:>6}->{cout:<3}"
        for key in ("xla32", "xla16", "pl32", "pl16"):
            us = res[key] * 1e6
            tf = flops / res[key] / 1e12 if res[key] > 0 else 0
            line += f" {us:7.1f}({tf:5.1f})"
        print(line + f"  |err vs XLA: {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
