#!/usr/bin/env python
"""Measure the weight-stationary fused resblock kernel against the XLA path.

PERF.md "Next levers #1" deliverable: the fused GN→conv→temb→GN→conv→skip
Pallas kernel (ops/pallas/resblock.py) vs the XLA op chain, at every
(Cin→Cout, volume) the reference UNet instantiates on the ATC geometry
(BASE_CH 32, mult [1,2,4] — configs/ATC.yml), batch 64, bf16, T=1000-scan
methodology (mean-coupled on-device loop, round-trip subtracted — PERF.md
round-2 methodology).

Run on the real chip: ``python tools/bench_resblock.py``.
"""

import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import numpy as np

import jax
import jax.numpy as jnp

B = 64
ITERS = 200

# (label, Cin, Cout, T, H, W) — every ResnetBlock3D instance of the ATC UNet
# (level-2 attention blocks excluded: the kernel doesn't cover attention).
CASES = [
    ("enc_0_0 32->32 @(8,12,36)", 32, 32, 8, 12, 36),
    ("dec_0_0 96->32 @(8,12,36)", 96, 32, 8, 12, 36),
    ("dec_0_1 64->32 @(8,12,36)", 64, 32, 8, 12, 36),
    ("enc_1_0 32->64 @(4,6,18)", 32, 64, 4, 6, 18),
    ("dec_1_0 192->64 @(4,6,18)", 192, 64, 4, 6, 18),
    ("dec_1_1 96->64 @(4,6,18)", 96, 64, 4, 6, 18),
    ("mid_1 128->128 @(2,3,9)", 128, 128, 2, 3, 9),
]

_RT = None


def round_trip():
    global _RT
    if _RT is None:
        from crowdmod_tpu.utils.profiling import measure_round_trip

        _RT = measure_round_trip()
        print(f"round-trip baseline: {_RT*1e3:.1f} ms", flush=True)
    return _RT


def timed(fn, *args):
    t0 = time.perf_counter()
    out = fn(*args)
    _ = float(jnp.ravel(out)[0])
    return time.perf_counter() - t0 - round_trip()


def make_weights(key, cin, cout, dtype):
    ks = jax.random.split(key, 10)
    n = lambda k, s, sc: (jax.random.normal(k, s) * sc).astype(jnp.float32)
    w = {
        "gn1_scale": n(ks[0], (cin,), 0.1) + 1.0,
        "gn1_bias": n(ks[1], (cin,), 0.1),
        "w1": n(ks[2], (3, 3, 3, cin, cout), 0.05),
        "b1": n(ks[3], (cout,), 0.1),
        "gn2_scale": n(ks[4], (cout,), 0.1) + 1.0,
        "gn2_bias": n(ks[5], (cout,), 0.1),
        "w2": n(ks[6], (3, 3, 3, cout, cout), 0.05),
        "b2": n(ks[7], (cout,), 0.1),
    }
    if cin != cout:
        w["w_skip"] = n(ks[8], (1, 1, 1, cin, cout), 0.1)
        w["b_skip"] = n(ks[9], (cout,), 0.1)
    return w


def bench_case(label, cin, cout, t, h, wd, dtype=jnp.bfloat16):
    from crowdmod_tpu.ops.pallas.resblock import (
        fused_resblock,
        resblock_reference,
    )

    key = jax.random.PRNGKey(0)
    x0 = jax.random.normal(key, (B, t, h, wd, cin)).astype(dtype)
    temb = jax.random.normal(jax.random.PRNGKey(1), (B, cout)).astype(dtype)
    w = make_weights(jax.random.PRNGKey(2), cin, cout, dtype)

    def loop(op):
        def body(carry, _):
            x, s = carry
            y = op(x + (s * 1e-20).astype(dtype))
            return (x, jnp.ravel(y)[0].astype(jnp.float32)), None

        def run(x):
            (_, s), _ = jax.lax.scan(body, (x, jnp.float32(0)), None,
                                     length=ITERS)
            return s

        return jax.jit(run)

    xla = loop(lambda x: resblock_reference(x, temb, w))
    fused = loop(lambda x: fused_resblock(x, temb, w, mode="compiled"))

    # Parity gate before timing anything.
    ref = resblock_reference(x0, temb, w)
    out = fused_resblock(x0, temb, w, mode="compiled")
    rel = float(jnp.max(jnp.abs(
        out.astype(jnp.float32) - ref.astype(jnp.float32)
    )) / (jnp.max(jnp.abs(ref.astype(jnp.float32))) + 1e-9))

    _ = float(xla(x0))
    _ = float(fused(x0))
    t_xla = min(timed(xla, x0) for _ in range(3)) / ITERS
    t_fused = min(timed(fused, x0) for _ in range(3)) / ITERS
    flops = 2 * B * t * h * wd * 27 * (cin * cout + cout * cout)
    print(
        f"{label:>28}  XLA {t_xla*1e6:7.1f}us  fused {t_fused*1e6:7.1f}us  "
        f"speedup {t_xla/t_fused:5.2f}x  "
        f"(fused {flops/t_fused/1e12:5.1f} TF/s-eff, parity rel {rel:.1e})",
        flush=True,
    )
    return t_xla, t_fused


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--filter", default="", help="substring case filter")
    args = ap.parse_args()
    cases = [c for c in CASES if args.filter in c[0]]
    print(f"backend={jax.default_backend()}  B={B}  iters={ITERS}  bf16",
          flush=True)
    round_trip()
    totals = [0.0, 0.0]
    for case in cases:
        try:
            t_xla, t_fused = bench_case(*case)
            totals[0] += t_xla
            totals[1] += t_fused
        except Exception as e:  # noqa: BLE001 — report per-case, keep going
            print(f"{case[0]:>28}  FAILED: {type(e).__name__}: {e}",
                  flush=True)
    print(f"{'TOTAL (all blocks)':>28}  XLA {totals[0]*1e6:7.1f}us  "
          f"fused {totals[1]*1e6:7.1f}us", flush=True)


if __name__ == "__main__":
    main()
