#!/usr/bin/env python
"""Streaming-input soak: train through a corpus bigger than you'd ever hold
resident, one file at a time.

Generates (once) N pickle files of synthetic macroprops in the reference
layout, then runs a full epoch of ``FileWindowStream → device_prefetch →
jitted train step`` and reports throughput plus how completely file IO was
hidden behind compute.  Use ``--gb`` to size the corpus (files are ~512 MB
each); peak host memory stays at ~2 files regardless of corpus size.

    python tools/soak_stream.py --gb 6
"""

from __future__ import annotations

import argparse
import os
import pickle
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)


def ensure_corpus(root: str, n_files: int, n_per: int, h: int, w: int,
                  L: int) -> list[str]:
    os.makedirs(root, exist_ok=True)
    paths = []
    rng = np.random.default_rng(0)
    for k in range(n_files):
        p = os.path.join(root, f"soak{k}.pkl")
        if not os.path.exists(p):
            t0 = time.perf_counter()
            arr = np.abs(
                rng.normal(size=(n_per, 4, h, w, L))
            ).astype(np.float32)
            with open(p, "wb") as f:
                pickle.dump(arr, f, protocol=4)
            print(f"  wrote {p} ({arr.nbytes/1e6:.0f} MB, "
                  f"{time.perf_counter()-t0:.1f}s)", flush=True)
        paths.append(p)
    return paths


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--gb", type=float, default=2.0,
                    help="approximate corpus size to generate/stream")
    ap.add_argument("--dir", type=str, default="/tmp/crowdmod_soak")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stride", type=int, default=4)
    args = ap.parse_args(argv)

    h, w, L = 12, 36, 16
    per_sample = 4 * h * w * L * 4                      # bytes
    n_per = 4608                                        # ~510 MB per file
    n_files = max(1, round(args.gb * 1e9 / (n_per * per_sample)))
    print(f"corpus: {n_files} files x {n_per*per_sample/1e6:.0f} MB "
          f"({n_files*n_per*per_sample/1e9:.1f} GB)")
    files = ensure_corpus(args.dir, n_files, n_per, h, w, L)

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.data.prefetch import FileWindowStream, device_prefetch
    from crowdmod_tpu.models.backbones import UNet3D
    from crowdmod_tpu.models.diffusion import ddpm_loss
    from crowdmod_tpu.train.optim import adam_with_plateau
    from crowdmod_tpu.train.state import TrainState, make_train_step

    b, p_len, f_len, c = args.batch, 5, 3, 3
    model = UNet3D(
        out_channels=c, base_channels=32, base_channels_multiples=(1, 2, 4),
        apply_attention=(False, False, True, False), dropout_rate=0.1,
        dtype=jnp.bfloat16 if jax.default_backend() == "tpu" else jnp.float32,
    )
    past0 = jnp.zeros((b, p_len, h, w, c))
    fut0 = jnp.zeros((b, f_len, h, w, c))
    params = model.init(jax.random.PRNGKey(0), fut0, jnp.zeros((b,)), past0)
    sched = linear_schedule(1000, scale=0.5)

    def loss_fn(prm, batch, key):
        pa, fu = batch
        return ddpm_loss(
            lambda x, t, cond: model.apply(prm, x, t, cond), sched, fu, pa,
            key,
        )

    state = TrainState.create(params, adam_with_plateau(1e-4))
    step = make_train_step(loss_fn, donate=True)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, loss = step(state, (past0, fut0), key)
    jax.block_until_ready(loss)
    print(f"compile: {time.perf_counter()-t0:.1f}s", flush=True)

    stream = FileWindowStream(
        files, past_len=p_len, future_len=f_len, stride=args.stride,
        mprops_count=3,
    )
    nb = 0
    t0 = time.perf_counter()
    for batch in device_prefetch(stream.batches(b, shuffle=True), depth=2):
        key, sub = jax.random.split(key)
        state, loss = step(state, batch, sub)
        nb += 1
        if nb % 200 == 0:
            print(f"  {nb} batches...", flush=True)
    jax.block_until_ready(loss)
    wall = time.perf_counter() - t0
    print(f"streamed epoch: {nb} batches ({nb*b:,} samples) in {wall:.1f}s "
          f"= {nb*b/wall:,.0f} samples/s; final loss {float(loss):.4f}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
