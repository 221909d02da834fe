#!/usr/bin/env python
"""Pod-ready DP scaling benchmark: sampler + training throughput vs mesh size.

What a real v5e pod runs to produce scaling curves (the blueprint-§5.8
obligation — the reference has no distributed code to compare against,
SURVEY.md §2.9):

  * **Sampler scaling** — the flagship DDPM-DiT reverse chain, batch
    ``--batch-per-chip`` PER CHIP (weak scaling), jitted once per mesh size
    with DP batch sharding.  Reports denoise steps/s across the mesh.
  * **Training scaling** — whole-epoch ``lax.scan`` of the DDPM train step
    (donated state, FSDP-sharded params) over DP-sharded batches.  Reports
    samples/s across the mesh.

Without enough real devices it degrades to the virtual CPU mesh
(``--virtual N``, the tests/conftest.py trick): throughput numbers there are
meaningless, so it instead ASSERTS the parallelism is real — per-device
sharding of inputs/outputs, finite results, and the expected collectives
(all-reduce / all-gather / reduce-scatter) present in the compiled HLO.

Examples::

  python tools/bench_multichip.py                 # real devices
  python tools/bench_multichip.py --virtual 8     # correctness on CPU mesh
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])


def _force_virtual(n: int) -> None:
    """Force an n-device CPU backend, discarding any pre-initialized one
    (the bench image's sitecustomize imports jax against the TPU tunnel
    before this file runs — same bootstrap as __graft_entry__)."""
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    import jax
    from jax._src import xla_bridge as _xb

    if _xb.backends_are_initialized():
        from jax.extend.backend import clear_backends

        clear_backends()
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", n)
    assert len(jax.devices()) >= n and jax.default_backend() == "cpu"


def _mesh_sizes(n: int) -> list[int]:
    sizes, s = [], 1
    while s <= n:
        sizes.append(s)
        s *= 2
    if sizes[-1] != n:
        sizes.append(n)
    return sizes


def _collective_counts(compiled) -> dict:
    txt = compiled.as_text()
    return {
        "all-reduce": txt.count("all-reduce"),
        "all-gather": txt.count("all-gather"),
        "reduce-scatter": txt.count("reduce-scatter"),
    }


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--virtual", type=int, default=0,
                    help="Force an N-device virtual CPU mesh (correctness "
                         "mode; throughput is not meaningful on CPU).")
    ap.add_argument("--batch-per-chip", type=int, default=64)
    ap.add_argument("--timesteps", type=int, default=None,
                    help="Sampler chain length (default: 1000 on TPU, "
                         "4 on the virtual mesh).")
    ap.add_argument("--epoch-batches", type=int, default=None,
                    help="Batches per epoch-scan (default: 16 TPU, 2 CPU).")
    args = ap.parse_args()

    if args.virtual:
        _force_virtual(args.virtual)

    import jax
    import jax.numpy as jnp

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.backbones.dit import DiT4DFactorized
    from crowdmod_tpu.models.diffusion import ddpm_loss, ddpm_sample
    from crowdmod_tpu.parallel.mesh import (
        batch_sharding,
        make_mesh,
        shard_batch,
    )
    from crowdmod_tpu.parallel.sharding import shard_params
    from crowdmod_tpu.train.optim import adam_with_plateau
    from crowdmod_tpu.train.state import TrainState, make_epoch_step

    on_tpu = jax.default_backend() == "tpu"
    virtual = not on_tpu
    timesteps = args.timesteps or (1000 if on_tpu else 4)
    n_epoch_batches = args.epoch_batches or (16 if on_tpu else 2)
    devices = jax.devices()
    print(f"backend={jax.default_backend()}  devices={len(devices)}  "
          f"batch/chip={args.batch_per_chip}  T={timesteps}", flush=True)

    h, w, p, f, c = 12, 36, 5, 3, 3
    hidden, depth = (256, 6) if on_tpu else (64, 2)
    dtype = jnp.bfloat16 if on_tpu else jnp.float32
    model = DiT4DFactorized(
        out_channels=c, grid_rows=h, grid_cols=w,
        patch_size=4, hidden_size=hidden, depth=depth, num_heads=4,
        mlp_ratio=4.0, dropout_rate=0.1, time_multiple=4,
        past_len=p, future_len=f, t_patch_size=4, dtype=dtype,
    )
    sched = linear_schedule(timesteps, scale=0.5)

    def readback(x):
        return float(jnp.ravel(x)[0])

    # Dispatch round trip (matters on tunneled backends).
    from crowdmod_tpu.utils.profiling import measure_round_trip

    rt = measure_round_trip()

    rows = []
    for n in _mesh_sizes(len(devices)):
        mesh = make_mesh(data=n, model=1, devices=devices[:n])
        b = args.batch_per_chip * n
        past = jnp.zeros((b, p, h, w, c), jnp.float32)
        future = jnp.zeros((b, f, h, w, c), jnp.float32)
        params = model.init(
            jax.random.PRNGKey(0), future, jnp.zeros((b,)), past
        )
        params = shard_params(
            params, mesh, min_size=1024 if virtual else 2**16, mode="fsdp"
        )
        batch = shard_batch((past, future), mesh)
        past_b = batch[0]

        # ---- sampler ----------------------------------------------------
        def denoise(prm, x, t, cond):
            return model.apply(prm, x, t, cond)

        sample = jax.jit(
            lambda prm, pb, key: ddpm_sample(
                lambda x, t, cond: denoise(prm, x, t, cond),
                sched, pb, key, (b, f, h, w, c),
            ),
            out_shardings=batch_sharding(mesh),
        )
        lowered = sample.lower(params, past_b, jax.random.PRNGKey(1))
        compiled = lowered.compile()
        out = compiled(params, past_b, jax.random.PRNGKey(1))
        readback(out)
        if virtual:
            assert len(out.sharding.device_set) == n, "output not DP-sharded"
            assert bool(jnp.isfinite(out).all())
            coll = _collective_counts(compiled)
            # Timed before the epoch step donates the params away.
            t0 = time.perf_counter()
            readback(compiled(params, past_b, jax.random.PRNGKey(5)))
            sampler_wall = time.perf_counter() - t0
        else:
            reps = []
            for i in range(3):
                t0 = time.perf_counter()
                out = compiled(params, past_b, jax.random.PRNGKey(2 + i))
                readback(out)
                reps.append(time.perf_counter() - t0 - rt)
            steps_s = b * timesteps / min(reps)
            coll = _collective_counts(compiled)

        # ---- training epoch-scan -----------------------------------------
        def loss_fn(prm, bt, key):
            pb, fb = bt
            return ddpm_loss(
                lambda x, t, cond: model.apply(prm, x, t, cond),
                sched, fb, pb, key,
            )

        state = TrainState.create(params, adam_with_plateau(1e-4))
        epoch_step = make_epoch_step(loss_fn, donate=True)
        # Leading dim = batches axis; DP-shard the SECOND (batch) dim.
        from jax.sharding import NamedSharding, PartitionSpec as P

        batches = jax.device_put(
            jax.tree.map(
                lambda a: jnp.broadcast_to(
                    a[None], (n_epoch_batches,) + a.shape
                ), batch,
            ),
            NamedSharding(mesh, P(None, "data")),
        )
        state, losses = epoch_step(state, batches, jax.random.PRNGKey(3))
        readback(losses)
        if virtual:
            assert bool(jnp.isfinite(losses).all()), "epoch losses non-finite"
            # Raw wall seconds for context only — CPU-mesh timing is NOT a
            # speed claim (virtual devices share one host's cores).
            t0 = time.perf_counter()
            state, losses = epoch_step(state, batches, jax.random.PRNGKey(4))
            readback(losses)
            epoch_wall = time.perf_counter() - t0
            rows.append({"mesh": n, "ok": True, "collectives": coll,
                         "sampler_wall_s_virtual": round(sampler_wall, 3),
                         "epoch_wall_s_virtual": round(epoch_wall, 3)})
            print(f"mesh={n}: sampler+epoch execute, DP-sharded, "
                  f"collectives={coll}  (virtual walls: sampler "
                  f"{sampler_wall:.2f}s epoch {epoch_wall:.2f}s — not a "
                  f"speed claim)", flush=True)
        else:
            t0 = time.perf_counter()
            state, losses = epoch_step(state, batches, jax.random.PRNGKey(4))
            readback(losses)
            dt = time.perf_counter() - t0 - rt
            train_sps = n_epoch_batches * b / dt
            rows.append({
                "mesh": n, "sampler_steps_per_sec": round(steps_s, 1),
                "train_samples_per_sec": round(train_sps, 1),
                "collectives": coll,
            })
            print(f"mesh={n}: sampler {steps_s:,.0f} steps/s  "
                  f"train {train_sps:,.0f} samples/s  "
                  f"collectives={coll}", flush=True)

    print(json.dumps({"backend": jax.default_backend(),
                      "batch_per_chip": args.batch_per_chip,
                      "timesteps": timesteps, "rows": rows}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
