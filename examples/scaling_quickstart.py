#!/usr/bin/env python
"""Scaling quickstart: DP + TP + FSDP + remat on a device mesh, no CLI.

Runs the same Trainer flow as examples/quickstart.py, but sharded:

  * batch over the "data" mesh axis (data parallelism),
  * large DiT kernels over the "model" axis (tensor parallelism),
  * parameters / Adam moments / EMA over "data" (FSDP, ZeRO-3),
  * per-block jax.checkpoint (TPU.REMAT) for activation memory.

There is no hand-written collective anywhere — the shardings are
annotations and XLA inserts the all-gathers / reduce-scatters over ICI.

    python examples/scaling_quickstart.py     # runs anywhere

On a real pod the mesh spans the actual chips (ICI-aware layout via
mesh_utils); on a laptop/CI this script splits the CPU into 8 virtual
devices so the identical sharded program compiles and executes.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def ensure_devices(n: int = 8) -> None:
    """Bootstrap an n-device virtual CPU backend when fewer are visible.

    Set CROWDMOD_EXAMPLE_REAL_DEVICES=1 to skip the bootstrap and run on
    the real backend (a pod with >= n chips).  The default forces CPU
    *before* probing devices — probing first would initialize (and on a
    broken tunnel, hang on) whatever platform the environment pins.
    """
    if os.environ.get("CROWDMOD_EXAMPLE_REAL_DEVICES"):
        return
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
    assert len(jax.devices()) >= n


def main():
    ensure_devices(8)
    import jax
    import jax.numpy as jnp
    import numpy as np

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.data.synthetic import synthetic_walkers
    from crowdmod_tpu.data.windows import WindowDataset
    from crowdmod_tpu.parallel import make_mesh
    from crowdmod_tpu.train.trainer import Trainer

    # 1. Mesh: 4-way data parallel × 2-way tensor parallel.
    mesh = make_mesh(data=4, model=2)
    print(f"mesh: {dict(mesh.shape)} on {jax.default_backend()}")

    # 2. Config: the DiT flagship at a small size, remat on.
    cfg = load_config("4test/ATC.yml").updated({
        "DATA_FS": {"SAVE_DIR": "/tmp/sq_ckpts", "OUTPUT_DIR": "/tmp/sq_out"},
        "DATASET": {"BATCH_SIZE": 16},
        "MACROPROPS": {"ROWS": 8, "COLS": 12},
        "TPU": {"REMAT": True},
        "MODEL": {"DDPM": {"TIMESTEPS": 50,
                           "DIT": {"HIDDEN_SIZE": 64, "DEPTH": 2,
                                   "NUM_HEADS": 4, "PATCH_SIZE": 4,
                                   "T_PATCH_SIZE": 4,
                                   "TRAIN": {"EPOCHS": 4}}}},
    })

    # 3. Data: windows over synthetic walkers.
    walkers = synthetic_walkers(64, cfg.MACROPROPS.ROWS, cfg.MACROPROPS.COLS, 16)
    ds = WindowDataset(jnp.asarray(walkers), past_len=5, future_len=3, stride=4)

    # 4. Train sharded: param_sharding="fsdp" shards params + Adam moments +
    #    EMA over "data" and large kernels over "model"; the batch is sharded
    #    by the Trainer.  Same API as single-device — only the two kwargs.
    trainer = Trainer(cfg, "DDPM-DiT", mesh=mesh, param_sharding="fsdp",
                      run_dir="/tmp/sq_run")
    history = trainer.fit(ds, epochs=4)
    print("train losses:", [round(x, 4) for x in history["train_loss"]])

    # Show where the parameters actually live.
    leaves = jax.tree.leaves(trainer.state.params)
    sharded = [x for x in leaves if "data" in x.sharding.spec
               or "model" in x.sharding.spec]
    print(f"{len(sharded)}/{len(leaves)} param tensors sharded across the mesh")

    # 5. Sample batch-parallel: past is sharded over "data", the whole
    #    reverse chain runs as one jitted sharded program.
    past, _ = ds.gather(np.arange(16))
    samples = trainer.sample(past, jax.random.PRNGKey(0))
    print("samples:", samples.shape, "sharding:", samples.sharding.spec)
    assert np.isfinite(np.asarray(samples)).all()
    print("scaling quickstart OK")


if __name__ == "__main__":
    main()
