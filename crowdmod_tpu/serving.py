"""Inference serving: checkpoint → warmed, fixed-shape, jitted predictor.

The reference has no serving layer (SURVEY.md §1 — control flow ends at CLI
scripts); this is the production path the TPU rebuild adds.  Design points:

  * **Compile once, serve forever** — the sampler is jitted per (batch,
    geometry) bucket at ``warmup()`` time; serving never retraces.
  * **Static shape buckets** — requests are padded up to the nearest
    registered batch size so XLA sees a fixed shape set.
  * **Mesh-parallel sampling** — pass a ``Mesh`` and the batch dim is
    sharded over the "data" axis; reverse diffusion is embarrassingly
    parallel in the batch.
  * **Explicit PRNG** — every request carries/derives a key; no global
    sampler state.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass

import numpy as np

import jax
import jax.numpy as jnp

from crowdmod_tpu.config import FrozenConfig


@dataclass
class PredictorStats:
    requests: int = 0
    samples: int = 0
    total_latency_s: float = 0.0

    def record(self, n: int, dt: float):
        self.requests += 1
        self.samples += n
        self.total_latency_s += dt


class Predictor:
    """Serves ``predict(past) -> future`` for a trained model.

    Wraps a :class:`~crowdmod_tpu.train.trainer.Trainer` in inference-only
    mode: loads the checkpoint, binds params into a jitted sampler per batch
    bucket, and pads/shards incoming requests.
    """

    def __init__(
        self,
        cfg: FrozenConfig,
        arch: str,
        checkpoint_path: str,
        *,
        mesh=None,
        batch_buckets: tuple[int, ...] = (1, 8, 64),
        seed: int = 0,
    ):
        from crowdmod_tpu.train.trainer import Trainer

        self.cfg = cfg
        self.arch = arch
        self.mesh = mesh
        self.batch_buckets = tuple(sorted(batch_buckets))
        self._trainer = Trainer(cfg, arch, mesh=mesh, seed=seed)
        self._trainer.load(checkpoint_path)
        self._compiled: dict[int, object] = {}
        self._key = jax.random.PRNGKey(seed)
        self.stats = PredictorStats()
        p, f, h, w = self._trainer._grid_shapes()
        self._shape = (p, f, h, w, self._trainer.mprops_count)

    # ------------------------------------------------------------------
    def _sampler_for(self, batch: int):
        if batch not in self._compiled:
            trainer = self._trainer

            def run(past, key):
                return trainer.sample(past, key)

            self._compiled[batch] = jax.jit(run)
        return self._compiled[batch]

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"request batch {n} exceeds largest bucket "
            f"{self.batch_buckets[-1]}"
        )

    # ------------------------------------------------------------------
    def warmup(self):
        """Compile every bucket ahead of traffic."""
        p, f, h, w, c = self._shape
        for b in self.batch_buckets:
            past = jnp.zeros((b, p, h, w, c), jnp.float32)
            if self.mesh is not None:
                from crowdmod_tpu.parallel.mesh import shard_batch

                past = shard_batch(past, self.mesh)
            out = self._sampler_for(b)(past, self._key)
            jax.block_until_ready(out)
            logging.info("warmed bucket %d", b)
        return self

    def predict(self, past, key=None):
        """``(N, P, H, W, C)`` past → ``(N, F, H, W, C)`` future.

        N is padded to the nearest bucket; padding rows are dropped from the
        output.
        """
        past = np.asarray(past, np.float32)
        n = past.shape[0]
        bucket = self._bucket(n)
        if bucket != n:
            pad = np.zeros((bucket - n,) + past.shape[1:], np.float32)
            past = np.concatenate([past, pad])
        x = jnp.asarray(past)
        if self.mesh is not None:
            from crowdmod_tpu.parallel.mesh import shard_batch

            x = shard_batch(x, self.mesh)
        if key is None:
            self._key, key = jax.random.split(self._key)
        t0 = time.perf_counter()
        out = self._sampler_for(bucket)(x, key)
        out = np.asarray(jax.block_until_ready(out))[:n]
        self.stats.record(n, time.perf_counter() - t0)
        return out

    # ------------------------------------------------------------------
    @property
    def mean_latency_ms(self) -> float:
        s = self.stats
        return 1e3 * s.total_latency_s / s.requests if s.requests else 0.0


def load_predictor(
    config_yml: str,
    arch: str,
    *,
    datafiles_yml: str | None = None,
    epoch_tag: str | int = "000",
    data_parallel: bool = False,
    **kwargs,
) -> Predictor:
    """Convenience constructor from config paths + checkpoint tag."""
    import os

    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.train import checkpoint as ckpt

    cfg = load_config(config_yml, datafiles_yml)
    path = os.path.join(
        cfg.DATA_FS.SAVE_DIR, ckpt.checkpoint_name(cfg, arch, epoch_tag)
    )
    mesh = None
    if data_parallel:
        from crowdmod_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=jax.device_count())
    return Predictor(cfg, arch, path, mesh=mesh, **kwargs)
