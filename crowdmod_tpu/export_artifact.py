"""Serialized sampler artifacts via ``jax.export`` (StableHLO).

Production deployment capability beyond the reference (whose only shippable
artifact is a torch checkpoint that needs the full Python model code to
run).  Here a trained sampler — the entire reverse chain, weights baked in —
serializes to one versioned StableHLO program that any later process can
deserialize and call without the model class, the config, or even this
package's model code: the artifact carries its own compiled math.

Notes:
  * The PRNG enters as a plain ``uint32`` seed (folded into a key inside the
    traced function) so the artifact's calling convention is plain arrays.
  * ``platforms`` allows cross-lowering: a CPU host can emit a TPU artifact
    (e.g. ``platforms=("tpu",)``) for a serving fleet; by default the
    artifact targets the exporting process's backend.
  * jax guarantees serialized-artifact compatibility across jax releases
    (export calling-convention versioning), making this the stable serving
    hand-off format.
"""

from __future__ import annotations

import json
import os
from typing import Callable, Sequence

import jax
import jax.numpy as jnp
import numpy as np


def sampler_fn(trainer) -> Callable:
    """The trainer's configured sampler as ``(past, seed:uint32) -> future``
    with the sampling weights (EMA when enabled) baked in as constants."""
    params = trainer._sample_params()

    def sample(past, seed):
        key = jax.random.PRNGKey(seed)
        return trainer._sample_impl(past, key, params=params)

    return sample


def export_sampler(
    trainer,
    path: str | os.PathLike,
    *,
    batch_size: int,
    platforms: Sequence[str] | None = None,
) -> dict:
    """Export the trainer's sampler to ``path`` (+ ``.json`` sidecar).

    Returns the sidecar metadata dict.  The artifact is shape-specialized to
    ``batch_size`` (serving buckets export one artifact per bucket — static
    shapes are the TPU deal).
    """
    from jax import export as jexport

    p, f, h, w = trainer._grid_shapes()
    c = trainer.mprops_count
    past_spec = jax.ShapeDtypeStruct((batch_size, p, h, w, c), jnp.float32)
    seed_spec = jax.ShapeDtypeStruct((), jnp.uint32)

    fn = jax.jit(sampler_fn(trainer))
    exported = jexport.export(
        fn, platforms=tuple(platforms) if platforms else None
    )(past_spec, seed_spec)
    blob = exported.serialize()

    path = os.fspath(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as fh:
        fh.write(blob)

    meta = {
        "format": "jax.export/stablehlo",
        "arch": trainer.arch,
        "platforms": list(exported.platforms),
        "batch_size": batch_size,
        "past_shape": [batch_size, p, h, w, c],
        "future_shape": [batch_size, f, h, w, c],
        "calling_convention_version": exported.calling_convention_version,
        "jax_version": jax.__version__,
        "bytes": len(blob),
    }
    with open(path + ".json", "w") as fh:
        json.dump(meta, fh, indent=2)
    return meta


def load_sampler(path: str | os.PathLike) -> tuple[Callable, dict]:
    """Deserialize an exported sampler: ``(callable(past, seed), metadata)``.

    The callable jit-compiles the embedded StableHLO on first use for the
    current backend (which must be one of the artifact's ``platforms``).
    """
    from jax import export as jexport

    path = os.fspath(path)
    with open(path, "rb") as fh:
        exported = jexport.deserialize(fh.read())
    meta = {}
    sidecar = path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as fh:
            meta = json.load(fh)

    call = jax.jit(exported.call)

    def sample(past, seed):
        past = jnp.asarray(past, jnp.float32)
        seed = jnp.asarray(seed, jnp.uint32)
        return call(past, seed)

    return sample, meta


class ArtifactPredictor:
    """Drop-in serving predictor backed by exported artifacts — one per
    batch bucket — so a serving host needs NO model classes, config, or
    checkpoint (mirrors :class:`crowdmod_tpu.serving.Predictor`'s surface:
    ``warmup``/``predict``/``batch_buckets``/``stats``; works behind
    ``ServingApp`` and the micro-batching queue unchanged)."""

    def __init__(self, paths: Sequence[str | os.PathLike]):
        import threading

        from crowdmod_tpu.serving import PredictorStats

        if not paths:
            raise ValueError("ArtifactPredictor needs at least one artifact")
        self._fns: dict[int, Callable] = {}
        meta = None
        for p in paths:
            fn, m = load_sampler(p)
            if not m:
                raise ValueError(f"{p}: missing .json metadata sidecar")
            b = int(m["batch_size"])
            self._fns[b] = fn
            if meta is None:
                meta = m
            elif m["past_shape"][1:] != meta["past_shape"][1:]:
                raise ValueError(
                    f"{p}: geometry {m['past_shape'][1:]} differs from "
                    f"{meta['past_shape'][1:]}"
                )
        self.batch_buckets = tuple(sorted(self._fns))
        _, p_len, h, w, c = meta["past_shape"]
        f_len = meta["future_shape"][1]
        self._shape = (p_len, f_len, h, w, c)
        self.arch = meta.get("arch", "?")
        self.meta = meta
        self.stats = PredictorStats()
        self._lock = threading.Lock()
        self._counter = 0

    def _bucket(self, n: int) -> int:
        for b in self.batch_buckets:
            if n <= b:
                return b
        raise ValueError(
            f"request batch {n} exceeds largest bucket "
            f"{self.batch_buckets[-1]}"
        )

    def warmup(self):
        p, f, h, w, c = self._shape
        for b, fn in sorted(self._fns.items()):
            jax.block_until_ready(
                fn(np.zeros((b, p, h, w, c), np.float32), np.uint32(0))
            )
        return self

    @staticmethod
    def _seed_from_key(key) -> np.uint32:
        # Artifacts take a plain uint32 seed; derive one deterministically
        # from a jax PRNG key when the caller supplies one.
        data = np.asarray(jax.random.key_data(key)).ravel()
        return np.uint32(data[-1])

    def predict(self, past, key=None):
        import time

        past = np.asarray(past, np.float32)
        n = past.shape[0]
        bucket = self._bucket(n)
        if bucket != n:
            pad = np.zeros((bucket - n,) + past.shape[1:], np.float32)
            past = np.concatenate([past, pad])
        with self._lock:
            if key is None:
                self._counter += 1
                seed = np.uint32(self._counter)
            else:
                seed = self._seed_from_key(key)
            t0 = time.perf_counter()
            out = self._fns[bucket](past, seed)
            out = np.asarray(jax.block_until_ready(out))[:n]
            self.stats.record(n, time.perf_counter() - t0)
        return out

    @property
    def mean_latency_ms(self) -> float:
        s = self.stats
        return 1e3 * s.total_latency_s / s.requests if s.requests else 0.0


def run(argv=None) -> int:
    """CLI: ``crowdmod export`` — checkpoint → serialized sampler artifact."""
    import argparse
    import logging

    from crowdmod_tpu.cli import common_parser, setup_logging
    from crowdmod_tpu.config import load_config
    from crowdmod_tpu.config.validate import require_valid
    from crowdmod_tpu.train import checkpoint as ckpt
    from crowdmod_tpu.train.trainer import Trainer

    p = common_parser("Export a trained sampler as a StableHLO artifact.")
    p.add_argument("--model-to-load", type=str, default="000",
                   help="Checkpoint epoch tag; 000 = best-loss model.")
    p.add_argument("--batch", type=int, action="append", default=None,
                   help="Batch size to specialize to; repeat for one "
                        "artifact per serving bucket (default "
                        "DATASET.BATCH_SIZE).")
    p.add_argument("--platform", action="append", default=None,
                   help="Target platform(s), e.g. --platform tpu "
                        "(repeatable; default: current backend).")
    p.add_argument("--output", type=str, required=True,
                   help="Artifact path; a .json metadata sidecar is "
                        "written next to it.")
    args = p.parse_args(argv)
    from crowdmod_tpu.utils.compile_cache import enable_default_cache

    enable_default_cache()

    cfg = load_config(args.config_yml_file, args.configList_yml_file)
    require_valid(cfg, args.arch)
    setup_logging(os.path.join(cfg.DATA_FS.OUTPUT_DIR, "logs", "export.log"))

    trainer = Trainer(cfg, args.arch, seed=args.seed)
    path = os.path.join(
        cfg.DATA_FS.SAVE_DIR,
        ckpt.checkpoint_name(cfg, args.arch, args.model_to_load),
    )
    trainer.load(path)
    logging.info("checkpoint restored from %s", path)

    batches = args.batch or [cfg.DATASET.BATCH_SIZE]
    for b in batches:
        if len(batches) == 1:
            out = args.output
        else:
            root, ext = os.path.splitext(args.output)
            out = f"{root}.b{b}{ext}"
        meta = export_sampler(
            trainer, out, batch_size=b, platforms=args.platform,
        )
        logging.info("exported %s: %s", out, json.dumps(meta))
        print(out)
    return 0
