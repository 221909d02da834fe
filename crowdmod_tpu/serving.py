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
import threading
import time
from collections import deque
from concurrent.futures import Future, TimeoutError as FuturesTimeoutError
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
        # 256 on top: the chip saturates near batch 256 (+30% steps/s over
        # 64, measured batch-scaling table in PERF.md), and the coalescing
        # queue fills the top bucket under sustained load — the extra warmup
        # compile buys free steady-state throughput.
        batch_buckets: tuple[int, ...] = (1, 8, 64, 256),
        seed: int = 0,
    ):
        from crowdmod_tpu.train.trainer import Trainer

        self.cfg = cfg
        self.arch = arch
        self.mesh = mesh
        if mesh is not None:
            # Batches are sharded over the "data" axis, so every compiled
            # bucket must be divisible by it — round buckets up (a bucket of
            # 1 on an 8-chip mesh becomes 8; the padding rows are dropped
            # from the output like any other bucket padding).
            n_data = mesh.shape["data"]
            batch_buckets = {-(-b // n_data) * n_data for b in batch_buckets}
        self.batch_buckets = tuple(sorted(batch_buckets))
        self._trainer = Trainer(cfg, arch, mesh=mesh, seed=seed)
        self._trainer.load(checkpoint_path)
        # One jitted callable; jit's own cache keys on the (padded) batch
        # shape, so each bucket compiles exactly once.
        trainer = self._trainer
        self._sampler = jax.jit(lambda past, key: trainer.sample(past, key))
        self._key = jax.random.PRNGKey(seed)
        self.stats = PredictorStats()
        self._lock = threading.Lock()
        p, f, h, w = self._trainer._grid_shapes()
        self._shape = (p, f, h, w, self._trainer.mprops_count)

    @property
    def input_spec(self) -> tuple[int, int, int, int, int]:
        """Per-request input geometry ``(past_len, future_len, H, W, C)`` —
        a request's ``past`` is ``(N, past_len, H, W, C)``."""
        return self._shape

    # ------------------------------------------------------------------
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
            out = self._sampler(past, self._key)
            jax.block_until_ready(out)
            logging.info("warmed bucket %d", b)
        return self

    def predict(self, past, key=None):
        """``(N, P, H, W, C)`` past → ``(N, F, H, W, C)`` future.

        N is padded to the nearest bucket; padding rows are dropped from the
        output.  Thread-safe: concurrent callers are serialized (the device
        serializes dispatches anyway; the lock protects the PRNG key chain
        and the stats counters).
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
        with self._lock:
            if key is None:
                self._key, key = jax.random.split(self._key)
            t0 = time.perf_counter()
            out = self._sampler(x, key)
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
    if not os.path.isdir(path):
        raise FileNotFoundError(
            f"no checkpoint for {arch} at {path!r} — train it first "
            f"(crowdmod train --arch {arch}) or pass a different epoch_tag"
        )
    mesh = None
    if data_parallel:
        from crowdmod_tpu.parallel.mesh import make_mesh

        mesh = make_mesh(data=jax.device_count())
    return Predictor(cfg, arch, path, mesh=mesh, **kwargs)


# ---------------------------------------------------------------------------
# Request coalescing
# ---------------------------------------------------------------------------

class _Request:
    __slots__ = ("past", "key", "future", "n")

    def __init__(self, past: np.ndarray, key):
        self.past = past
        self.key = key
        self.future: Future = Future()
        self.n = past.shape[0]


class BatchingQueue:
    """Micro-batching front end for a :class:`Predictor`.

    Concurrent callers ``submit()`` requests; a single dispatcher thread
    coalesces keyless requests that arrive within ``max_delay_ms`` of each
    other into one device dispatch (up to the predictor's largest batch
    bucket), then scatters the rows back to each caller's future.  Requests
    that carry an explicit PRNG ``key`` are dispatched alone so their output
    stays deterministic regardless of what else is in flight.

    This turns N concurrent batch-1 HTTP requests into one batch-N TPU
    dispatch — measured 16× over sequential batch-1 predicts with 32
    concurrent clients on v5e (PERF.md).
    """

    def __init__(self, predictor: Predictor, *, max_delay_ms: float = 5.0,
                 max_queue: int = 4096):
        self.predictor = predictor
        self.max_delay_s = max_delay_ms / 1e3
        self.max_queue = max_queue
        self.dispatches = 0
        self.coalesced_requests = 0
        self._pending: deque[_Request] = deque()
        self._cv = threading.Condition()
        self._closed = False
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="crowdmod-batcher", daemon=True
        )
        self._thread.start()

    # ------------------------------------------------------------------
    def submit(self, past, key=None) -> Future:
        """Enqueue one request; resolves to the ``(N, F, H, W, C)`` future
        frames.  Raises if the queue is closed or full."""
        past = np.asarray(past, np.float32)
        if past.ndim != 5:
            raise ValueError(f"expected (N, P, H, W, C) past, got {past.shape}")
        # Oversized requests fail fast with the predictor's bucket error.
        self.predictor._bucket(past.shape[0])
        req = _Request(past, key)
        with self._cv:
            if self._closed:
                raise RuntimeError("BatchingQueue is closed")
            if len(self._pending) >= self.max_queue:
                raise RuntimeError("BatchingQueue is full")
            self._pending.append(req)
            self._cv.notify()
        return req.future

    def predict(self, past, key=None, timeout: float | None = None):
        """Blocking convenience wrapper around :meth:`submit`.

        A request that exceeds ``timeout`` is cancelled and removed from the
        queue, so a shed (504'd) client actually frees its queue slot instead
        of still being dispatched to the TPU later.
        """
        fut = self.submit(past, key)
        try:
            return fut.result(timeout)
        except (TimeoutError, FuturesTimeoutError):
            # Both names: concurrent.futures.TimeoutError only became an
            # alias of the builtin in Python 3.11; on 3.10 they're distinct
            # and Future.result raises the futures one.
            self.cancel(fut)
            raise

    def cancel(self, future: Future) -> bool:
        """Best-effort cancel: drop the request if it hasn't dispatched yet."""
        with self._cv:
            for i, req in enumerate(self._pending):
                if req.future is future:
                    del self._pending[i]
                    break
        return future.cancel()

    @property
    def depth(self) -> int:
        with self._cv:
            return len(self._pending)

    def close(self, timeout: float = 10.0):
        with self._cv:
            self._closed = True
            self._cv.notify_all()
        self._thread.join(timeout)
        # Fail anything still queued.
        with self._cv:
            while self._pending:
                req = self._pending.popleft()
                req.future.set_exception(RuntimeError("queue closed"))

    # ------------------------------------------------------------------
    def _take_batch(self) -> list[_Request]:
        """Block for the next request, then coalesce keyless followers."""
        with self._cv:
            while not self._pending and not self._closed:
                self._cv.wait()
            if not self._pending:
                return []
            head = self._pending.popleft()
        if head.key is not None:
            return [head]
        cap = self.predictor.batch_buckets[-1]
        batch, rows = [head], head.n
        deadline = time.perf_counter() + self.max_delay_s
        with self._cv:
            while rows < cap:
                if not self._pending:
                    remaining = deadline - time.perf_counter()
                    if remaining <= 0 or self._closed:
                        break
                    self._cv.wait(remaining)
                    continue
                nxt = self._pending[0]
                # Keyed requests dispatch solo; stop coalescing at one, and
                # don't split a request across two dispatches.
                if nxt.key is not None or rows + nxt.n > cap:
                    break
                self._pending.popleft()
                batch.append(nxt)
                rows += nxt.n
        return batch

    def _dispatch_loop(self):
        while True:
            batch = self._take_batch()
            if not batch:
                return  # closed and drained
            # Claim each future; ones cancelled by a timed-out caller drop
            # out here and never reach the device.
            batch = [r for r in batch if r.future.set_running_or_notify_cancel()]
            if not batch:
                continue
            try:
                if len(batch) == 1:
                    out = self.predictor.predict(batch[0].past, batch[0].key)
                    batch[0].future.set_result(out)
                else:
                    past = np.concatenate([r.past for r in batch])
                    out = self.predictor.predict(past)
                    off = 0
                    for r in batch:
                        r.future.set_result(out[off:off + r.n])
                        off += r.n
                    self.coalesced_requests += len(batch)
                self.dispatches += 1
            except Exception as e:  # pragma: no cover - surfaced via futures
                for r in batch:
                    if not r.future.done():
                        r.future.set_exception(e)
