"""Double-buffered input pipeline for datasets larger than device memory.

The reference streams nothing: every pickle is loaded up front into one host
array (/root/reference/utils/dataset.py:72-106) and DataLoader workers feed
single-device copies per batch.  Here the resident case is already optimal —
:class:`~crowdmod_tpu.data.windows.WindowDataset` keeps the raw tensor in HBM
and gathers batches on device — so this module covers the *streaming* case:

  * :func:`device_prefetch` — classic double buffering: a background thread
    runs ``jax.device_put`` (optionally with a ``NamedSharding``) ``depth``
    batches ahead, so the host→HBM copy of batch k+1 overlaps the compute of
    batch k instead of serializing with it.
  * :class:`FileWindowStream` — epoch iterator over a *list of pickle
    files* that never holds more than two files in memory: while the
    windows of file k are training, a loader thread reads and lays out file
    k+1 (C++ threaded transpose when the native runtime is built).
  * :func:`host_shard` — deterministic round-robin file split for
    multi-host ingestion: each host reads only its own files (DCN carries
    nothing but the gradient all-reduce).
"""

from __future__ import annotations

import queue
import threading
from typing import Iterable, Iterator, Sequence

import numpy as np

import jax


_SENTINEL = object()


def device_prefetch(batches: Iterable, *, depth: int = 2,
                    sharding=None) -> Iterator:
    """Yield device-resident batches, transferring ``depth`` ahead.

    ``batches`` yields host-side pytrees (numpy arrays / tuples).  A daemon
    thread pushes them through ``jax.device_put`` into a bounded queue; the
    consumer always finds the next batch already in HBM.  With a
    ``sharding``, the put lands shards directly on every device of the mesh.

    Exceptions in the source iterator propagate to the consumer.
    """
    if depth < 1:
        raise ValueError("depth must be >= 1")
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = threading.Event()

    def _put(item) -> bool:
        # Bounded put so an abandoned consumer (break / exception / GC of
        # the generator) releases the worker instead of leaking it blocked
        # forever with depth+1 device batches pinned in HBM.
        while not stop.is_set():
            try:
                q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def worker():
        try:
            for batch in batches:
                if stop.is_set():
                    return
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                if not _put(batch):
                    return
        except BaseException as e:  # noqa: BLE001 - forwarded to consumer
            _put(e)
            return
        _put(_SENTINEL)

    threading.Thread(target=worker, daemon=True,
                     name="crowdmod-prefetch").start()
    try:
        while True:
            item = q.get()
            if item is _SENTINEL:
                return
            if isinstance(item, BaseException):
                raise item
            yield item
    finally:
        stop.set()
        while not q.empty():  # drop buffered batches so HBM frees promptly
            try:
                q.get_nowait()
            except queue.Empty:
                break


def host_shard(files: Sequence, process_index: int | None = None,
               process_count: int | None = None) -> list:
    """Round-robin slice of ``files`` owned by this host.

    Deterministic in file order, so every host agrees on the assignment
    without communication.  Defaults to the current jax process layout.
    """
    if process_index is None:
        process_index = jax.process_index()
    if process_count is None:
        process_count = jax.process_count()
    if not 0 <= process_index < process_count:
        raise ValueError(
            f"process_index {process_index} out of range [0, {process_count})"
        )
    return [f for i, f in enumerate(files) if i % process_count == process_index]


class FileWindowStream:
    """Stream (past, future) batches across pickle files, one file resident.

    For corpora too large for HBM (the full ATC year is ~41 files,
    SURVEY.md §2.1), the epoch loops over files; file k+1 loads on a
    background thread while file k trains.  Window/batch semantics within a
    file match :class:`WindowDataset`.

    Parameters mirror the reference loader: files are ``(N, C, H, W, L)``
    pickles (layout transposed on load), ``mprops_count`` slices channels.
    """

    def __init__(self, files: Sequence[str], *, past_len: int,
                 future_len: int, stride: int, mprops_count: int = 3,
                 sharding=None, velocity_norm: bool = False, stats=None):
        if not files:
            raise ValueError("FileWindowStream needs at least one file")
        self.files = list(files)
        self.past_len = past_len
        self.future_len = future_len
        self.stride = stride
        self.mprops_count = mprops_count
        self.sharding = sharding
        self.velocity_norm = velocity_norm
        self.stats = stats

    # ------------------------------------------------------------------
    def compute_stats(self) -> np.ndarray:
        """Exact global per-channel ``(mean, std, min, max)`` in one stream.

        Matches :func:`~crowdmod_tpu.data.ingest.channel_stats` over the
        concatenated corpus (the resident path's statistics) without ever
        holding more than one file: min/max combine exactly across files and
        mean/std come from streamed count/sum/sum-of-squares moments.
        """
        count = 0
        s = s2 = None
        lo = hi = None
        for path in self.files:
            arr = self._load_host(path).astype(np.float64)
            ax = tuple(range(arr.ndim - 1))
            if s is None:
                c = arr.shape[-1]
                s = np.zeros(c)
                s2 = np.zeros(c)
                lo = np.full(c, np.inf)
                hi = np.full(c, -np.inf)
            count += int(np.prod(arr.shape[:-1]))
            s += arr.sum(axis=ax)
            s2 += (arr * arr).sum(axis=ax)
            lo = np.minimum(lo, arr.min(axis=ax))
            hi = np.maximum(hi, arr.max(axis=ax))
        mean = s / count
        std = np.sqrt(np.maximum(s2 / count - mean * mean, 0.0))
        return np.stack([mean, std, lo, hi], axis=1)

    # ------------------------------------------------------------------
    def _load_host(self, path: str) -> np.ndarray:
        """Read one pickle → (N, L, H, W, C) native-layout host array."""
        from crowdmod_tpu.data.ingest import load_pickle_native

        return load_pickle_native(path, self.mprops_count)

    def _files_ahead(self) -> Iterator[np.ndarray]:
        """Yield host arrays with one-file read-ahead (double buffer).

        The loader reserves the queue slot BEFORE reading the next file:
        otherwise it would load file k+2 and then block on ``put`` while the
        consumer holds file k and the queue holds k+1 — three resident files,
        50% over the documented two-file budget.
        """
        q: queue.Queue = queue.Queue(maxsize=1)
        slot = threading.Semaphore(1)
        stop = threading.Event()

        def _acquire_slot() -> bool:
            while not stop.is_set():
                if slot.acquire(timeout=0.2):
                    return True
            return False

        def loader():
            try:
                for path in self.files:
                    # Slot reservation doubles as the abandonment check:
                    # when the consumer closes the generator, stop releases
                    # the loader instead of leaking it (pinning ~2 files).
                    if not _acquire_slot() or stop.is_set():
                        return
                    q.put(self._load_host(path))
            except BaseException as e:  # noqa: BLE001
                q.put(e)
                return
            if _acquire_slot():
                q.put(_SENTINEL)

        threading.Thread(target=loader, daemon=True,
                         name="crowdmod-file-loader").start()
        try:
            while True:
                item = q.get()
                slot.release()
                if item is _SENTINEL:
                    return
                if isinstance(item, BaseException):
                    raise item
                yield item
        finally:
            stop.set()
            while not q.empty():  # free the buffered file promptly
                try:
                    q.get_nowait()
                except queue.Empty:
                    break

    def batches(self, batch_size: int, *, shuffle: bool = True,
                seed: int = 0) -> Iterator:
        """One epoch: device-resident (past, future) batches over all files.

        Shuffling is within-file (global shuffles would defeat streaming);
        shard files across hosts with :func:`host_shard` for cross-file
        decorrelation at scale.
        """
        from crowdmod_tpu.data.windows import WindowDataset

        import jax.numpy as jnp

        if self.velocity_norm and self.stats is None:
            # One extra pass over the corpus; cache so later epochs reuse it.
            self.stats = self.compute_stats()

        for file_i, host_arr in enumerate(self._files_ahead()):
            if self.velocity_norm:
                from crowdmod_tpu.data.ingest import normalize_velocity

                host_arr = normalize_velocity(host_arr, self.stats)
            ds = WindowDataset(
                jnp.asarray(host_arr), past_len=self.past_len,
                future_len=self.future_len, stride=self.stride,
            )
            order = np.arange(len(ds))
            if shuffle:
                np.random.default_rng(seed + file_i).shuffle(order)
            n_full = len(order) // batch_size
            for b in range(n_full):
                past, future = ds.gather(
                    order[b * batch_size:(b + 1) * batch_size]
                )
                if self.sharding is not None:
                    past = jax.device_put(past, self.sharding)
                    future = jax.device_put(future, self.sharding)
                yield past, future
