"""Sliding-window dataset over macroproperty sequences.

Rebuild of ``MacropropsDataset`` (/root/reference/utils/dataset.py:22-53): a
``(N, T_raw, H, W, C)`` native-layout array is viewed as all windows of length
``past_len + future_len`` starting every ``stride`` frames.  Instead of a
Python ``__getitem__`` per example feeding worker processes, windows are
materialized as a device-side gather: the raw array lives in HBM once, and a
batch is ``raw[seq_idx, t_idx + arange(window)]`` — one fused gather per
batch, no host↔device traffic in the epoch loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Iterator

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("past_len", "future_len"))
def _gather_windows(raw, seq_idx, t_idx, *, past_len: int, future_len: int):
    """One fused device gather for a batch of windows.

    Jitted so an epoch's batch loop issues ONE dispatch per batch instead of
    several eager ops (matters most when dispatch latency is high, e.g.
    remote-device tunnels)."""
    offs = jnp.arange(past_len + future_len)
    frames = t_idx[:, None] + offs[None, :]  # (B, window)
    win = raw[seq_idx[:, None], frames]      # (B, window, H, W, C)
    return win[:, :past_len], win[:, past_len:]


@partial(
    jax.jit,
    static_argnames=(
        "past_len", "future_len", "n_batches", "batch_size", "sharding"
    ),
)
def _gather_epoch(
    raw, seq_idx, t_idx, *, past_len: int, future_len: int,
    n_batches: int, batch_size: int, sharding=None,
):
    """Gather + stack a whole epoch, optionally straight into a mesh layout.

    With ``sharding`` (a hashable ``NamedSharding``, e.g. ``P(None, "data")``)
    the constraint makes GSPMD produce each device's epoch shard locally —
    the stacked ``(n_batches, B, ...)`` tensor is never materialized on a
    single chip and never pays a post-hoc reshard pass (the windows overlap,
    so the epoch tensor is ~window/stride times the raw data's size)."""
    past, future = _gather_windows(
        raw, seq_idx, t_idx, past_len=past_len, future_len=future_len
    )
    stack = lambda a: a.reshape((n_batches, batch_size) + a.shape[1:])
    past, future = stack(past), stack(future)
    if sharding is not None:
        past = jax.lax.with_sharding_constraint(past, sharding)
        future = jax.lax.with_sharding_constraint(future, sharding)
    return past, future


def window_indices(
    num_seqs: int, total_len: int, window_len: int, stride: int
) -> np.ndarray:
    """``(num_windows, 2)`` array of (sequence index, start frame) pairs."""
    starts = np.arange(0, total_len - window_len + 1, stride)
    seqs = np.arange(num_seqs)
    grid = np.stack(np.meshgrid(seqs, starts, indexing="ij"), axis=-1)
    return grid.reshape(-1, 2)


@dataclass
class WindowDataset:
    """Batched past/future windows over raw sequences, gathered on device."""

    raw: jnp.ndarray  # (N, T_raw, H, W, C), device-resident
    past_len: int
    future_len: int
    stride: int

    def __post_init__(self):
        n, t_raw = self.raw.shape[0], self.raw.shape[1]
        self.indices = window_indices(
            n, t_raw, self.past_len + self.future_len, self.stride
        )

    def __len__(self) -> int:
        return len(self.indices)

    def gather(self, idx: np.ndarray):
        """Gather windows for flat window ids ``idx`` → (past, future)."""
        sel = self.indices[np.asarray(idx)]
        return _gather_windows(
            self.raw, jnp.asarray(sel[:, 0]), jnp.asarray(sel[:, 1]),
            past_len=self.past_len, future_len=self.future_len,
        )

    def epoch_arrays(
        self, batch_size: int, *, shuffle: bool = True, seed: int = 0,
        sharding=None,
    ):
        """One epoch as stacked ``(n_batches, batch, ...)`` past/future
        arrays — the input to a whole-epoch ``lax.scan``
        (:func:`crowdmod_tpu.train.state.make_epoch_step`).

        Pass ``sharding`` (e.g. ``NamedSharding(mesh, P(None, "data"))``) to
        gather the epoch directly into that layout for mesh training."""
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n_full = len(order) // batch_size
        sel = self.indices[order[: n_full * batch_size]]
        return _gather_epoch(
            self.raw, jnp.asarray(sel[:, 0]), jnp.asarray(sel[:, 1]),
            past_len=self.past_len, future_len=self.future_len,
            n_batches=n_full, batch_size=batch_size, sharding=sharding,
        )

    def batches(
        self,
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_last: bool = True,
        seed: int = 0,
    ) -> Iterator[tuple[jnp.ndarray, jnp.ndarray]]:
        """One epoch of (past, future) batches.

        Shuffling mirrors the reference DataLoader defaults
        (configs/ATC.yml DATASET.params: shuffle + drop_last).
        """
        order = np.arange(len(self))
        if shuffle:
            np.random.default_rng(seed).shuffle(order)
        n_full = len(order) // batch_size
        end = n_full * batch_size
        for i in range(0, end, batch_size):
            yield self.gather(order[i : i + batch_size])
        if not drop_last and end < len(order):
            yield self.gather(order[end:])
