"""Synthetic crowd data: deterministic diagonal walkers.

Rebuild of /root/reference/utils/generate_synthetic_data.py:21-66 — injects
known-dynamics "pedestrians" that traverse a fixed row left→right (vx=+v) or
right→left (vx=-v), one column per frame.  Used as the end-to-end integration
fixture (SURVEY.md §4): a model trained on walkers must beat a trivial
predictor on motion direction.

Native layout ``(B, T, H, W, C)``; vectorized scatter instead of the
reference's per-frame Python loop.
"""

from __future__ import annotations

import numpy as np


def _walker(h: int, w: int, t: int, vel_x: float, row: int, forward: bool):
    frames = np.arange(min(t, w))
    cols = frames if forward else (w - 1 - frames)
    grid = np.zeros((t, h, w, 3), dtype=np.float32)
    grid[frames, row, cols, 0] = 1.0
    grid[frames, row, cols, 1] = vel_x if forward else -vel_x
    return grid


def synthetic_walkers(
    batch: int,
    h: int,
    w: int,
    t: int,
    *,
    vel_x: float = 0.8,
    row: int = 6,
    kind: str = "ALL",
) -> np.ndarray:
    """``(B, T, H, W, 3)`` walker field; kind ∈ {FORWARD, BACKWARD, ALL}."""
    grid = np.zeros((t, h, w, 3), dtype=np.float32)
    if kind in ("FORWARD", "ALL"):
        grid += _walker(h, w, t, vel_x, row, forward=True)
    if kind in ("BACKWARD", "ALL"):
        grid += _walker(h, w, t, vel_x, row, forward=False)
    return np.broadcast_to(grid, (batch,) + grid.shape).copy()


def synthetic_dataset(
    base: np.ndarray, *, vel_x: float = 0.8, row: int = 6, kind: str = "ALL"
) -> np.ndarray:
    """Add walkers onto real sequences (reference :58-66 semantics).

    ``base``: ``(B, T, H, W, C)`` with C >= 3; returns a copy with the walker
    field added to the first 3 channels.
    """
    b, t, h, w, c = base.shape
    out = np.array(base, dtype=np.float32, copy=True)
    out[..., :3] += synthetic_walkers(b, h, w, t, vel_x=vel_x, row=row, kind=kind)
    return out
