"""Minimal torchmetrics shim: MeanMetric as used by the reference trainers
(update(value) with python floats; compute() -> tensor-like with .item())."""

import torch


class MeanMetric:
    def __init__(self):
        self._sum = 0.0
        self._n = 0

    def update(self, value, weight=1.0):
        v = float(value.item() if hasattr(value, "item") else value)
        self._sum += v * weight
        self._n += weight

    def compute(self):
        return torch.tensor(self._sum / self._n if self._n else float("nan"))

    def reset(self):
        self._sum, self._n = 0.0, 0
