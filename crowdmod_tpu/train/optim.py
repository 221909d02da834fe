"""Optimizer and LR scheduling with the reference's training semantics.

The reference trains every model family with ``torch.optim.Adam`` (L2-coupled
weight decay — decay added to the gradient *before* the moment updates, unlike
AdamW) plus ``ReduceLROnPlateau`` (/root/reference/models/diffusion/ddpm.py:53-63).

Here: ``optax.chain(add_decayed_weights, scale_by_adam, scale(-lr))`` wrapped
in ``inject_hyperparams`` so the learning rate lives in the optimizer state —
the plateau scheduler then updates it *without recompiling* the jitted train
step.  The plateau logic itself is a tiny pure host-side state machine
(it runs once per epoch on a scalar loss; nothing to accelerate).
"""

from __future__ import annotations

from typing import NamedTuple

import optax


def adam_with_plateau(
    learning_rate: float,
    betas: tuple[float, float] = (0.9, 0.999),
    weight_decay: float = 0.0,
    eps: float = 1e-8,
    amsgrad: bool = False,
) -> optax.GradientTransformation:
    """torch.optim.Adam-semantics optimizer with injectable learning rate.

    ``amsgrad=True`` matches the ConvRNN wrapper's Adam(amsgrad=True)
    (reference models/convRNN/convRNN.py:50-54).
    """

    scale_by = (
        optax.scale_by_amsgrad(b1=betas[0], b2=betas[1], eps=eps)
        if amsgrad
        else optax.scale_by_adam(b1=betas[0], b2=betas[1], eps=eps)
    )

    def make(learning_rate):
        return optax.chain(
            optax.add_decayed_weights(weight_decay) if weight_decay
            else optax.identity(),
            scale_by,
            optax.scale(-1.0 * learning_rate),
        )

    return optax.inject_hyperparams(make)(learning_rate=learning_rate)


def set_learning_rate(opt_state, lr: float):
    """Update the injected learning rate inside an optimizer state pytree."""
    opt_state.hyperparams["learning_rate"] = lr
    return opt_state


def get_learning_rate(opt_state) -> float:
    return float(opt_state.hyperparams["learning_rate"])


class PlateauState(NamedTuple):
    """ReduceLROnPlateau (mode=min, rel threshold) state machine.

    Matches torch defaults: improvement when ``loss < best * (1 - threshold)``;
    after ``patience`` non-improving epochs the LR is multiplied by ``factor``
    and floored at ``min_lr``.
    """

    lr: float
    best: float = float("inf")
    num_bad: int = 0
    factor: float = 0.5
    patience: int = 10
    min_lr: float = 1e-6
    threshold: float = 1e-4

    def step(self, loss: float) -> "PlateauState":
        if loss < self.best * (1.0 - self.threshold):
            return self._replace(best=loss, num_bad=0)
        num_bad = self.num_bad + 1
        if num_bad > self.patience:
            return self._replace(
                lr=max(self.lr * self.factor, self.min_lr), num_bad=0
            )
        return self._replace(num_bad=num_bad)
