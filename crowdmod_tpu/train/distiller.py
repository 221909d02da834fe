"""Progressive-distillation driver: halve a trained DDPM's sampler steps.

Beyond-reference training capability (the reference's fast-sampling story
stops at DDIM tau subsets, /root/reference/models/diffusion/ddpm.py:238-282).
Each phase trains a student — initialized from its teacher — to reproduce in
one deterministic DDIM step what the teacher does in two
(``models/diffusion/distill.py``), then the student becomes the next phase's
teacher: ``start_steps -> start_steps/2 -> ... -> target_steps``.

The first teacher is the fully-trained model restored into ``trainer`` (EMA
weights when enabled), evaluated on the ``2*start_steps`` grid its 1000-step
training covers densely.  Each phase's train step is one jitted function
(three backbone forwards + one backward); phases recompile because the grid
is trace-static — that's ``log2(start/target)`` compiles total.
"""

from __future__ import annotations

import logging
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np
import optax

from crowdmod_tpu.models.diffusion.distill import distill_loss
from crowdmod_tpu.train.state import TrainState, make_train_step

if TYPE_CHECKING:  # pragma: no cover
    from crowdmod_tpu.data.windows import WindowDataset
    from crowdmod_tpu.train.trainer import Trainer


def distilled_tag(n_steps: int) -> str:
    """Checkpoint epoch tag for an ``n_steps`` distilled student (kept
    distinct from numeric epoch tags and the '000' best-loss tag)."""
    return f"D{n_steps:03d}"


def progressive_distill(
    trainer: "Trainer",
    train_ds: "WindowDataset",
    *,
    target_steps: int,
    start_steps: int = 64,
    epochs_per_phase: int = 8,
    lr: float = 1e-4,
    save_dir: str | None = None,
    save_intermediate: bool = False,
    tracker=None,
    seed: int = 0,
) -> dict:
    """Run the halving phases; leaves the final student in
    ``trainer.state.params`` and (when ``save_dir``) saves it under the
    :func:`distilled_tag` checkpoint name with explicit metadata.

    Returns a history dict: per-phase step counts and loss curves.
    """
    if trainer.family != "DDPM":
        raise ValueError(
            f"progressive distillation targets the DDPM family, got "
            f"{trainer.arch!r}"
        )
    if trainer.state is None:
        raise ValueError("trainer has no restored state; load a checkpoint "
                         "before distilling")
    if target_steps < 1 or start_steps < target_steps:
        raise ValueError(
            f"need start_steps >= target_steps >= 1, got "
            f"{start_steps} -> {target_steps}"
        )
    ratio = start_steps / target_steps
    if 2 ** int(round(np.log2(ratio))) != ratio:
        raise ValueError(
            f"start_steps/target_steps must be a power of two, got "
            f"{start_steps}/{target_steps}"
        )
    if 2 * start_steps > trainer.sched.timesteps:
        raise ValueError(
            f"first teacher grid (2*{start_steps}) exceeds the schedule's "
            f"{trainer.sched.timesteps} timesteps"
        )

    sched = trainer.sched
    model = trainer.model
    batch_size = trainer.cfg.DATASET.BATCH_SIZE
    if len(train_ds) < batch_size:
        raise ValueError(
            f"distillation dataset yields no full batches: {len(train_ds)} "
            f"windows < DATASET.BATCH_SIZE={batch_size}"
        )

    # EMA weights when enabled — the same weights sampling would use.
    teacher_params = jax.tree.map(jnp.copy, trainer._sample_params())
    key = jax.random.PRNGKey(seed)
    history: dict = {"phases": [], "loss": {}}

    n = start_steps
    while n >= target_steps:
        teacher = teacher_params  # bind per phase for the closure

        def loss_fn(params, batch, key, *, _n=n, _teacher=teacher):
            past_b, future_b = batch
            student_fn = lambda x, t, c: model.apply(params, x, t, c)
            teacher_fn = lambda x, t, c: model.apply(_teacher, x, t, c)
            return distill_loss(
                student_fn, teacher_fn, sched, _n, future_b, past_b, key
            )

        state = TrainState.create(
            jax.tree.map(jnp.copy, teacher_params),
            optax.adam(lr, b1=0.9, b2=0.999),
        )
        step = make_train_step(loss_fn, donate=True)

        phase_losses = []
        for epoch in range(1, epochs_per_phase + 1):
            losses = []
            for batch in train_ds.batches(
                batch_size, shuffle=True, seed=seed + epoch
            ):
                key, sub = jax.random.split(key)
                state, loss = step(state, batch, sub)
                losses.append(loss)
            epoch_loss = float(jnp.mean(jnp.stack(losses)))
            phase_losses.append(epoch_loss)
            if tracker is not None:
                tracker.log({f"distill_loss_n{n}": epoch_loss}, step=epoch)
            logging.info("distill %d-step phase, epoch %d/%d: loss %.5f",
                         n, epoch, epochs_per_phase, epoch_loss)
            if not np.isfinite(epoch_loss):
                raise FloatingPointError(
                    f"distillation diverged at {n}-step phase epoch {epoch}"
                )

        teacher_params = state.params
        history["phases"].append(n)
        history["loss"][n] = phase_losses

        if save_dir and (save_intermediate or n == target_steps):
            _save_student(trainer, teacher_params, save_dir, n,
                          phase_losses[-1])
        if n == target_steps:
            break
        n //= 2

    # Leave the student where sampling looks for weights (raw + EMA slots).
    trainer.state = trainer.state.replace(
        params=teacher_params,
        ema_params=(
            jax.tree.map(jnp.copy, teacher_params)
            if trainer.state.ema_params is not None else None
        ),
    )
    return history


def _save_student(trainer, params, save_dir, n_steps, final_loss):
    from crowdmod_tpu.train import checkpoint as ckpt

    import os

    name = ckpt.checkpoint_name(trainer.cfg, trainer.arch,
                                distilled_tag(n_steps))
    path = os.path.join(save_dir, name)
    meta = ckpt.build_metadata(
        trainer.cfg, trainer.arch, distilled_tag(n_steps),
        {"distilled_steps": n_steps, "distill_loss": final_loss},
    )
    ckpt.save_checkpoint(path, {"params": params}, meta)
    logging.info("distilled %d-step checkpoint saved: %s", n_steps, path)
