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

from crowdmod_tpu.models.diffusion.ddpm import as_eps_fn
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
    pred_type = trainer.cfg.MODEL.DDPM.get("PRED_TYPE", "eps")
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
            # as_eps_fn adapts v-/x0-parameterized backbones to the
            # eps-space contract distill_loss works in (no-op for eps);
            # gradients flow through the affine conversion unchanged.
            student_fn = as_eps_fn(
                lambda x, t, c: model.apply(params, x, t, c),
                sched, pred_type,
            )
            teacher_fn = as_eps_fn(
                lambda x, t, c: model.apply(_teacher, x, t, c),
                sched, pred_type,
            )
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
    _save_tagged(trainer, params, save_dir, distilled_tag(n_steps),
                 {"distilled_steps": n_steps, "distill_loss": final_loss})


def _save_tagged(trainer, params, save_dir, tag, extra):
    import os

    from crowdmod_tpu.train import checkpoint as ckpt

    name = ckpt.checkpoint_name(trainer.cfg, trainer.arch, tag)
    path = os.path.join(save_dir, name)
    meta = ckpt.build_metadata(trainer.cfg, trainer.arch, tag, extra)
    ckpt.save_checkpoint(path, {"params": params}, meta)
    logging.info("%s checkpoint saved: %s", tag, path)


# ---------------------------------------------------------------------------
# ReFlow — the FM-family twin (models/flow_matching/reflow.py)
# ---------------------------------------------------------------------------


def reflow_tag(round_idx: int) -> str:
    """Checkpoint tag for the ``round_idx``-th rectified flow."""
    return f"RF{round_idx}"


def reflow(
    trainer: "Trainer",
    train_ds: "WindowDataset",
    *,
    rounds: int = 1,
    coupling_steps: int = 100,
    epochs_per_round: int = 8,
    lr: float = 1e-4,
    save_dir: str | None = None,
    save_intermediate: bool = False,
    tracker=None,
    seed: int = 0,
) -> dict:
    """Rectify a trained FM velocity field: per round, integrate the
    teacher's ODE over the training pasts to build coupled (x0, x1) pairs,
    then retrain on the straight paths between them.  The result samples
    accurately with a small Euler ``INTEGRATOR_STEPS`` — no new sampler.

    Leaves the rectified field in ``trainer.state.params``; returns a
    history dict of per-round loss curves.
    """
    if trainer.family != "FM":
        raise ValueError(
            f"reflow targets the FM family, got {trainer.arch!r}"
        )
    if trainer.state is None:
        raise ValueError("trainer has no restored state; load a checkpoint "
                         "before reflowing")
    if rounds < 1:
        raise ValueError(f"rounds must be >= 1, got {rounds}")
    batch_size = trainer.cfg.DATASET.BATCH_SIZE
    if len(train_ds) < batch_size:
        raise ValueError(
            f"reflow dataset yields no full batches: {len(train_ds)} "
            f"windows < DATASET.BATCH_SIZE={batch_size}"
        )
    # Rectification retrains exclusively on conditional pasts (reflow_loss
    # has no condition dropout) and builds couplings with the *unguided*
    # teacher, so the student's unconditional branch goes stale — CFG-guided
    # sampling of the rectified field would silently degrade.  Reject, like
    # the Distilled-sampler guard does (trainer.py CFG_SCALE check).
    if float(trainer.cfg.MODEL.FM.get("CFG_SCALE", 1.0)) != 1.0:
        raise ValueError(
            "reflow produces a guidance-free rectified field; its "
            "unconditional branch is not retrained, so sampling with "
            f"CFG_SCALE={trainer.cfg.MODEL.FM.CFG_SCALE} would apply "
            "guidance against stale null-condition predictions. Set "
            "MODEL.FM.CFG_SCALE to 1.0 before reflowing."
        )

    from crowdmod_tpu.models.flow_matching.reflow import (
        generate_coupling,
        reflow_loss,
    )

    model = trainer.model
    tmp = trainer.cfg.MODEL.FM.TIME_MAX_POS
    teacher_params = jax.tree.map(jnp.copy, trainer._sample_params())
    key = jax.random.PRNGKey(seed)
    history: dict = {"rounds": [], "loss": {}}

    gen = jax.jit(
        lambda params, past_b, k, shape: generate_coupling(
            lambda x, t, c: model.apply(params, x, t, c),
            past_b, k, shape, steps=coupling_steps, time_max_pos=tmp,
        ),
        static_argnums=(3,),
    )

    for r in range(1, rounds + 1):
        # --- build the coupling set from the teacher --------------------
        pasts, x0s, x1s = [], [], []
        for past_b, future_b in train_ds.batches(
            batch_size, shuffle=False, seed=seed
        ):
            key, sub = jax.random.split(key)
            x0, x1 = gen(teacher_params, past_b, sub, future_b.shape)
            pasts.append(past_b)
            x0s.append(x0)
            x1s.append(x1)
        past_all = jnp.concatenate(pasts)
        x0_all = jnp.concatenate(x0s)
        x1_all = jnp.concatenate(x1s)
        n = past_all.shape[0]
        logging.info("reflow round %d: %d coupled pairs "
                     "(teacher %d-step Euler)", r, n, coupling_steps)

        # --- retrain on the straight paths ------------------------------
        def loss_fn(params, batch, k):
            past_b, x0_b, x1_b = batch
            return reflow_loss(
                lambda x, t, c: model.apply(params, x, t, c),
                x0_b, x1_b, past_b, k, time_max_pos=tmp,
            )

        state = TrainState.create(
            jax.tree.map(jnp.copy, teacher_params),
            optax.adam(lr, b1=0.9, b2=0.999),
        )
        step = make_train_step(loss_fn, donate=True)

        round_losses = []
        rng = np.random.default_rng(seed + r)
        for epoch in range(1, epochs_per_round + 1):
            order = rng.permutation(n)
            losses = []
            for i in range(0, n - batch_size + 1, batch_size):
                sel = order[i:i + batch_size]
                batch = (past_all[sel], x0_all[sel], x1_all[sel])
                key, sub = jax.random.split(key)
                state, loss = step(state, batch, sub)
                losses.append(loss)
            epoch_loss = float(jnp.mean(jnp.stack(losses)))
            round_losses.append(epoch_loss)
            if tracker is not None:
                tracker.log({f"reflow_loss_r{r}": epoch_loss}, step=epoch)
            logging.info("reflow round %d, epoch %d/%d: loss %.5f",
                         r, epoch, epochs_per_round, epoch_loss)
            if not np.isfinite(epoch_loss):
                raise FloatingPointError(
                    f"reflow diverged at round {r} epoch {epoch}"
                )

        teacher_params = state.params
        history["rounds"].append(r)
        history["loss"][r] = round_losses
        if save_dir and (save_intermediate or r == rounds):
            _save_tagged(trainer, teacher_params, save_dir, reflow_tag(r),
                         {"reflow_round": r,
                          "coupling_steps": coupling_steps,
                          "reflow_loss": round_losses[-1]})

    trainer.state = trainer.state.replace(
        params=teacher_params,
        ema_params=(
            jax.tree.map(jnp.copy, teacher_params)
            if trainer.state.ema_params is not None else None
        ),
    )
    return history
