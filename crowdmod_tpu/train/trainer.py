"""Unified training / sampling / evaluation orchestration.

One ``Trainer`` replaces the reference's three near-identical model wrappers
(``DDPM_model`` ddpm.py:40-392, ``FM_model`` flow_matching.py:14-346,
``ConvRNN_model`` convRNN.py:22-316): family-specific pieces (loss, sampler)
are selected once at construction; the epoch loop, NaN watchdog, plateau
scheduler, checkpoint policy and tracking are shared.

Reference behaviors kept:
  * best-loss checkpoint tagged "000" + CHECKPOINTS_TO_KEEP random epochs in
    the last 25% of training (ddpm.py:165-202);
  * abort after 3 consecutive NaN epochs (ddpm.py:183-192);
  * warm-start from a baseline checkpoint restores model params only, not
    optimizer state (train.py:78, ddpm.py:160-163);
  * sampling protocols: random past, same-past, fixed-past, and the
    repeated-past chunk protocol for metrics (ddpm.py:295-318, 358-366).
"""

from __future__ import annotations

import logging
import os
import numpy as np

import jax
import jax.numpy as jnp

from crowdmod_tpu.config import FrozenConfig
from crowdmod_tpu.core.schedule import ddim_tau_schedule, linear_schedule
from crowdmod_tpu.data.windows import WindowDataset
from crowdmod_tpu.metrics.generator import MetricsEngine, compute_metrics
from crowdmod_tpu.models import factory
from crowdmod_tpu.models.convrnn import convrnn_loss
from crowdmod_tpu.models.diffusion import ddim_sample, ddpm_loss, ddpm_sample
from crowdmod_tpu.models.flow_matching import INTEGRATORS, fm_loss
from crowdmod_tpu.models.guidance import cfg_denoise_fn, drop_condition
from crowdmod_tpu.train import checkpoint as ckpt
from crowdmod_tpu.train.optim import (
    PlateauState,
    adam_with_plateau,
    get_learning_rate,
    set_learning_rate,
)
from crowdmod_tpu.train.state import (
    TrainState,
    make_epoch_step,
    make_train_step,
)
from crowdmod_tpu.utils.tracker import RunTracker


def _solver_node(cfg: FrozenConfig, arch: str):
    if arch == "ConvRNN":
        return cfg.MODEL.CONVRNN.TRAIN
    return factory.backbone_cfg(cfg, arch).TRAIN


class Trainer:
    def __init__(
        self,
        cfg: FrozenConfig,
        arch: str,
        mprops_count: int | None = None,
        *,
        mesh=None,
        param_sharding: str = "tp",
        run_dir: str | None = None,
        compute_dtype=None,
        seed: int = 42,
    ):
        self.cfg = cfg
        self.arch = arch
        self.family = "ConvRNN" if arch == "ConvRNN" else arch.split("-")[0]
        # ConvRNN models all 4 macroprops; generative models use 3
        # (reference train.py:59).
        self.mprops_count = (
            mprops_count if mprops_count is not None
            else (4 if arch == "ConvRNN" else 3)
        )
        if compute_dtype is None:
            name = cfg.get_path("TPU.COMPUTE_DTYPE", "float32")
            compute_dtype = (
                jnp.bfloat16
                if (name == "bfloat16" and jax.default_backend() == "tpu")
                else jnp.float32
            )
        self.model = factory.build_backbone(
            cfg, arch, self.mprops_count, dtype=compute_dtype
        )
        self.mesh = mesh
        # "tp" (replicate + channel-shard large kernels over "model") or
        # "fsdp" (also shard params/opt-state/EMA over "data", ZeRO-3).
        self.param_sharding = param_sharding
        self.seed = seed
        # Which weights sampling uses: "ema" (EMA when enabled — reference
        # model.eval() + smoothing semantics) or "raw" (the training
        # weights).  "raw" exists for EMA ablations and as the nightly
        # gate's deliberate-regression lever.
        self.sample_weights = "ema"
        self.run_dir = run_dir or os.path.join(
            cfg.DATA_FS.OUTPUT_DIR, "runs", arch
        )

        solver = _solver_node(cfg, arch).SOLVER
        self.total_epochs = _solver_node(cfg, arch).EPOCHS
        self.tx = adam_with_plateau(
            solver.LR,
            tuple(solver.BETAS),
            solver.WEIGHT_DECAY,
            amsgrad=(arch == "ConvRNN"),
        )
        self.plateau = PlateauState(
            lr=solver.LR,
            factor=solver.SCHEDULER.FACTOR,
            patience=solver.SCHEDULER.PATIENCE,
            min_lr=solver.SCHEDULER.MIN_LR,
        )

        if self.family == "DDPM":
            self.sched = linear_schedule(
                cfg.MODEL.DDPM.TIMESTEPS, scale=cfg.MODEL.DDPM.SCALE
            )
        else:
            self.sched = None

        self.state: TrainState | None = None
        self._train_step = None
        self._state_out_shardings = None
        self._mesh_sample = None

    # ------------------------------------------------------------------
    # Setup
    # ------------------------------------------------------------------
    def _grid_shapes(self):
        c = self.cfg
        return (
            c.DATASET.PAST_LEN, c.DATASET.FUTURE_LEN,
            c.MACROPROPS.ROWS, c.MACROPROPS.COLS,
        )

    def init_params(self, key=None):
        p, f, h, w = self._grid_shapes()
        key = key if key is not None else jax.random.PRNGKey(self.seed)
        past = jnp.zeros((2, p, h, w, self.mprops_count))
        future = jnp.zeros((2, f, h, w, self.mprops_count))
        if self.arch == "ConvRNN":
            return self.model.init(key, past, target=future, teacher_forcing=True)
        return self.model.init(key, future, jnp.zeros((2,)), past)

    def _loss_fn(self, *, deterministic: bool = False):
        """Loss closure; ``deterministic=True`` disables dropout (the eval
        variant — reference ``model.eval()`` semantics)."""
        model, cfg = self.model, self.cfg

        def apply_kwargs(dropout_key):
            if deterministic:
                return {"deterministic": True}
            return {"deterministic": False, "rngs": {"dropout": dropout_key}}

        if self.family == "DDPM":
            sched = self.sched
            cfg_drop = float(cfg.MODEL.DDPM.get("CFG_DROP_PROB", 0.0))
            pred_type = cfg.MODEL.DDPM.get("PRED_TYPE", "eps")

            def loss(params, batch, key):
                past, future = batch
                # Condition dropout is a *training* regularizer: skip it in
                # the deterministic (eval) variant so val loss matches the
                # reference's model.eval() semantics, and skip the extra key
                # split when the feature is off so pre-CFG RNG streams (and
                # same-seed reproducibility) are preserved.
                if cfg_drop > 0.0 and not deterministic:
                    dropout, drop_key, step_key = jax.random.split(key, 3)
                    past = drop_condition(past, drop_key, cfg_drop)
                else:
                    dropout, step_key = jax.random.split(key)
                denoise = lambda x, t, c: model.apply(
                    params, x, t, c, **apply_kwargs(dropout)
                )
                return ddpm_loss(
                    denoise, sched, future, past, step_key,
                    pred_type=pred_type,
                )

        elif self.family == "FM":
            w_type = cfg.MODEL.FM.W_TYPE
            tmax = cfg.MODEL.FM.TIME_MAX_POS
            cfg_drop = float(cfg.MODEL.FM.get("CFG_DROP_PROB", 0.0))

            def loss(params, batch, key):
                past, future = batch
                # Same dropout/RNG-stream discipline as the DDPM branch.
                if cfg_drop > 0.0 and not deterministic:
                    dropout, drop_key, step_key = jax.random.split(key, 3)
                    past = drop_condition(past, drop_key, cfg_drop)
                else:
                    dropout, step_key = jax.random.split(key)
                u_fn = lambda x, t, c: model.apply(
                    params, x, t, c, **apply_kwargs(dropout)
                )
                return fm_loss(
                    u_fn, future, past, step_key, w_type=w_type,
                    time_max_pos=tmax,
                )

        else:  # ConvRNN
            tf = bool(cfg.MODEL.CONVRNN.TEACHER_FORCING)
            eps = cfg.MACROPROPS.EPS

            def loss(params, batch, key):
                past, future = batch
                pred = model.apply(
                    params, past, target=future, teacher_forcing=tf
                )
                rloss, vloss, _, _ = convrnn_loss(pred, future, eps)
                return rloss + vloss  # alpha = 1 (convRNN.py:121-123)

        return loss

    def resume_from_abort(self) -> bool:
        """Restore the emergency 'abort' checkpoint when present.

        → True when state was restored (crash/interrupt recovery; the
        reference can only warm-start weights manually via --baseline-ckpt).
        """
        path = os.path.join(
            self.cfg.DATA_FS.SAVE_DIR,
            ckpt.checkpoint_name(self.cfg, self.arch, "abort"),
        )
        if not os.path.isdir(path):
            return False
        self.load(path)
        self._resumed = True
        logging.info("resumed from emergency checkpoint %s", path)
        return True

    def setup(self, baseline_ckpt: str | None = None):
        params = self.init_params()
        if baseline_ckpt:
            restored, _ = ckpt.load_checkpoint(baseline_ckpt)
            params = jax.tree.unflatten(
                jax.tree.structure(params),
                jax.tree.leaves(restored["params"]),
            )
            logging.info("baseline checkpoint loaded from %s", baseline_ckpt)
        if self.mesh is not None:
            from crowdmod_tpu.parallel.sharding import shard_params

            params = shard_params(params, self.mesh, mode=self.param_sharding)
        ema_decay = float(
            _solver_node(self.cfg, self.arch).get("EMA_DECAY", 0.0)
        )
        if not 0.0 <= ema_decay < 1.0:
            raise ValueError(
                f"TRAIN.EMA_DECAY must be in [0, 1); got {ema_decay}"
            )
        self.state = TrainState.create(params, self.tx, ema_decay=ema_decay)
        self._state_out_shardings = None
        if self.mesh is not None:
            from crowdmod_tpu.train.state import state_shardings

            self._state_out_shardings = state_shardings(self.state, self.mesh)
        self._train_step = make_train_step(
            self._loss_fn(), donate=True,
            out_shardings=self._state_out_shardings,
        )
        return self

    # ------------------------------------------------------------------
    # Training
    # ------------------------------------------------------------------
    def fit(
        self,
        train_ds: WindowDataset,
        val_ds: WindowDataset | None = None,
        *,
        baseline_ckpt: str | None = None,
        epochs: int | None = None,
        tracker: RunTracker | None = None,
        scan_epoch: bool | None = None,
    ) -> dict:
        if self.state is None:
            self.setup(baseline_ckpt)
        epochs = epochs or self.total_epochs
        cfg = self.cfg
        batch_size = cfg.DATASET.BATCH_SIZE
        if len(train_ds) < batch_size:
            raise ValueError(
                f"training dataset yields no full batches: {len(train_ds)} "
                f"windows < DATASET.BATCH_SIZE={batch_size}; lower the batch "
                "size or provide more data"
            )
        key = jax.random.PRNGKey(self.seed)

        # Whole-epoch lax.scan removes per-batch dispatch latency — the
        # dominant cost for these small models on TPU.  Under a mesh the
        # stacked (n_batches, B, ...) epoch tensor is DP-sharded on axis 1,
        # so each scan step consumes an already-sharded batch (axis 0 after
        # the slice) — multi-chip training keeps the single-dispatch epoch.
        if scan_epoch is None:
            scan_epoch = jax.default_backend() == "tpu"
        epoch_step = (
            make_epoch_step(
                self._loss_fn(), donate=True,
                out_shardings=self._state_out_shardings,
            ) if scan_epoch
            else None
        )
        epoch_sharding = None
        if scan_epoch and self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P

            epoch_sharding = NamedSharding(self.mesh, P(None, "data"))

        save_dir = cfg.DATA_FS.SAVE_DIR
        keep = cfg.get_path(f"MODEL.{self.family.upper()}.CHECKPOINTS_TO_KEEP", 0)
        rng = np.random.default_rng(self.seed)
        late = []
        if keep:
            # Sample WITHOUT replacement from the last-25% window (reference
            # ddpm.py:168-170): duplicates would silently save fewer than
            # the configured number of late checkpoints.
            lo = max(1, int(epochs * 0.75))
            pool = np.arange(lo, epochs + 1)
            late = rng.choice(pool, size=min(keep, len(pool)), replace=False)

        own_tracker = tracker is None
        if own_tracker:
            tracker = RunTracker(self.run_dir, config=cfg, use_wandb=False)

        best = float("inf")
        if getattr(self, "_resumed", False):
            # A resumed run must not overwrite '000' with its first epoch
            # when the pre-crash best was better — seed `best` from the
            # existing best-loss checkpoint's metadata.  Fresh runs keep
            # best=inf so they can replace a stale '000' from an old run.
            prev_meta = ckpt.read_metadata(os.path.join(
                save_dir, ckpt.checkpoint_name(cfg, self.arch, "000")
            ))
            if prev_meta and isinstance(
                prev_meta.get("epoch_loss"), (int, float)
            ):
                best = float(prev_meta["epoch_loss"])
        nan_streak = 0
        completed = False
        aborted = False
        history = {"train_loss": [], "val_loss": [], "lr": [],
                   "aborted": False}

        # Deliver SIGINT only at step boundaries: the train step DONATES
        # the state buffers, so a KeyboardInterrupt landing mid-dispatch
        # leaves self.state pointing at deleted arrays and the emergency
        # save below dies with "Array has been deleted" (round-5 drill
        # race).  First Ctrl-C sets a flag raised at the next safe point;
        # a second Ctrl-C interrupts immediately (hung-step escape hatch).
        import signal as _signal

        deferred = {"sig": False}

        def _defer_sigint(signum, frame):
            if deferred["sig"]:
                raise KeyboardInterrupt
            deferred["sig"] = True
            logging.warning(
                "SIGINT received; aborting at the next step boundary "
                "(press again to interrupt immediately)"
            )

        def _boundary():
            if deferred["sig"]:
                raise KeyboardInterrupt

        prev_handler = None
        try:
            prev_handler = _signal.signal(_signal.SIGINT, _defer_sigint)
        except ValueError:
            prev_handler = None  # not the main thread; leave delivery as-is
        try:
            for epoch in range(1, epochs + 1):
                if scan_epoch:
                    # Under a mesh the gather produces each device's epoch
                    # shard in place — no single-chip materialization or
                    # post-hoc reshard (see windows._gather_epoch).
                    stacked = train_ds.epoch_arrays(
                        batch_size, shuffle=True, seed=self.seed + epoch,
                        sharding=epoch_sharding,
                    )
                    key, sub = jax.random.split(key)
                    self.state, losses = epoch_step(self.state, stacked, sub)
                    _boundary()
                    epoch_loss = float(jnp.mean(losses))
                else:
                    losses = []
                    for batch in train_ds.batches(
                        batch_size, shuffle=True, seed=self.seed + epoch
                    ):
                        if self.mesh is not None:
                            from crowdmod_tpu.parallel.mesh import shard_batch

                            batch = shard_batch(batch, self.mesh)
                        key, sub = jax.random.split(key)
                        self.state, loss = self._train_step(
                            self.state, batch, sub
                        )
                        _boundary()
                        losses.append(loss)
                    epoch_loss = float(jnp.mean(jnp.stack(losses)))

                val_loss = None
                if val_ds is not None:
                    val_loss = self.evaluate(val_ds)

                self.plateau = self.plateau.step(epoch_loss)
                self.state = self.state.replace(
                    opt_state=set_learning_rate(
                        self.state.opt_state, self.plateau.lr
                    )
                )
                lr = get_learning_rate(self.state.opt_state)
                history["train_loss"].append(epoch_loss)
                history["val_loss"].append(val_loss)
                history["lr"].append(lr)
                log = {"train_loss": epoch_loss, "lr": lr}
                if val_loss is not None:
                    log["val_loss"] = val_loss
                tracker.log(log, step=epoch)

                # NaN watchdog (3 consecutive epochs → abort).
                if np.isnan(epoch_loss):
                    nan_streak += 1
                    logging.warning(
                        "epoch %d: NaN loss (%d consecutive)", epoch, nan_streak
                    )
                    if nan_streak >= 3:
                        # A diverged run is NOT a completed run: mark it so
                        # callers (CLI exit code, sweeps) can tell, and skip
                        # the completion-time retention sweep below — it
                        # must not delete a previous run's checkpoints on
                        # the strength of a failed one.
                        logging.error("3 consecutive NaN epochs; aborting")
                        aborted = True
                        break
                else:
                    nan_streak = 0

                # In-loop checkpoints commit asynchronously so I/O
                # overlaps the next epoch's compute; fit() waits before
                # returning.
                if epoch_loss < best:
                    best = epoch_loss
                    self.save(save_dir, "000", extra={"epoch_loss": epoch_loss},
                              async_save=True)
                if epoch in late:
                    self.save(save_dir, epoch, extra={"epoch_loss": epoch_loss},
                              async_save=True)
                _boundary()
            completed = not aborted
            history["aborted"] = aborted
        except BaseException:
            # Crash/interrupt resilience the reference lacks (SURVEY §5.3):
            # persist the in-flight state so long runs resume instead of
            # restarting.  Multi-process runs must NOT attempt this: the
            # save path is collective (process_allgather + barriers,
            # checkpoint.py), and an exception that hits only one host
            # (SIGINT, local OOM/disk error) would leave the others inside
            # the train step's own collectives — mismatched collectives
            # hang the pod instead of saving.  Pod crash recovery is the
            # periodic best/late checkpoints, which every process reaches
            # together.
            if jax.process_count() > 1:
                logging.error(
                    "training aborted on process %d; emergency checkpoint "
                    "skipped in multi-process runs (resume from the last "
                    "committed best/late checkpoint)", jax.process_index(),
                )
            else:
                try:
                    self.save(save_dir, "abort")
                    logging.error(
                        "training aborted; emergency checkpoint saved"
                    )
                except Exception:
                    logging.exception("emergency checkpoint failed")
            raise
        finally:
            if prev_handler is not None:
                _signal.signal(_signal.SIGINT, prev_handler)
            # A failed async commit must not mask the real training error
            # (or abort the finally before the tracker closes its handles).
            try:
                ckpt.wait_for_saves()
            except Exception:
                logging.exception("async checkpoint commit failed")
            if own_tracker:
                tracker.finish()
        if completed:
            # Run finished: its crash-recovery point is obsolete and only
            # the newest `keep` late-epoch checkpoints are retained.  When
            # this run saved no late checkpoints (keep == 0), skip the
            # retention sweep entirely — keep_epochs=0 would delete numbered
            # checkpoints left by EARLIER runs of the same (cfg, arch).
            ckpt.gc_checkpoints(
                save_dir, self.cfg, self.arch,
                keep_epochs=keep if keep else None, remove_abort=True,
            )
        return history

    def evaluate(self, ds: WindowDataset) -> float:
        # Cache the jitted eval loss — re-jitting per call would recompile
        # every epoch.  Dropout is OFF here (reference model.eval()
        # semantics): the training closure would stochastically inflate
        # every epoch's val_loss.
        if not hasattr(self, "_eval_loss"):
            self._eval_loss = jax.jit(self._loss_fn(deterministic=True))
        loss_fn = self._eval_loss
        key = jax.random.PRNGKey(0)
        losses = []
        # drop_last matches the reference's val DataLoader params and keeps
        # eval a single compiled shape (a ragged final batch would compile a
        # second program and weight its rows unequally in the mean).  Tiny
        # datasets (< one batch) keep their single partial batch.
        batch_size = self.cfg.DATASET.BATCH_SIZE
        for batch in ds.batches(
            batch_size, shuffle=False, drop_last=len(ds) >= batch_size
        ):
            if self.mesh is not None:
                # Shard the val batch like the train path does: jit would
                # accept the device-0-committed gather output but reshard it
                # through one device on every eval step.
                from crowdmod_tpu.parallel.mesh import shard_batch

                batch = shard_batch(batch, self.mesh)
            key, sub = jax.random.split(key)
            losses.append(loss_fn(self.state.params, batch, sub))
        return float(jnp.mean(jnp.stack(losses)))

    # ------------------------------------------------------------------
    # Checkpointing
    # ------------------------------------------------------------------
    def save(self, save_dir: str, epoch: int | str, extra: dict | None = None,
             *, async_save: bool = False):
        name = ckpt.checkpoint_name(self.cfg, self.arch, epoch)
        path = os.path.join(save_dir, name)
        meta = ckpt.build_metadata(self.cfg, self.arch, epoch, extra)
        # Optimizer state ships with every checkpoint (the reference saves
        # {"opt", "model"} too, utils.py:140-147) so crash recovery resumes
        # the Adam moments, step counter, and injected LR — not just weights.
        payload = {
            "params": self.state.params,
            "step": self.state.step,
            "opt_state": self.state.opt_state,
        }
        if self.state.ema_params is not None:
            payload["ema_params"] = self.state.ema_params
        return ckpt.save_checkpoint(path, payload, meta, async_save=async_save)

    def load(self, path: str):
        if self.state is None:
            self.setup()
        restored, meta = ckpt.load_checkpoint(path)
        structure = jax.tree.structure(self.state.params)
        params = jax.tree.unflatten(
            structure, jax.tree.leaves(restored["params"])
        )
        ema = self.state.ema_params
        if "ema_params" in restored:
            ema = jax.tree.unflatten(
                structure, jax.tree.leaves(restored["ema_params"])
            )
        elif ema is not None:
            # EMA enabled but checkpoint predates it: seed from the weights
            # (copied — params and ema share a donated state pytree).
            ema = jax.tree.map(jnp.copy, params)
        # Resume the full training state when the checkpoint carries it:
        # without the step counter the EMA warmup schedule restarts at
        # d_eff≈0.1 and the first post-resume update wipes the accumulated
        # average; without the Adam moments/injected LR, resume silently
        # restarts optimization.  Older params-only checkpoints still load.
        step = self.state.step
        if "step" in restored:
            step = jnp.asarray(restored["step"], jnp.int32)
        opt_state = self.state.opt_state
        if "opt_state" in restored:
            opt_state = jax.tree.unflatten(
                jax.tree.structure(self.state.opt_state),
                jax.tree.leaves(restored["opt_state"]),
            )
            self.plateau = self.plateau._replace(
                lr=get_learning_rate(opt_state)
            )
        if self.mesh is not None:
            # Orbax restores to the default device; re-apply the mesh layout
            # so sampling/eval run sharded without an implicit reshard.
            from crowdmod_tpu.parallel.sharding import shard_params

            params = shard_params(params, self.mesh, mode=self.param_sharding)
            if ema is not None:
                ema = shard_params(ema, self.mesh, mode=self.param_sharding)
            if "opt_state" in restored:
                opt_state = shard_params(
                    opt_state, self.mesh, mode=self.param_sharding
                )
        self.state = self.state.replace(
            params=params, ema_params=ema, step=step, opt_state=opt_state
        )
        return meta

    # ------------------------------------------------------------------
    # Sampling
    # ------------------------------------------------------------------
    def _sample_params(self):
        """EMA weights when enabled (smoother samples), else the raw
        training weights.  Training/eval losses always use the raw weights
        (they drive the plateau scheduler)."""
        st = self.state
        if self.sample_weights == "raw":
            return st.params
        return st.ema_params if st.ema_params is not None else st.params

    def _denoise_fn(self, params=None):
        if params is None:
            params = self._sample_params()
        from crowdmod_tpu.ops.pallas import pallas_mode

        if "UNet" in self.arch and pallas_mode("resblock") != "off":
            # Weight-stationary fused resblock kernels on the sampler path
            # (ops/pallas/resblock.py): level-0 blocks run as one Pallas
            # kernel each, ineligible blocks fall through inside the
            # interceptor.  Deterministic path only — exactly this one.
            from crowdmod_tpu.models.backbones.fused_apply import (
                fused_unet_apply,
            )

            fn = lambda x, t, c: fused_unet_apply(self.model, params, x, t, c)
        else:
            fn = lambda x, t, c: self.model.apply(params, x, t, c)
        # Classifier-free guidance at sampling time (scale 1.0 = off); the
        # wrapper keeps the DenoiseFn signature so every sampler takes it.
        node = self.cfg.MODEL.DDPM if self.family == "DDPM" else (
            self.cfg.MODEL.FM if self.family == "FM" else None
        )
        scale = float(node.get("CFG_SCALE", 1.0)) if node is not None else 1.0
        fn = cfg_denoise_fn(fn, scale)
        if self.family == "DDPM":
            # Adapt v-/x0-parameterized models to the eps-space contract all
            # samplers consume (no-op for the default eps head).  Conversion
            # is affine in the model output, so it commutes with CFG.
            from crowdmod_tpu.models.diffusion import as_eps_fn

            fn = as_eps_fn(
                fn, self.sched, node.get("PRED_TYPE", "eps")
            )
        return fn

    def sample(self, past: jnp.ndarray, key, *, history: bool = False):
        """Generate future blocks conditioned on ``past`` with the family's
        configured sampler; returns ``(B, F, H, W, C)``.

        Under a mesh, sampling is batch-parallel: ``past`` is sharded over
        the ``data`` axis and the whole reverse chain runs as one jitted
        program with sharded outputs (the NSAMPLES×chunk metric protocol is
        embarrassingly parallel).  The ``history`` variant (viz-only, small
        batches) stays on the single-program path.
        """
        if self.mesh is not None and not history:
            from crowdmod_tpu.parallel.mesh import shard_batch

            n = past.shape[0]
            n_data = self.mesh.shape["data"]
            pad = (-n) % n_data
            if pad:
                # Round up to the data axis by repeating the last row; the
                # extra samples are dropped after the sharded program runs.
                past = jnp.concatenate(
                    [past, jnp.repeat(past[-1:], pad, axis=0)]
                )
            past = shard_batch(past, self.mesh)
            out = self._mesh_sample_fn()(self._sample_params(), past, key)
            return out[:n] if pad else out
        return self._sample_impl(past, key, history=history)

    def _mesh_sample_fn(self):
        """Cached jitted sampler with batch-sharded output; params are an
        explicit argument so EMA/raw updates are never baked in as
        constants."""
        if self._mesh_sample is None:
            from crowdmod_tpu.parallel.mesh import batch_sharding

            self._mesh_sample = jax.jit(
                lambda params, past, key: self._sample_impl(
                    past, key, params=params
                ),
                out_shardings=batch_sharding(self.mesh),
            )
        return self._mesh_sample

    def _sample_impl(
        self, past: jnp.ndarray, key, *, history: bool = False, params=None
    ):
        cfg = self.cfg
        p, f, h, w = self._grid_shapes()
        n = past.shape[0]
        shape = (n, f, h, w, self.mprops_count)

        if self.family == "DDPM":
            node = cfg.MODEL.DDPM
            if node.SAMPLER == "DDIM":
                taus = ddim_tau_schedule(node.TIMESTEPS, node.DDIM_DIVIDER)
                return ddim_sample(
                    self._denoise_fn(params), self.sched, past, key, shape, taus,
                    sigma=node.SIGMA, guidance=node.GUIDANCE,
                    lambda_guidance=node.get("LAMBDA_GUIDANCE", 0.0),
                    history=history,
                )
            if node.SAMPLER == "DDIM-eta":
                # Textbook eta-DDIM on a respaced grid (beyond the
                # reference's lagged recurrence): ETA=1 is the respaced
                # ancestral sampler — the protocol-quality fast path.
                from crowdmod_tpu.core.schedule import respaced_taus
                from crowdmod_tpu.models.diffusion import ddim_eta_sample

                taus = respaced_taus(
                    node.TIMESTEPS, node.get("ETA_STEPS", 50)
                )
                return ddim_eta_sample(
                    self._denoise_fn(params), self.sched, past, key, shape,
                    taus, eta=node.get("ETA", 1.0), guidance=node.GUIDANCE,
                    lambda_guidance=node.get("LAMBDA_GUIDANCE", 0.0),
                    history=history,
                )
            if node.SAMPLER == "DPM-Solver":
                # Fast multistep solver (extension beyond the reference's
                # DDPM/DDIM; models/diffusion/dpm_solver.py).  Guidance is
                # not implemented on this path — reject rather than run
                # unguided under a guided config (the Distilled rule).
                if node.GUIDANCE not in ("None", None):
                    raise ValueError(
                        "the DPM-Solver sampler does not implement "
                        f"guidance; got GUIDANCE={node.GUIDANCE!r} — use "
                        "DDPM, DDIM, or DDIM-eta for guided sampling"
                    )
                from crowdmod_tpu.models.diffusion import dpm_solver_sample

                return dpm_solver_sample(
                    self._denoise_fn(params), self.sched, past, key, shape,
                    steps=node.get("DPM_STEPS", 20), history=history,
                )
            if node.SAMPLER == "Distilled":
                # Few-step sampler for progressively-distilled students
                # (train/distiller.py).  Deterministic by construction;
                # guidance would push x off the trajectory the student was
                # trained to jump along, so it is rejected rather than
                # silently ignored.
                if node.GUIDANCE not in ("None", None):
                    raise ValueError(
                        "the Distilled sampler is guidance-free; trained "
                        f"trajectories ignore GUIDANCE={node.GUIDANCE!r}"
                    )
                if float(node.get("CFG_SCALE", 1.0)) != 1.0:
                    raise ValueError(
                        "the Distilled sampler is guidance-free; a CFG-"
                        "scaled denoiser would push x off the trajectory "
                        f"the student was trained on (CFG_SCALE="
                        f"{node.CFG_SCALE})"
                    )
                from crowdmod_tpu.models.diffusion import distilled_sample

                return distilled_sample(
                    self._denoise_fn(params), self.sched, past, key, shape,
                    node.get("DISTILL_STEPS", 8),
                    eta=float(node.get("DISTILL_ETA", 0.0)),
                    history=history,
                )
            if node.SAMPLER != "DDPM":
                raise ValueError(f"unknown DDPM sampler {node.SAMPLER!r}")
            return ddpm_sample(
                self._denoise_fn(params), self.sched, past, key, shape,
                guidance=node.GUIDANCE,
                lambda_guidance=node.get("LAMBDA_GUIDANCE", 0.0),
                history=history,
            )

        if self.family == "FM":
            node = cfg.MODEL.FM
            try:
                integrator = INTEGRATORS[node.INTEGRATOR]
            except KeyError:
                raise ValueError(
                    f"unknown integrator {node.INTEGRATOR!r}; "
                    f"expected {list(INTEGRATORS)}"
                )
            steps = getattr(node.INTEGRATOR_STEPS, node.INTEGRATOR.upper())
            return integrator(
                self._denoise_fn(params), past, key, shape,
                steps=steps, time_max_pos=node.TIME_MAX_POS,
            )

        # ConvRNN: deterministic rollout; exp() the log-space channels
        # (reference convRNN.py:223-231).
        pred = self.model.apply(
            self._sample_params() if params is None else params,
            past, future_len=f, teacher_forcing=False,
        )
        out = pred
        for chd in (0, 3):
            if chd < self.mprops_count:
                out = out.at[..., chd].set(jnp.exp(pred[..., chd]))
        return out

    def select_past(
        self,
        past: jnp.ndarray,
        future: jnp.ndarray,
        nsamples: int,
        key,
        *,
        same_past: bool = False,
        chunk: int = 1,
    ):
        """Sampling-protocol index selection (ddpm.py:295-318, 358-366)."""
        idx = self.select_ids(
            past.shape[0], nsamples, key, same_past=same_past, chunk=chunk
        )
        return past[idx], future[idx], idx

    @staticmethod
    def select_ids(
        n: int,
        nsamples: int,
        key,
        *,
        same_past: bool = False,
        chunk: int = 1,
    ) -> jnp.ndarray:
        """Window-id selection for the sampling protocol — O(nsamples)
        int32, so callers with a large test set can gather only the chosen
        windows instead of materializing every window on device."""
        idx = jax.random.permutation(key, n)[: min(nsamples, n)]
        if same_past:
            idx = jnp.full_like(idx, idx[0])
        if chunk > 1:
            idx = jnp.repeat(idx, chunk)
        if idx.shape[0] < nsamples:
            # Wrap around so the selection is ALWAYS exactly nsamples rows —
            # a ragged source batch must not change the sampler's compiled
            # shape (VERDICT round-1 item 7).
            reps = -(-nsamples // idx.shape[0])
            idx = jnp.tile(idx, reps)
        return idx[:nsamples]

    # ------------------------------------------------------------------
    # Metrics
    # ------------------------------------------------------------------
    def generate_metrics(
        self,
        test_ds: WindowDataset,
        *,
        metric: str = "ALL",
        chunk: int = 20,
        batches_to_use: int = 1,
        output_dir: str | None = None,
        epoch_tag: str | int = "000",
        seed: int = 42,
    ):
        """Repeated-past sampling + metric suite (reference
        generate_metrics.py:40-69, ddpm.py:336-392)."""
        cfg = self.cfg
        samples_per_batch = cfg.DATASET.BATCH_SIZE * chunk
        key = jax.random.PRNGKey(seed)
        preds, gts = [], []
        # drop_last mirrors the reference's test DataLoader; with fewer
        # windows than one batch the single partial batch is kept and
        # select_past upsamples it to the fixed samples_per_batch.
        drop_last = len(test_ds) >= samples_per_batch
        for b, batch in enumerate(
            test_ds.batches(
                samples_per_batch, shuffle=False, drop_last=drop_last
            )
        ):
            if b >= batches_to_use:
                break
            past, future = batch
            key, ksel, ksamp = jax.random.split(key, 3)
            past_s, future_s, _ = self.select_past(
                past, future, samples_per_batch, ksel, chunk=chunk
            )
            out = self.sample(past_s, ksamp)
            if jax.process_count() > 1:
                # Multi-process protocol: every host fed the identical
                # selection, the mesh sampler sharded it over the global
                # data axis, and the result is a non-fully-addressable
                # global array — gather it back to host-local numpy so the
                # metric suite (eager jnp) runs identically on every
                # process (process 0 owns the file writes, cli layer).
                from crowdmod_tpu.parallel import multiprocess

                out = jnp.asarray(multiprocess.process_allgather(out))
            preds.append(out)
            gts.append(future_s)

        pred = jnp.concatenate(preds)[..., :3]
        gt = jnp.concatenate(gts)[..., :3]
        engine = MetricsEngine(
            pred, gt, cfg.METRICS,
            output_dir=output_dir or self.run_dir,
            past_len=cfg.DATASET.PAST_LEN,
        )
        title = (
            f"{cfg.DATASET.BATCH_SIZE * chunk * batches_to_use} samples in "
            f"total (BS:{cfg.DATASET.BATCH_SIZE}, Rep:{chunk}, "
            f"TB:{batches_to_use})-({self.arch})"
        )
        return compute_metrics(
            engine, metric, chunk,
            eps=cfg.MACROPROPS.EPS,
            run_tag=ckpt.run_tag(cfg, self.arch, epoch_tag),
            title=title,
            samples_per_batch=samples_per_batch,
        )
