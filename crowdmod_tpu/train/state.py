"""Train state pytree and the jitted update-step factory.

One train step = sample t / noise, forward, MSE, backward, Adam update — the
entire reference hot loop (ddpm.py:111-144) as a single jitted, donated
function.  The factory takes an arbitrary per-example loss closure so the same
machinery drives DDPM, flow-matching, and ConvRNN training.
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from flax import struct


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    opt_state: Any
    tx: optax.GradientTransformation = struct.field(pytree_node=False)
    # Exponential moving average of params (a production-standard diffusion
    # training feature the reference lacks).  ``None`` when disabled;
    # ``ema_decay`` is trace-static so the update compiles away when off.
    ema_params: Any = None
    ema_decay: float = struct.field(pytree_node=False, default=0.0)

    @classmethod
    def create(
        cls, params, tx: optax.GradientTransformation, *,
        ema_decay: float = 0.0,
    ) -> "TrainState":
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            opt_state=tx.init(params),
            tx=tx,
            # A real copy, not an alias: params and ema live in one donated
            # state pytree, and donating the same buffer twice is an error.
            ema_params=jax.tree.map(jnp.copy, params) if ema_decay else None,
            ema_decay=ema_decay,
        )

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        new_ema = self.ema_params
        if new_ema is not None:
            # Warmup schedule (tf.train.ExponentialMovingAverage's
            # ``num_updates`` form): early steps use a much smaller effective
            # decay so the average forgets the random initialization.  With a
            # flat decay d over n steps the init retains weight d^n — e.g.
            # 0.995^240 ≈ 0.30 of the EMA on a short run.
            t = self.step.astype(jnp.float32)
            d = jnp.minimum(self.ema_decay, (1.0 + t) / (10.0 + t))
            new_ema = jax.tree.map(
                lambda e, p: e * d + p.astype(e.dtype) * (1.0 - d),
                new_ema, new_params,
            )
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            ema_params=new_ema,
        )


LossFn = Callable[..., jnp.ndarray]
# loss_fn(params, batch, key) -> scalar loss


def state_shardings(state: TrainState, mesh):
    """(state-sharding pytree, replicated-scalar sharding) for pinning a
    train/epoch step's ``out_shardings`` under a mesh.

    Without the pin, jit's sharding propagation is free to re-shard the
    updated state (observed: replicated biases coming back data-sharded),
    which drifts the params away from the intended TP/FSDP layout and
    forces a recompile on the next step whose input shardings changed.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    def shard_of(x):
        # Leaves created eagerly off-mesh (e.g. the step counter's
        # SingleDeviceSharding) are pinned replicated on the mesh.
        s = x.sharding
        return s if isinstance(s, NamedSharding) else NamedSharding(mesh, P())

    return (
        jax.tree.map(shard_of, state),
        NamedSharding(mesh, P()),
    )


def make_train_step(loss_fn: LossFn, donate: bool = True,
                    out_shardings=None):
    """Build a jitted ``(state, batch, key) -> (state, loss)`` update step.

    The state is donated so parameter/optimizer buffers update in place on
    device (no extra HBM copies in the hot loop).  ``out_shardings`` (from
    :func:`state_shardings`) pins the updated state to its input layout
    under a mesh.
    """

    def step(state: TrainState, batch, key):
        loss, grads = jax.value_and_grad(loss_fn)(state.params, batch, key)
        return state.apply_gradients(grads), loss

    return jax.jit(step, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)


def make_epoch_step(loss_fn: LossFn, donate: bool = True,
                    out_shardings=None):
    """Build a jitted whole-epoch update: ``lax.scan`` of the train step over
    a leading batches axis.

    ``(state, batches, key) -> (state, per-batch losses)`` where every leaf of
    ``batches`` is stacked ``(n_batches, batch, ...)``.  One dispatch per
    epoch instead of one per batch — the Python-loop dispatch latency that
    dominates small-model training (SURVEY.md §3.1 hot loop) disappears.
    """

    def epoch(state: TrainState, batches, key):
        n = jax.tree.leaves(batches)[0].shape[0]
        keys = jax.random.split(key, n)

        def body(st, xs):
            batch, k = xs
            loss, grads = jax.value_and_grad(loss_fn)(st.params, batch, k)
            return st.apply_gradients(grads), loss

        return jax.lax.scan(body, state, (batches, keys))

    return jax.jit(epoch, donate_argnums=(0,) if donate else (),
                   out_shardings=out_shardings)
