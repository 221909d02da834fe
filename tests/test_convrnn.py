"""ConvRNN cells / encoder–forecaster / composite-loss tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.data.synthetic import synthetic_walkers
from crowdmod_tpu.models.convrnn import (
    ConvGRUCell,
    ConvLSTMCell,
    Forecaster,
    convrnn_loss,
    kl_poisson_loss,
)
from crowdmod_tpu.models.convrnn.cells import init_state
from crowdmod_tpu.train.optim import adam_with_plateau
from crowdmod_tpu.train.state import TrainState, make_train_step

B, P, F, H, W, C = 2, 5, 3, 8, 12, 4

SMALL = dict(
    out_channels=C,
    enc_hidden_channels=(8, 16, 16, 16, 16, 16),
    forc_hidden_channels=(16, 16, 16, 16, 16, 16, 8),
    enc_kernels=(3, 3, 3, 3, 3, 3),
    forc_kernels=(3, 4, 3, 4, 3, 3, 3),
)


@pytest.mark.parametrize("cell_cls", [ConvGRUCell, ConvLSTMCell])
def test_cells_step_and_state(cell_cls):
    cell = cell_cls(hidden_channels=8)
    x = jax.random.normal(jax.random.PRNGKey(0), (B, H, W, 4))
    state = init_state(B, H, W, 8)
    params = cell.init(jax.random.PRNGKey(1), x, state)
    h, (h2, c2) = cell.apply(params, x, state)
    assert h.shape == (B, H, W, 8)
    np.testing.assert_array_equal(h, h2)
    # A second step with the new state must differ (recurrence is live).
    h3, _ = cell.apply(params, x, (h2, c2))
    assert float(jnp.max(jnp.abs(h3 - h))) > 0


@pytest.mark.parametrize("cell_cls", [ConvGRUCell, ConvLSTMCell])
@pytest.mark.parametrize("teacher_forcing", [False, True])
def test_forecaster_shapes(cell_cls, teacher_forcing):
    model = Forecaster(cell=cell_cls, **SMALL)
    past = jax.random.normal(jax.random.PRNGKey(0), (B, P, H, W, C))
    target = jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (B, F, H, W, C)))
    params = model.init(
        jax.random.PRNGKey(2), past, target=target,
        teacher_forcing=teacher_forcing,
    )
    out = model.apply(
        params, past, target=target, teacher_forcing=teacher_forcing
    )
    assert out.shape == (B, F, H, W, C)
    assert bool(jnp.all(jnp.isfinite(out)))


def test_forecaster_validates_shared_slots():
    bad = dict(SMALL, enc_hidden_channels=(8, 32, 16, 16, 16, 16))
    model = Forecaster(**bad)
    past = jnp.zeros((B, P, H, W, C))
    with pytest.raises(ValueError, match="shared state slots"):
        model.init(jax.random.PRNGKey(0), past, future_len=F)


def test_kl_poisson_zero_at_match():
    rho = jnp.asarray([0.5, 1.0, 4.0])
    np.testing.assert_allclose(kl_poisson_loss(rho, rho), 0.0, atol=1e-7)
    assert float(kl_poisson_loss(jnp.asarray(2.0), jnp.asarray(1.0))) > 0


def test_convrnn_loss_terms():
    pred = jnp.zeros((B, F, H, W, 4))  # log-space: rho_hat = exp(0) = 1
    target = jnp.zeros((B, F, H, W, 4)).at[..., 0].set(1.0).at[..., 3].set(1.0)
    rloss, vloss, occ, emp = convrnn_loss(pred, target)
    # rho matches exactly (exp(0)=1 == gt 1) → zero KL.
    np.testing.assert_allclose(float(rloss), 0.0, atol=1e-5)
    # All cells occupied → empty term is ~0; the occupied-velocity MSE is 0
    # too (pred and target velocities both all-zero).
    assert float(emp) < 1e-6
    assert float(occ) < 1e-6
    assert np.isfinite(float(vloss))


def test_convrnn_training_reduces_loss():
    model = Forecaster(**SMALL)
    data = jnp.asarray(synthetic_walkers(4, H, W, P + F))
    data = jnp.concatenate(  # add a sigma2 channel
        [data, jnp.zeros(data.shape[:-1] + (1,))], axis=-1
    )
    past, future = data[:, :P], data[:, P:]
    params = model.init(jax.random.PRNGKey(0), past, target=future,
                        teacher_forcing=True)

    def loss_fn(p, batch, key):
        past_b, future_b = batch
        pred = model.apply(p, past_b, target=future_b, teacher_forcing=True)
        rloss, vloss, _, _ = convrnn_loss(pred, future_b)
        return rloss + vloss

    state = TrainState.create(
        params, adam_with_plateau(3e-3, (0.9, 0.999), amsgrad=True)
    )
    step = make_train_step(loss_fn, donate=False)
    losses = []
    for i in range(25):
        state, loss = step(state, (past, future), jax.random.PRNGKey(i))
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-5:]) < np.mean(losses[:5])


def test_factory_builds_convrnn(atc_cfg):
    from crowdmod_tpu.models.factory import build_backbone

    model = build_backbone(atc_cfg, "ConvRNN", 4)
    past = jnp.zeros((1, P, 12, 36, 4))
    params = model.init(jax.random.PRNGKey(0), past, future_len=F)
    out = model.apply(params, past, future_len=F)
    assert out.shape == (1, F, 12, 36, 4)
