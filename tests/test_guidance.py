import jax
import jax.numpy as jnp
import numpy as np
import pytest

from crowdmod_tpu.models.guidance import (
    continuity_energy,
    mass_preservation_gradient,
    mass_preservation_gradient_fd,
    sparsity_gradient,
)


def test_sparsity_gradient_touches_only_rho():
    x = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 5, 3))
    g = sparsity_gradient(x)
    np.testing.assert_array_equal(g[..., 0], jnp.sign(x[..., 0]))
    assert float(jnp.abs(g[..., 1:]).max()) == 0.0


def test_continuity_energy_zero_for_static_uniform():
    """A time-constant field with zero velocity has zero residual energy."""
    x = jnp.zeros((2, 4, 6, 8, 3)).at[..., 0].set(2.0)
    e = continuity_energy(x)
    np.testing.assert_allclose(e, 0.0, atol=1e-6)


def test_continuity_energy_positive_for_mass_violation():
    """Density appearing from nowhere (no flux) must cost energy."""
    x = jnp.zeros((1, 4, 6, 8, 3))
    x = x.at[:, 2:, 3, 4, 0].set(5.0)  # mass appears at t=2 with zero velocity
    assert float(continuity_energy(x)[0]) > 0.0


@pytest.mark.parametrize("seed", [0, 1])
def test_analytic_gradient_matches_finite_difference(seed):
    """The jax.grad path reproduces the reference's numerical scheme
    (guidance.py:44-69) up to O(eps) forward-difference error."""
    x = jax.random.normal(jax.random.PRNGKey(seed), (2, 3, 4, 5, 3)) * 0.5
    g_exact = mass_preservation_gradient(x, 0.5, 1.0)
    g_fd = mass_preservation_gradient_fd(x, 0.5, 1.0, eps=1e-3)
    np.testing.assert_allclose(np.asarray(g_fd), np.asarray(g_exact), atol=5e-3)
