"""Full reverse-chain parity: 20 denoising steps, torch vs jax, same noise.

Drives the complete ancestral chain (denoiser-in-the-loop) on both sides
with identical injected z-noise and the weight-mapped UNet from
tests/test_unet_torch_parity.py.  20 chained model evaluations amplify any
numeric divergence; agreement here means whole sampled sequences match the
reference, not just single ops.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REFERENCE = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REFERENCE), reason="reference repo not mounted"
)
torch = pytest.importorskip("torch")
if REFERENCE not in sys.path:
    sys.path.insert(0, REFERENCE)

from tests.test_unet_torch_parity import C, build_models, map_params


def test_reverse_chain_parity():
    from models.diffusion.forward import ForwardSampler

    from crowdmod_tpu.core.schedule import linear_schedule

    T = 20
    ref_unet, ours = build_models()
    params = map_params(ref_unet)
    sched_ref = ForwardSampler(timesteps=T, scale=0.5)
    sched = linear_schedule(T, scale=0.5)

    b, p, f, h, w = 2, 5, 3, 8, 12
    rng = np.random.default_rng(0)
    past_ref = rng.normal(size=(b, C, h, w, p)).astype(np.float32)
    x0 = rng.normal(size=(b, C, h, w, f)).astype(np.float32)
    zs = rng.normal(size=(T, b, C, h, w, f)).astype(np.float32)

    # Torch chain (the verified DDPM.step formula over ForwardSampler
    # buffers, with injected z).
    x_t = torch.tensor(x0)
    past_t = torch.tensor(past_ref)
    with torch.no_grad():
        for t in reversed(range(T)):
            tt = torch.full((b,), t, dtype=torch.long)
            eps = ref_unet(x_t, tt, past_t)
            z = torch.tensor(zs[t]) if t > 0 else torch.zeros_like(x_t)
            beta = sched_ref.beta[t]
            x_t = (
                sched_ref.one_by_sqrt_alpha[t]
                * (x_t - beta / sched_ref.sqrt_one_minus_alpha_bar[t] * eps)
                + torch.sqrt(beta) * z
            )
    out_ref = x_t.numpy()

    # JAX chain with the same z sequence through the mapped flax UNet.
    to_native = lambda a: jnp.transpose(jnp.asarray(a), (0, 4, 2, 3, 1))
    x = to_native(x0)
    past = to_native(past_ref)
    zs_native = jnp.asarray(np.transpose(zs, (0, 1, 5, 3, 4, 2)))

    @jax.jit
    def chain(x, past, zs_native):
        def body(x, t):
            t_vec = jnp.full((b,), t, dtype=jnp.int32)
            eps = ours.apply(params, x, t_vec, past)
            z = jnp.where(t > 0, zs_native[t], jnp.zeros_like(x))
            beta = sched.beta[t]
            x = (
                sched.one_by_sqrt_alpha[t]
                * (x - beta / sched.sqrt_one_minus_alpha_bar[t] * eps)
                + jnp.sqrt(beta) * z
            )
            return x, None

        x, _ = jax.lax.scan(body, x, jnp.arange(T - 1, -1, -1))
        return x

    out = chain(x, past, zs_native)
    out_ref_native = np.transpose(out_ref, (0, 4, 2, 3, 1))
    np.testing.assert_allclose(
        np.asarray(out), out_ref_native, atol=5e-4,
        err_msg="20-step reverse chains diverge between torch and jax",
    )


def test_fm_integrator_chain_parity():
    """Euler and Heun integration chains (deterministic — no per-step noise)
    through the mapped UNet must match a torch transcription of the
    reference's integrators (flow_matching.py:203-250), including the
    time-index clamp and Heun's +1 embedding offset."""
    ref_unet, ours = build_models()
    params = map_params(ref_unet)

    b, p, f, h, w = 2, 5, 3, 8, 12
    steps, tmax = 10, 100
    rng = np.random.default_rng(3)
    past_ref = rng.normal(size=(b, C, h, w, p)).astype(np.float32)
    to_native = lambda a: jnp.transpose(jnp.asarray(a), (0, 4, 2, 3, 1))
    past = to_native(past_ref)
    past_t = torch.tensor(past_ref)

    from crowdmod_tpu.models.flow_matching import euler_sample, heun_sample

    key = jax.random.PRNGKey(11)
    shape = (b, f, h, w, C)
    x0 = np.asarray(jax.random.normal(key, shape, jnp.float32))
    x0_ref = np.transpose(x0, (0, 4, 2, 3, 1))  # → (B, C, H, W, F)

    # --- Euler (reference :214-222 transcription) ---
    delta = 1.0 / steps
    xt = torch.tensor(x0_ref)
    with torch.no_grad():
        for t in torch.linspace(0, 1, steps):
            ti = (t * tmax).clamp(0, tmax - 1).long().expand(b)
            u = ref_unet(xt, ti, past_t)
            xt = xt + delta * u
    ref_euler = np.transpose(xt.numpy(), (0, 4, 2, 3, 1))

    denoise = lambda x, t, c: ours.apply(params, x, t, c)
    out = euler_sample(denoise, past, key, shape, steps=steps,
                       time_max_pos=tmax)
    np.testing.assert_allclose(np.asarray(out), ref_euler, atol=5e-4)

    # --- Heun (reference :227-250 transcription) ---
    xt = torch.tensor(x0_ref)
    with torch.no_grad():
        for t in torch.linspace(0, 1, steps):
            ti = (t * tmax).clamp(0, tmax - 1).long().expand(b)
            k1 = ref_unet(xt, ti, past_t)
            k2 = ref_unet(xt + delta * k1, ti + 1, past_t)
            xt = xt + 0.5 * delta * (k1 + k2)
    ref_heun = np.transpose(xt.numpy(), (0, 4, 2, 3, 1))

    out = heun_sample(denoise, past, key, shape, steps=steps,
                      time_max_pos=tmax)
    np.testing.assert_allclose(np.asarray(out), ref_heun, atol=5e-4)


def _analytic_eps_np(x, t, T):
    """A layout-free ε-model both sides can evaluate identically."""
    return 0.1 * np.tanh(x) + 0.3 * np.sin(t / T)


def test_production_ddpm_sample_matches_reference_formula():
    """Drives the PRODUCTION ddpm_sample (fused-update path) and checks it
    against the reference's DDPM.step formula over ForwardSampler buffers,
    consuming the exact noise stream the sampler derives from its key —
    the chain tests above hand-code the update, this one does not."""
    from models.diffusion.forward import ForwardSampler

    from crowdmod_tpu.core.schedule import linear_schedule
    from crowdmod_tpu.models.diffusion import ddpm_sample

    T = 20
    sched = linear_schedule(T, scale=0.5)
    shape = (2, 3, 4, 6, 3)

    def denoise(x, t, c):
        return 0.1 * jnp.tanh(x) + 0.3 * jnp.sin(
            (t / T).reshape(-1, 1, 1, 1, 1)
        )

    key = jax.random.PRNGKey(42)
    out = np.asarray(ddpm_sample(denoise, sched, None, key, shape))

    ref = ForwardSampler(timesteps=T, scale=0.5)
    k_init, k_loop = jax.random.split(key)
    x = np.asarray(jax.random.normal(k_init, shape, dtype=jnp.float32))
    for t in reversed(range(T)):
        eps = _analytic_eps_np(x, t, T)
        if t > 0:
            z = np.asarray(jax.random.normal(
                jax.random.fold_in(k_loop, t), shape, dtype=jnp.float32
            ))
        else:
            z = np.zeros(shape, np.float32)
        beta = float(ref.beta[t])
        x = float(ref.one_by_sqrt_alpha[t]) * (
            x - beta / float(ref.sqrt_one_minus_alpha_bar[t]) * eps
        ) + np.sqrt(beta) * z
    np.testing.assert_allclose(out, x, rtol=3e-4, atol=3e-4)


def test_production_ddim_sample_matches_reference_formula():
    """Same oracle pattern for the production ddim_sample: the reference's
    Eq. 12 recurrence (ddpm.py:238-282) in numpy over ForwardSampler
    buffers, including the carried previous-step coefficients."""
    from models.diffusion.forward import ForwardSampler

    from crowdmod_tpu.core.schedule import ddim_tau_schedule, linear_schedule
    from crowdmod_tpu.models.diffusion import ddim_sample

    T = 20
    sched = linear_schedule(T, scale=0.5)
    shape = (2, 3, 4, 6, 3)
    taus = ddim_tau_schedule(T, 3)

    def denoise(x, t, c):
        return 0.1 * jnp.tanh(x) + 0.3 * jnp.sin(
            (t / T).reshape(-1, 1, 1, 1, 1)
        )

    for sigma in (0.0, 0.2):  # deterministic Eq. 12 AND the noise path
        key = jax.random.PRNGKey(7)
        out = np.asarray(ddim_sample(
            denoise, sched, None, key, shape, taus=taus, sigma=sigma
        ))

        ref = ForwardSampler(timesteps=T, scale=0.5)
        k_init, k_loop = jax.random.split(key)
        x = np.asarray(jax.random.normal(k_init, shape, dtype=jnp.float32))
        sab_c = float(ref.sqrt_alpha_bar[T - 1])
        somab_c = float(ref.sqrt_one_minus_alpha_bar[T - 1])
        for t in np.asarray(taus)[::-1]:
            eps = _analytic_eps_np(x, int(t), T)
            sab_p = float(ref.sqrt_alpha_bar[int(t)])
            somab_p = float(ref.sqrt_one_minus_alpha_bar[int(t)])
            pred_x0 = (x - somab_c * eps) / sab_c
            direction = np.sqrt(1.0 - sab_p**2 - sigma**2) * eps
            z = np.asarray(jax.random.normal(
                jax.random.fold_in(k_loop, int(t)), shape, dtype=jnp.float32
            ))
            x = sab_p * pred_x0 + direction + sigma * z
            sab_c, somab_c = sab_p, somab_p
        np.testing.assert_allclose(out, x, rtol=3e-4, atol=3e-4)
