"""Sampler tests: ancestral update vs a hand-rolled numpy loop, respacing,
determinism."""

import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.diffusion.sampler import (ddim_sample, ddpm_sample,
                                             respaced_timesteps)
from ditto_tts_tpu.diffusion.schedule import NoiseSchedule


def _zero_model(x, t):
    return jnp.zeros_like(x)


def _identity_eps_model(x, t):
    return 0.1 * x


def test_respaced_timesteps_full_sweep():
    taus = respaced_timesteps(10, 10)
    np.testing.assert_array_equal(taus, np.arange(9, -1, -1))


def test_respaced_timesteps_subset():
    taus = respaced_timesteps(1000, 50)
    assert len(taus) == 50
    assert taus[0] == 999 and taus[-1] == 0
    assert np.all(np.diff(taus) < 0)


def test_ddpm_matches_manual_loop():
    """Full-sweep ddpm_sample must equal a step-by-step manual implementation
    of the reference update (SpeechGenerator.py:130-147)."""
    T = 8
    sched = NoiseSchedule.cosine(T)
    key = jax.random.key(42)
    x0 = jax.random.normal(jax.random.key(7), (2, 4, 4))
    taus = respaced_timesteps(T, T)

    got = ddpm_sample(_identity_eps_model, key, x0, sched, taus)

    betas = np.asarray(sched.betas, np.float64)
    alphas = 1 - betas
    ac = np.cumprod(alphas)
    x = np.asarray(x0, np.float64)
    for i, t in enumerate(taus):
        eps = 0.1 * x
        mean = (x - (1 - alphas[t]) / np.sqrt(1 - ac[t]) * eps) \
            / np.sqrt(alphas[t])
        z = np.asarray(jax.random.normal(jax.random.fold_in(key, i),
                                         x0.shape), np.float64)
        x = mean + (1.0 if t > 0 else 0.0) * np.sqrt(betas[t]) * z
    np.testing.assert_allclose(np.asarray(got), x, rtol=1e-4, atol=1e-5)


def test_ddpm_deterministic_in_key():
    sched = NoiseSchedule.cosine(10)
    x0 = jax.random.normal(jax.random.key(1), (1, 8, 8))
    taus = respaced_timesteps(10, 5)
    a = ddpm_sample(_zero_model, jax.random.key(3), x0, sched, taus)
    b = ddpm_sample(_zero_model, jax.random.key(3), x0, sched, taus)
    c = ddpm_sample(_zero_model, jax.random.key(4), x0, sched, taus)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_ddpm_with_recorded_noise():
    """Pre-drawn noise path (for bit-matching vs reference runs)."""
    sched = NoiseSchedule.cosine(6)
    taus = respaced_timesteps(6, 6)
    x0 = jnp.ones((1, 2, 2))
    noise_seq = jnp.zeros((len(taus), 1, 2, 2))
    out = ddpm_sample(_zero_model, jax.random.key(0), x0, sched, taus,
                      noise_seq=noise_seq)
    # with eps_hat = 0 and z = 0: x accumulates only the 1/sqrt(alpha) scaling
    alphas = np.asarray(sched.alphas, np.float64)
    want = 1.0 / np.sqrt(np.prod(alphas))
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-5)


def test_ddim_eta0_deterministic_and_recovers_x0():
    """With a perfect eps model on pure-noise input, DDIM eta=0 should march
    deterministically; keys must not matter."""
    sched = NoiseSchedule.cosine(20)
    taus = respaced_timesteps(20, 10)
    x0 = jax.random.normal(jax.random.key(5), (1, 4, 4))
    a = ddim_sample(_zero_model, jax.random.key(0), x0, sched, taus, eta=0.0)
    b = ddim_sample(_zero_model, jax.random.key(9), x0, sched, taus, eta=0.0)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)
    # zero eps model: x0_pred = x/sqrt(abar) and final abar_prev = 1 => exact x0
    ac = np.asarray(sched.alphas_cumprod, np.float64)
    want = np.asarray(x0, np.float64) / np.sqrt(ac[taus[0]])
    np.testing.assert_allclose(np.asarray(a), want, rtol=1e-4)


def test_clip_denoised_contracts_with_oracle_model():
    """With the analytically optimal eps-predictor for a single data point,
    sampling contracts to x0 with or without clipping; with a PERTURBED
    predictor, the unclipped sampler amplifies the error ~1/sqrt(alpha_t)
    at the first reverse steps while clip_denoised keeps the trajectory on
    the data manifold (Ho et al. 2020 clip_denoised; no reference
    counterpart, SpeechGenerator.py:130-147)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from ditto_tts_tpu.diffusion.sampler import (ddpm_sample,
                                                 respaced_timesteps)
    from ditto_tts_tpu.diffusion.schedule import NoiseSchedule

    T = 50
    schedule = NoiseSchedule.cosine(T)
    taus = respaced_timesteps(T, T)
    x0 = jnp.asarray(np.random.default_rng(0)
                     .standard_normal((1, 16, 8)), jnp.float32)
    abar = schedule.alphas_cumprod

    def oracle(x, t, err=0.0):
        a = abar[t].reshape(-1, 1, 1)
        eps = (x - jnp.sqrt(a) * x0) / jnp.sqrt(1.0 - a)
        if err:
            eps = eps + err * jax.random.normal(
                jax.random.fold_in(jax.random.key(5), t[0]), eps.shape)
        return eps

    x_init = jax.random.normal(jax.random.key(1), x0.shape)
    exact = ddpm_sample(oracle, jax.random.key(2), x_init, schedule, taus)
    np.testing.assert_allclose(np.asarray(exact), np.asarray(x0),
                               atol=1e-5)
    exact_clip = ddpm_sample(oracle, jax.random.key(2), x_init, schedule,
                             taus, clip_denoised=4.0)
    np.testing.assert_allclose(np.asarray(exact_clip), np.asarray(x0),
                               atol=1e-5)

    # an uninformative predictor (eps_hat = 0): the unclipped update
    # multiplies x by prod(1/sqrt(alpha_t)) ~ 1/sqrt(abar_{T-1}) ~ 3e3,
    # while clipping bounds the implied x0_hat and keeps the trajectory
    # at data scale
    zero_model = lambda x, t: jnp.zeros_like(x)
    wild = ddpm_sample(zero_model, jax.random.key(2), x_init, schedule,
                       taus)
    tame = ddpm_sample(zero_model, jax.random.key(2), x_init, schedule,
                       taus, clip_denoised=4.0)
    scale_wild = float(jnp.abs(wild).max())
    scale_tame = float(jnp.abs(tame).max())
    assert scale_wild > 100.0, scale_wild
    assert scale_tame < 10.0, scale_tame
