"""Noise schedule + q_sample golden tests (oracle: the published formula,
recomputed independently with numpy float64; ref: DiTTO.py:96-126)."""

import numpy as np
import jax.numpy as jnp

from ditto_tts_tpu.diffusion.schedule import (NoiseSchedule,
                                              cosine_beta_schedule, q_sample)


def _oracle_betas(T, s=0.008):
    x = np.linspace(0, T, T + 1)
    ac = np.cos(((x / T) + s) / (1 + s) * np.pi / 2) ** 2
    ac = ac / ac[0]
    b = 1 - ac[1:] / ac[:-1]
    return np.clip(b, 0.0001, 0.9999)


def test_cosine_schedule_matches_formula():
    betas = cosine_beta_schedule(1000)
    np.testing.assert_allclose(betas, _oracle_betas(1000), rtol=1e-5)
    assert betas.min() >= 0.0001 and betas.max() <= 0.9999


def test_schedule_derived_quantities():
    sched = NoiseSchedule.cosine(100)
    np.testing.assert_allclose(np.asarray(sched.alphas),
                               1 - np.asarray(sched.betas), rtol=1e-7)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod),
                               np.cumprod(1 - np.asarray(sched.betas)),
                               rtol=1e-5)
    assert sched.num_steps == 100


def test_q_sample_correct_mode():
    sched = NoiseSchedule.cosine(10)
    x0 = jnp.ones((2, 3, 4))
    noise = 2 * jnp.ones((2, 3, 4))
    t = jnp.array([0, 9])
    out = np.asarray(q_sample(sched, x0, t, noise))
    ac = np.asarray(sched.alphas_cumprod)
    for i, ti in enumerate([0, 9]):
        want = np.sqrt(ac[ti]) * 1.0 + np.sqrt(1 - ac[ti]) * 2.0
        np.testing.assert_allclose(out[i], want, rtol=1e-6)


def test_q_sample_ref_compat_uses_betas():
    """Quirk #1: reference noising uses betas as if they were alpha-bar."""
    sched = NoiseSchedule.cosine(10)
    x0 = jnp.ones((1, 2, 2))
    noise = jnp.zeros((1, 2, 2))
    t = jnp.array([5])
    out = np.asarray(q_sample(sched, x0, t, noise, ref_compat=True))
    want = np.sqrt(np.asarray(sched.betas)[5])
    np.testing.assert_allclose(out, want, rtol=1e-6)
    # and it differs from the correct mode
    correct = np.asarray(q_sample(sched, x0, t, noise))
    assert not np.allclose(out, correct)
