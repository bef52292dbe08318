"""Reverse-diffusion samplers as ``lax.scan`` loops.

The DDPM ancestral update matches the reference sampler exactly
(ref: src/model/SpeechGenerator.py:130-147 __p_sample):

  x_prev = (1/sqrt(a_t)) * (x - (1-a_t)/sqrt(1-abar_t) * eps_hat)
           + [t > 0] * sqrt(b_t) * z,   z ~ N(0, I)

with betas/alphas/alphas_cumprod recomputed correctly from the cosine
schedule (ref: SpeechGenerator.py:70-72). Step count is a parameter
(ref ran 1000; the north-star metric path is 50): for K < T the timestep
subsequence is strided and per-step betas are re-derived from the cumprod
ratio, so K=T reproduces the reference sweep bit-for-bit.

TPU notes: the whole K-step loop runs on-device in one jit region via
``lax.scan`` — no host round-trips between steps; x is carried in registers/
HBM and donated by callers. Noise is drawn inside the scan from a folded key
(deterministic in the base key), or can be supplied precomputed for
bit-matching against recorded reference noise.
"""

from __future__ import annotations

from typing import Callable, Optional

import numpy as np
import jax
import jax.numpy as jnp

from .schedule import NoiseSchedule


def respaced_timesteps(num_train_steps: int, num_sample_steps: int) -> np.ndarray:
    """Descending timestep subsequence, evenly strided, always ending at 0.

    For num_sample_steps == num_train_steps this is T-1, ..., 1, 0 — the
    reference's full sweep (SpeechGenerator.py:161).
    """
    assert 1 <= num_sample_steps <= num_train_steps
    taus = np.linspace(0, num_train_steps - 1, num_sample_steps)
    taus = np.unique(np.round(taus).astype(np.int64))
    return taus[::-1].copy()


def _respaced_coeffs(schedule: NoiseSchedule, timesteps: np.ndarray):
    """Per-step (abar_t, abar_prev, beta_t, alpha_t) for a descending tau."""
    ac = schedule.alphas_cumprod
    taus = jnp.asarray(timesteps, jnp.int32)
    abar = ac[taus]
    # previous (less-noisy) cumprod: abar at the next tau in descending order,
    # with abar_prev = 1 after the final (t=0) step.
    abar_prev = jnp.concatenate([ac[taus[1:]], jnp.ones((1,), ac.dtype)])
    beta = 1.0 - abar / abar_prev
    alpha = 1.0 - beta
    return taus, abar, abar_prev, beta, alpha


def to_eps(pred, x, abar_t, prediction_type: str):
    """Convert a model output under any target parameterization to the
    implied eps given x_t (x = sqrt(ab) x0 + sqrt(1-ab) eps):

      eps: pred IS eps
      x0:  eps = (x - sqrt(ab) pred) / sqrt(1-ab)
      v:   v = sqrt(ab) eps - sqrt(1-ab) x0  =>  eps = sqrt(1-ab) x
                                                      + sqrt(ab) v
    """
    if prediction_type == "eps":
        return pred
    if prediction_type == "x0":
        return (x - jnp.sqrt(abar_t) * pred) / jnp.sqrt(1.0 - abar_t)
    if prediction_type == "v":
        return jnp.sqrt(1.0 - abar_t) * x + jnp.sqrt(abar_t) * pred
    raise ValueError(f"unknown prediction_type {prediction_type!r}")


def _clip_eps(x, eps, abar_t, clip: float):
    """Clamp the implied denoised sample x0_hat to [-clip, clip] and return
    the equivalent eps (standard DDPM 'clip_denoised' stabilizer, Ho et al.
    2020 §3.3 — the reference sampler has no counterpart, so residual
    eps-prediction error is amplified by 1/sqrt(alpha_t) ~ 100x at the
    first reverse steps and trajectories leave the data manifold; see
    SpeechGenerator.py:130-147)."""
    x0_hat = (x - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
    x0_hat = jnp.clip(x0_hat, -clip, clip)
    return (x - jnp.sqrt(abar_t) * x0_hat) / jnp.sqrt(1.0 - abar_t)


def ddpm_sample(
    model_fn: Callable,
    key: jax.Array,
    x_init: jnp.ndarray,
    schedule: NoiseSchedule,
    timesteps: np.ndarray,
    noise_seq: Optional[jnp.ndarray] = None,
    clip_denoised: Optional[float] = None,
    prediction_type: str = "eps",
):
    """DDPM ancestral sampling.

    model_fn(x, t) -> model output (eps_hat under the default
    parameterization; see ``to_eps``) with t: [B] int32 (original timestep
    index).
    x_init: [B, ...] starting noise (or noised prompt latents).
    noise_seq: optional [K, B, ...] pre-drawn noise for bit-matching.
    clip_denoised: optional bound on the implied x0_hat per step (see
    ``_clip_eps``); None reproduces the reference exactly.
    """
    taus, abar, _, beta, alpha = _respaced_coeffs(schedule, timesteps)
    batch = x_init.shape[0]
    k = taus.shape[0]

    def body(x, inp):
        i, t, abar_t, beta_t, alpha_t = inp
        t_vec = jnp.full((batch,), t, jnp.int32)
        eps = to_eps(model_fn(x, t_vec), x, abar_t, prediction_type)
        if clip_denoised is not None:
            eps = _clip_eps(x, eps, abar_t, clip_denoised)
        mean = (x - (1.0 - alpha_t) / jnp.sqrt(1.0 - abar_t) * eps) \
            / jnp.sqrt(alpha_t)
        if noise_seq is None:
            z = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
        else:
            z = noise_seq[i]
        nonzero = (t > 0).astype(x.dtype)
        x = mean + nonzero * jnp.sqrt(beta_t) * z
        return x, None

    xs = (jnp.arange(k, dtype=jnp.int32), taus, abar, beta, alpha)
    x_final, _ = jax.lax.scan(body, x_init, xs)
    return x_final


def ddim_sample(
    model_fn: Callable,
    key: jax.Array,
    x_init: jnp.ndarray,
    schedule: NoiseSchedule,
    timesteps: np.ndarray,
    eta: float = 0.0,
    clip_denoised: Optional[float] = None,
    prediction_type: str = "eps",
):
    """DDIM sampling (deterministic at eta=0) on a respaced schedule."""
    taus, abar, abar_prev, _, _ = _respaced_coeffs(schedule, timesteps)
    batch = x_init.shape[0]
    k = taus.shape[0]

    def body(x, inp):
        i, t, abar_t, abar_p = inp
        t_vec = jnp.full((batch,), t, jnp.int32)
        eps = to_eps(model_fn(x, t_vec), x, abar_t, prediction_type)
        x0 = (x - jnp.sqrt(1.0 - abar_t) * eps) / jnp.sqrt(abar_t)
        if clip_denoised is not None:
            x0 = jnp.clip(x0, -clip_denoised, clip_denoised)
            eps = (x - jnp.sqrt(abar_t) * x0) / jnp.sqrt(1.0 - abar_t)
        sigma = eta * jnp.sqrt((1.0 - abar_p) / (1.0 - abar_t)) \
            * jnp.sqrt(1.0 - abar_t / abar_p)
        dir_xt = jnp.sqrt(jnp.maximum(1.0 - abar_p - sigma ** 2, 0.0)) * eps
        z = jax.random.normal(jax.random.fold_in(key, i), x.shape, x.dtype)
        nonzero = (t > 0).astype(x.dtype)
        x = jnp.sqrt(abar_p) * x0 + dir_xt + nonzero * sigma * z
        return x, None

    xs = (jnp.arange(k, dtype=jnp.int32), taus, abar, abar_prev)
    x_final, _ = jax.lax.scan(body, x_init, xs)
    return x_final
