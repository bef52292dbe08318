"""Noise schedules and forward diffusion.

Cosine beta schedule per the reference formula (ref: src/model/DiTTO.py:96-104):
  alphas_cumprod(x) = cos^2(((x/T)+s)/(1+s) * pi/2) normalized at 0,
  betas = 1 - cumprod ratio, clipped to [1e-4, 0.9999].

Reference quirk #1 (SURVEY §2.10): the reference registers these *betas* under
the name ``alphas_cumprod`` and trains q_sample against them, i.e. training
noising is sqrt(beta_t)*x0 + sqrt(1-beta_t)*eps — inverted vs the sampler's
assumption. ``NoiseSchedule`` exposes both:

  * ``q_sample(...)``                — correct forward process (default)
  * ``q_sample(..., ref_compat=True)`` — the reference's inverted noising

The sampler side always uses the correct betas→alphas→cumprod recomputation
(which is also what the reference's SpeechGenerator does at
SpeechGenerator.py:70-72).
"""

from __future__ import annotations

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp


def cosine_beta_schedule(timesteps: int, s: float = 0.008) -> np.ndarray:
    """Cosine schedule betas, computed in float64 then cast (stable tail)."""
    x = np.linspace(0, timesteps, timesteps + 1, dtype=np.float64)
    ac = np.cos(((x / timesteps) + s) / (1 + s) * np.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1.0 - (ac[1:] / ac[:-1])
    return np.clip(betas, 0.0001, 0.9999).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class NoiseSchedule:
    betas: jnp.ndarray            # [T]
    alphas: jnp.ndarray           # [T]
    alphas_cumprod: jnp.ndarray   # [T]

    @classmethod
    def cosine(cls, timesteps: int, s: float = 0.008) -> "NoiseSchedule":
        betas = jnp.asarray(cosine_beta_schedule(timesteps, s))
        alphas = 1.0 - betas
        return cls(betas=betas, alphas=alphas,
                   alphas_cumprod=jnp.cumprod(alphas))

    @property
    def num_steps(self) -> int:
        return self.betas.shape[0]


def q_sample(schedule: NoiseSchedule, x_start, t, noise, *,
             ref_compat: bool = False):
    """Forward diffusion x_t ~ q(x_t | x_0).

    t: [B] int; x_start/noise: [B, ...]. With ``ref_compat``, reproduces the
    reference's inverted noising (betas used as if they were alpha-bar,
    ref: DiTTO.py:106-126 + buffer registration at DiTTO.py:63-64).
    """
    coef = schedule.betas if ref_compat else schedule.alphas_cumprod
    c = coef[t].reshape((-1,) + (1,) * (x_start.ndim - 1))
    return jnp.sqrt(c) * x_start + jnp.sqrt(1.0 - c) * noise
