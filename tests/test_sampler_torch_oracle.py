"""Full reverse-diffusion chain vs a torch oracle of the reference sampler.

Reproduces SpeechGenerator's exact math (ref: src/model/SpeechGenerator.py:
70-72 schedule recomputation, :106-108 prompt noising with the inverted
buffer, :130-147 ancestral update) in torch inside the test, then checks
our q_sample(ref_compat) + ddpm_sample with recorded noise match.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.diffusion.sampler import ddpm_sample, respaced_timesteps
from ditto_tts_tpu.diffusion.schedule import NoiseSchedule, q_sample

T = 20
SHAPE = (2, 6, 4)


def _torch_schedule(timesteps, s=0.008):
    x = torch.linspace(0, timesteps, timesteps + 1)
    ac = torch.cos(((x / timesteps) + s) / (1 + s) * torch.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = 1 - (ac[1:] / ac[:-1])
    return torch.clip(betas, 0.0001, 0.9999)


def _model(x, t_scalar):
    # deterministic pseudo-model shared by both sides: eps = tanh(x) * c(t)
    c = 0.05 + 0.01 * t_scalar
    return np.tanh(x) * c


def test_full_chain_matches_torch_oracle():
    rng = np.random.default_rng(0)
    latents = rng.standard_normal(SHAPE).astype(np.float32)
    prompt_noise = rng.standard_normal(SHAPE).astype(np.float32)
    step_noise = rng.standard_normal((T,) + SHAPE).astype(np.float32)

    # ---- torch oracle -----------------------------------------------------
    betas = _torch_schedule(T).double()
    alphas = 1.0 - betas
    ac = torch.cumprod(alphas, dim=0)

    x0 = torch.from_numpy(latents).double()
    # prompt noising at t=T-1 with the *inverted* buffer (quirk #1:
    # betas used as if they were alpha-bar)
    bq = betas[T - 1]
    x = torch.sqrt(bq) * x0 + torch.sqrt(1 - bq) \
        * torch.from_numpy(prompt_noise).double()

    for i, tv in enumerate(range(T - 1, -1, -1)):
        eps = torch.from_numpy(
            _model(x.numpy(), tv).astype(np.float64))
        beta_t, alpha_t, ac_t = betas[tv], alphas[tv], ac[tv]
        z = torch.from_numpy(step_noise[i]).double()
        mask = 1.0 if tv > 0 else 0.0
        x = (1 / torch.sqrt(alpha_t)) * (
            x - (1 - alpha_t) / torch.sqrt(1 - ac_t) * eps) \
            + mask * torch.sqrt(beta_t) * z
    want = x.numpy()

    # ---- ours -------------------------------------------------------------
    sched = NoiseSchedule.cosine(T)
    t_full = jnp.full((SHAPE[0],), T - 1, jnp.int32)
    noised = q_sample(sched, jnp.asarray(latents), t_full,
                      jnp.asarray(prompt_noise), ref_compat=True)

    def model_fn(x, t):
        return jnp.tanh(x) * (0.05 + 0.01 * t[0].astype(jnp.float32))

    taus = respaced_timesteps(T, T)
    got = ddpm_sample(model_fn, jax.random.key(0), noised, sched, taus,
                      noise_seq=jnp.asarray(step_noise))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


def test_schedule_matches_torch_recomputation():
    sched = NoiseSchedule.cosine(1000)
    betas_t = _torch_schedule(1000).numpy()
    # ours is computed in float64 then cast; torch's linspace/cos chain is
    # fp32 — agreement is to fp32 round-off, not bit-exact
    np.testing.assert_allclose(np.asarray(sched.betas), betas_t, rtol=2e-3,
                               atol=1e-7)
    ac_t = np.cumprod(1 - betas_t)
    np.testing.assert_allclose(np.asarray(sched.alphas_cumprod), ac_t,
                               rtol=2e-3, atol=1e-7)
