"""Recorded-noise bridge tests: a torch-seeded reference-order run is
reproduced exactly by our sampler fed the recorded streams."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.diffusion.sampler import ddpm_sample, respaced_timesteps
from ditto_tts_tpu.diffusion.schedule import NoiseSchedule, q_sample
from ditto_tts_tpu.utils.torch_bridge import (record_reference_noise,
                                              torch_randn)


def test_torch_randn_deterministic():
    a = torch_randn((3, 4), seed=1)
    b = torch_randn((3, 4), seed=1)
    c = torch_randn((3, 4), seed=2)
    np.testing.assert_array_equal(a, b)
    assert not np.allclose(a, c)


def test_record_matches_manual_torch_order():
    rec = record_reference_noise((2, 3), num_steps=4, seed=7)
    g = torch.Generator()
    g.manual_seed(7)
    want_prompt = torch.randn(2, 3, generator=g).numpy()
    want_init = torch.randn(2, 3, generator=g).numpy()
    want_steps = np.stack(
        [torch.randn(2, 3, generator=g).numpy() for _ in range(4)])
    np.testing.assert_array_equal(rec["prompt_noise"], want_prompt)
    np.testing.assert_array_equal(rec["init_noise"], want_init)
    np.testing.assert_array_equal(rec["step_noise"], want_steps)


def test_end_to_end_bitmatch_with_recorded_noise():
    """Reference-order torch loop == our sampler on the recorded streams."""
    T = 8
    shape = (1, 4, 3)
    latents = np.random.default_rng(0).standard_normal(shape) \
        .astype(np.float32)
    rec = record_reference_noise(shape, T, seed=3)

    # torch-side reference-order loop (fp32, reference formulas)
    x_t = torch.linspace(0, T, T + 1)
    ac = torch.cos(((x_t / T) + 0.008) / 1.008 * torch.pi * 0.5) ** 2
    ac = ac / ac[0]
    betas = torch.clip(1 - ac[1:] / ac[:-1], 0.0001, 0.9999)
    alphas = 1 - betas
    acp = torch.cumprod(alphas, 0)

    x = torch.from_numpy(latents)
    bq = betas[T - 1]
    x = torch.sqrt(bq) * x + torch.sqrt(1 - bq) \
        * torch.from_numpy(rec["prompt_noise"])
    x = torch.from_numpy(rec["init_noise"])  # unconditional start
    for i, tv in enumerate(range(T - 1, -1, -1)):
        eps = 0.1 * torch.tanh(x)
        z = torch.from_numpy(rec["step_noise"][i])
        mask = 1.0 if tv > 0 else 0.0
        x = (1 / torch.sqrt(alphas[tv])) * (
            x - (1 - alphas[tv]) / torch.sqrt(1 - acp[tv]) * eps) \
            + mask * torch.sqrt(betas[tv]) * z
    want = x.numpy()

    sched = NoiseSchedule.cosine(T)

    def model_fn(v, t):
        return 0.1 * jnp.tanh(v)

    got = ddpm_sample(model_fn, jax.random.key(0),
                      jnp.asarray(rec["init_noise"]), sched,
                      respaced_timesteps(T, T),
                      noise_seq=jnp.asarray(rec["step_noise"]))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-6)
