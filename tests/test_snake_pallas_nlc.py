"""Channels-last fused Pallas snake vs the composed/polyphase oracles
(interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.ops.snake import (anti_aliased_activation,
                                     polyphase_anti_aliased_activation,
                                     snake, snake_beta)
from ditto_tts_tpu.ops.snake_pallas_nlc import fused_snake_nlc


def _oracle_ncl(x_ncl, alpha, beta, logscale=True):
    return anti_aliased_activation(
        x_ncl, lambda v: snake_beta(v, alpha, beta, logscale=logscale))


@pytest.mark.parametrize("shape", [(1, 512, 8), (2, 700, 12), (1, 130, 3),
                                   (1, 300, 200)])
def test_nlc_fused_matches_oracle_interior(shape):
    rng = np.random.default_rng(0)
    b, t, c = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)

    want = np.asarray(_oracle_ncl(x.transpose(0, 2, 1), alpha, beta)
                      ).transpose(0, 2, 1)
    got = np.asarray(fused_snake_nlc(x, alpha, beta, interpret=True,
                                     block_t=256))
    assert got.shape == want.shape
    # atol floor 3e-5: the kernel's pi-periodic fast sin^2
    # (ops/fastmath.py) carries ~5e-7 fp32 arithmetic noise, scaled by
    # 1/beta, plus interpret-mode accumulation-order deltas
    np.testing.assert_allclose(got[:, 4:-4], want[:, 4:-4],
                               rtol=1e-4, atol=3e-5)
    np.testing.assert_allclose(got, want, rtol=0.3, atol=0.05)


def test_nlc_fused_matches_ncl_fused():
    """Same math as the NCL kernel everywhere (identical edge handling)."""
    from ditto_tts_tpu.ops.snake_pallas import fused_snake_pallas

    rng = np.random.default_rng(1)
    b, c, t = 2, 6, 384
    x_ncl = jnp.asarray(rng.standard_normal((b, c, t)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    want = np.asarray(fused_snake_pallas(x_ncl, alpha, beta, interpret=True,
                                         block_t=128))
    got = np.asarray(fused_snake_nlc(x_ncl.transpose(0, 2, 1), alpha, beta,
                                     interpret=True, block_t=128)
                     ).transpose(0, 2, 1)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_nlc_fused_no_beta_and_bf16():
    rng = np.random.default_rng(2)
    b, t, c = 1, 256, 4
    x = jnp.asarray(rng.standard_normal((b, t, c)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    want = np.asarray(anti_aliased_activation(
        x.transpose(0, 2, 1),
        lambda v: snake(v, alpha))).transpose(0, 2, 1)
    got = np.asarray(fused_snake_nlc(x, alpha, None, interpret=True))
    np.testing.assert_allclose(got[:, 4:-4], want[:, 4:-4],
                               rtol=1e-4, atol=1e-5)
    # bf16 in/out carries, fp32 compute inside
    gb = fused_snake_nlc(x.astype(jnp.bfloat16), alpha, None,
                         interpret=True)
    assert gb.dtype == jnp.bfloat16
    np.testing.assert_allclose(np.asarray(gb, np.float32)[:, 4:-4],
                               want[:, 4:-4], rtol=5e-2, atol=5e-2)
