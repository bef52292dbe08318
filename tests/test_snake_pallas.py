"""Fused Pallas snake kernel vs the composed jnp oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.ops.snake import anti_aliased_activation, snake_beta
from ditto_tts_tpu.ops.snake_pallas import fused_snake_pallas


def _oracle(x, alpha, beta, logscale=True):
    return anti_aliased_activation(
        x, lambda v: snake_beta(v, alpha, beta, logscale=logscale))


@pytest.mark.parametrize("shape", [(1, 8, 512), (2, 12, 700), (1, 3, 130)])
def test_fused_matches_oracle_interior(shape):
    rng = np.random.default_rng(0)
    b, c, t = shape
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)
    beta = jnp.asarray(rng.standard_normal(c).astype(np.float32) * 0.3)

    want = np.asarray(_oracle(x, alpha, beta))
    got = np.asarray(fused_snake_pallas(x, alpha, beta, interpret=True,
                                        block_t=256))
    assert got.shape == want.shape
    # interior: exact to fp32 round-off; edges (3 samples) differ slightly
    np.testing.assert_allclose(got[..., 4:-4], want[..., 4:-4],
                               rtol=1e-4, atol=1e-5)
    # edges still close (replicate-flavored boundary handling)
    np.testing.assert_allclose(got, want, rtol=0.3, atol=0.05)


def test_fused_no_beta_uses_snake():
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal((1, 8, 256)).astype(np.float32))
    alpha = jnp.asarray(rng.standard_normal(8).astype(np.float32) * 0.2)
    from ditto_tts_tpu.ops.snake import snake
    want = np.asarray(anti_aliased_activation(
        x, lambda v: snake(v, alpha)))
    got = np.asarray(fused_snake_pallas(x, alpha, None, interpret=True,
                                        block_t=128))
    np.testing.assert_allclose(got[..., 4:-4], want[..., 4:-4],
                               rtol=1e-4, atol=1e-5)


def test_fused_non_logscale():
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal((1, 4, 200)).astype(np.float32))
    alpha = jnp.asarray(np.abs(rng.standard_normal(4)).astype(np.float32)
                        + 0.5)
    beta = jnp.asarray(np.abs(rng.standard_normal(4)).astype(np.float32)
                       + 0.5)
    want = np.asarray(_oracle(x, alpha, beta, logscale=False))
    got = np.asarray(fused_snake_pallas(x, alpha, beta, logscale=False,
                                        interpret=True, block_t=128))
    np.testing.assert_allclose(got[..., 4:-4], want[..., 4:-4],
                               rtol=1e-4, atol=1e-5)
