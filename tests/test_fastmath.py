"""Round-5 fast-path units: the pi-periodic sin^2 approximation
(ops/fastmath.py) against numpy's sin, and the sampler's precomputed
cross-attention K/V (models/dit.py prepare_cross_kv) against the
project-inside-the-block path it replaces."""

import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.core.config import DiTConfig
from ditto_tts_tpu.models.dit import (ditto_forward, init_ditto,
                                      prepare_blocks, prepare_cross_kv)
from ditto_tts_tpu.ops import fastmath


def _sin2_err_vs_fp32_input(x):
    # Compare against sin^2 of the fp32-ROUNDED input: rounding x to fp32
    # already moves sin^2 by ~ulp(x), which is not the approximation's
    # fault (an exact jnp.sin lowering sees the same rounded input).
    xf = np.asarray(x, np.float32)
    got = np.asarray(fastmath.sin2(jnp.asarray(xf)))
    want = np.sin(xf.astype(np.float64)) ** 2
    return np.max(np.abs(got - want))


def test_sin2_moderate_range():
    # Snake's operating range: alpha*x with |alpha*x| up to a few tens.
    # Bound = fp32 polynomial-arithmetic noise (~3.5e-7 measured), not the
    # f64 minimax error (3.4e-9).
    x = np.linspace(-50.0, 50.0, 200_001)
    assert _sin2_err_vs_fp32_input(x) < 5e-7


def test_sin2_near_multiples_of_pi():
    # Range-reduction seams: n*pi (zeros of sin^2) and (n+1/2)*pi (ones).
    n = np.arange(-300, 301, dtype=np.float64)
    eps = np.array([-1e-4, -1e-6, 0.0, 1e-6, 1e-4])
    x = (n[:, None] * np.pi + eps[None, :]).ravel()
    assert _sin2_err_vs_fp32_input(x) < 5e-7
    x = ((n[:, None] + 0.5) * np.pi + eps[None, :]).ravel()
    assert _sin2_err_vs_fp32_input(x) < 5e-7


def test_sin2_large_args():
    # Docstring bound: holds out to |x| ~ 1e3 (beyond that the fp32 ulp
    # of x itself dominates any lowering, exact or approximate).
    x = np.random.default_rng(0).uniform(-1e3, 1e3, size=100_000)
    assert _sin2_err_vs_fp32_input(x) < 1e-6


def test_sin2_range_and_symmetry():
    x = np.random.default_rng(1).uniform(-100, 100, size=10_000)
    y = np.asarray(fastmath.sin2(jnp.asarray(x, jnp.float32)))
    assert np.all(y >= -1e-9) and np.all(y <= 1.0 + 1e-7)
    y_neg = np.asarray(fastmath.sin2(jnp.asarray(-x, jnp.float32)))
    np.testing.assert_allclose(y, y_neg, atol=1e-8)  # even function


def test_prepare_cross_kv_matches_in_block_projection():
    """ditto_forward(prepared_blocks, cross_kv=...) must equal the plain
    per-block-projection forward bit-for-bit in fp32 (same GEMMs, just
    hoisted out of the diffusion scan)."""
    cfg = DiTConfig(hidden_dim=16, num_layers=3, num_heads=2, time_dim=8,
                    text_dim=16, diffusion_steps=10, cross_attn_dropout=0.0,
                    scan_blocks=True, compute_dtype="float32")
    params = init_ditto(jax.random.key(0), cfg)
    x = jax.random.normal(jax.random.key(1), (2, 12, 16))
    text = jax.random.normal(jax.random.key(2), (2, 7, 16))
    t = jnp.array([3, 9], jnp.int32)

    ref = ditto_forward(params, cfg, x, text, t)

    blocks = prepare_blocks(params, cfg)
    k, v = prepare_cross_kv(blocks, cfg, text)
    assert k.shape == (3, 2, 2, 7, 8) and v.shape == k.shape
    got = ditto_forward(params, cfg, x, text, t,
                        prepared_blocks=blocks, cross_kv=(k, v))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=0, atol=1e-5)
