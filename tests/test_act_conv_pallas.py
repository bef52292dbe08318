"""Fused AA-snake->conv kernel vs the unfused oracle (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.nn.conv import conv1d_nlc_gemm
from ditto_tts_tpu.ops.act_conv_pallas import aa_snake_conv1d
from ditto_tts_tpu.ops.snake import (polyphase_anti_aliased_activation,
                                     snake, snake_beta)


def _oracle(x, alpha, beta, w, bv, dil, logscale=True):
    """Unfused path: polyphase AA activation, zero 'SAME' pad, conv."""
    if beta is not None:
        fn = lambda v: snake_beta(v, alpha, beta, logscale=logscale,  # noqa
                                  channel_axis=-1)
    else:
        fn = lambda v: snake(v, alpha, logscale=logscale,  # noqa
                             channel_axis=-1)
    a = polyphase_anti_aliased_activation(x, fn, time_axis=1)
    k = w.shape[-1]
    pad = (k * dil - dil) // 2
    a = jnp.pad(a, ((0, 0), (pad, pad), (0, 0)))
    return conv1d_nlc_gemm(a, w, bv, dilation=dil)


@pytest.mark.parametrize("shape,k,dil", [((1, 300, 8), 3, 1),
                                         ((2, 520, 16), 7, 3),
                                         ((1, 290, 12), 11, 5)])
def test_fused_act_conv_matches_oracle_interior(shape, k, dil):
    rng = np.random.default_rng(0)
    b, t, c = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal(c), jnp.float32)

    want = np.asarray(_oracle(x, alpha, beta, w, bv, dil))
    got = np.asarray(aa_snake_conv1d(x, alpha, beta, w, bv, dilation=dil,
                                     interpret=True, block_t=256))
    assert got.shape == want.shape
    # activation edge semantics differ within ~6 rows of the sequence
    # ends, which the conv spreads by its padding; interior is exact
    m = 8 + (k * dil - dil) // 2
    np.testing.assert_allclose(got[:, m:-m], want[:, m:-m],
                               rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(got, want, rtol=0.5, atol=0.2)


def test_fused_act_conv_wide_out_and_no_beta():
    rng = np.random.default_rng(1)
    b, t, c, o, k, dil = 1, 400, 16, 64, 7, 1
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((o, c, k)), jnp.float32)

    want = np.asarray(_oracle(x, alpha, None, w, None, dil))
    got = np.asarray(aa_snake_conv1d(x, alpha, None, w, None, dilation=dil,
                                     interpret=True, block_t=128))
    m = 8 + (k * dil - dil) // 2
    np.testing.assert_allclose(got[:, m:-m], want[:, m:-m],
                               rtol=2e-4, atol=2e-4)


def test_fused_act_conv_bf16_carry():
    rng = np.random.default_rng(2)
    b, t, c, k, dil = 1, 300, 8, 7, 3
    x32 = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal(c), jnp.float32)

    want = np.asarray(_oracle(x32, alpha, beta, w, bv, dil))
    got = aa_snake_conv1d(x32.astype(jnp.bfloat16), alpha, beta, w, bv,
                          dilation=dil, compute_dtype=jnp.bfloat16,
                          interpret=True)
    assert got.dtype == jnp.bfloat16
    m = 8 + (k * dil - dil) // 2
    np.testing.assert_allclose(np.asarray(got, np.float32)[:, m:-m],
                               want[:, m:-m], rtol=6e-2, atol=6e-2)


def test_vocoder_fused_conv_aa_matches_polyphase(monkeypatch):
    # off-TPU the dispatchers skip pallas entirely; force the
    # interpret-mode dispatch so this test pins the kernel path
    from ditto_tts_tpu.ops import conv_pallas as cp
    monkeypatch.setattr(cp, 'FORCE_INTERPRET', True)
    """Full BigVGAN forward with aa_impl='fused_conv' vs the unfused
    polyphase path, fp32 — exact except activation edge semantics within
    a few samples of the sequence ends inside fused amp blocks."""
    from ditto_tts_tpu.core.config import VocoderConfig
    from ditto_tts_tpu.models.vocoder import bigvgan_forward, init_bigvgan

    cfg = VocoderConfig(
        num_mels=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=256,   # stage widths 128/64: one fused
        resblock_kernel_sizes=(3,), resblock_dilation_sizes=((1, 3),),
        compute_dtype="float32", carry_dtype="float32")
    params = init_bigvgan(jax.random.key(7), cfg)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 if a.ndim == 1 else a, params)
    mel = jnp.asarray(np.random.default_rng(8)
                      .standard_normal((1, 8, 48)).astype(np.float32))
    want = np.asarray(bigvgan_forward(params, cfg, mel))
    got = np.asarray(bigvgan_forward(
        params, cfg.replace(aa_impl="fused_conv"), mel))
    assert got.shape == want.shape
    # interior exact; edges loose (activation edge-semantics caveat)
    np.testing.assert_allclose(got[..., 64:-64], want[..., 64:-64],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(got, want, rtol=0.5, atol=0.25)


def test_short_sequence_falls_back_to_oracle():
    """T below the fused kernel's halo requirement routes to the unfused
    oracle path (exact match, any length)."""
    rng = np.random.default_rng(30)
    b, t, c, k, dil = 1, 48, 8, 11, 5
    x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal(c), jnp.float32)
    want = np.asarray(_oracle(x, alpha, beta, w, bv, dil))
    got = np.asarray(aa_snake_conv1d(x, alpha, beta, w, bv, dilation=dil,
                                     interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# time-minor (NCL) fused kernel
# ---------------------------------------------------------------------------

def _oracle_ncl(x, alpha, beta, w, bv, dil, logscale=True, residual=None):
    """Unfused NCL path: polyphase AA act, zero 'SAME' pad, conv."""
    from ditto_tts_tpu.nn.conv import conv1d
    if beta is not None:
        fn = lambda v: snake_beta(v, alpha, beta, logscale=logscale,  # noqa
                                  channel_axis=1)
    else:
        fn = lambda v: snake(v, alpha, logscale=logscale,  # noqa
                             channel_axis=1)
    a = polyphase_anti_aliased_activation(x, fn)
    k = w.shape[-1]
    pad = (k * dil - dil) // 2
    a = jnp.pad(a, ((0, 0), (0, 0), (pad, pad)))
    out = conv1d(a, w, bv, dilation=dil)
    return out + residual if residual is not None else out


@pytest.mark.parametrize("shape,k,dil", [((1, 8, 300), 3, 1),
                                         ((2, 16, 520), 7, 3),
                                         ((1, 12, 290), 11, 5)])
def test_ncl_fused_matches_oracle_interior(shape, k, dil):
    from ditto_tts_tpu.ops.act_conv_pallas import aa_snake_conv1d_ncl
    rng = np.random.default_rng(40)
    b, c, t = shape
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal(c), jnp.float32)

    want = np.asarray(_oracle_ncl(x, alpha, beta, w, bv, dil))
    got = np.asarray(aa_snake_conv1d_ncl(x, alpha, beta, w, bv,
                                         dilation=dil, interpret=True,
                                         block_t=256))
    assert got.shape == want.shape
    m = 8 + (k * dil - dil) // 2
    np.testing.assert_allclose(got[..., m:-m], want[..., m:-m],
                               rtol=2e-4, atol=2e-4)


def test_ncl_fused_residual_and_plain_snake():
    from ditto_tts_tpu.ops.act_conv_pallas import aa_snake_conv1d_ncl
    rng = np.random.default_rng(41)
    b, c, t, k, dil = 2, 8, 400, 7, 3
    x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    res = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)

    want = np.asarray(_oracle_ncl(x, alpha, None, w, None, dil,
                                  residual=res))
    got = np.asarray(aa_snake_conv1d_ncl(x, alpha, None, w, None,
                                         dilation=dil, interpret=True,
                                         block_t=256, residual=res))
    m = 8 + (k * dil - dil) // 2
    np.testing.assert_allclose(got[..., m:-m], want[..., m:-m],
                               rtol=2e-4, atol=2e-4)


def test_ncl_fused_bf16_compute():
    from ditto_tts_tpu.ops.act_conv_pallas import aa_snake_conv1d_ncl
    rng = np.random.default_rng(42)
    b, c, t, k, dil = 1, 16, 520, 11, 5
    x32 = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    bv = jnp.asarray(rng.standard_normal(c), jnp.float32)
    want = np.asarray(_oracle_ncl(x32, alpha, beta, w, bv, dil),
                      np.float32)
    got = np.asarray(aa_snake_conv1d_ncl(
        x32.astype(jnp.bfloat16), alpha, beta, w, bv, dilation=dil,
        compute_dtype=jnp.bfloat16, interpret=True, block_t=256),
        np.float32)
    m = 8 + (k * dil - dil) // 2
    np.testing.assert_allclose(got[..., m:-m], want[..., m:-m],
                               rtol=5e-2, atol=5e-2)


def test_ncl_fused_short_sequence():
    """T shorter than one 128-lane block: the kernel's in-bounds masking
    handles it (the halo fallback can never fire at 128-rounding); edges
    carry the usual replicate-vs-polyphase delta, so tolerance is loose."""
    from ditto_tts_tpu.ops.act_conv_pallas import aa_snake_conv1d_ncl
    rng = np.random.default_rng(43)
    b, c, t, k, dil = 1, 8, 60, 11, 5
    x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
    alpha = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    beta = jnp.asarray(0.3 * rng.standard_normal(c), jnp.float32)
    w = jnp.asarray(0.2 * rng.standard_normal((c, c, k)), jnp.float32)
    want = np.asarray(_oracle_ncl(x, alpha, beta, w, None, dil))
    got = np.asarray(aa_snake_conv1d_ncl(x, alpha, beta, w, None,
                                         dilation=dil, interpret=True))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=0.1, atol=0.1)


def test_vocoder_hybrid_narrow_stages_fused(monkeypatch):
    """Production-like narrow widths (48/24) through the hybrid
    time-minor carry (default dispatch: unfused polyphase act + NCL conv
    kernel — the fused NCL kernel measured at parity on v5e and is
    dispatch-off); pin against the polyphase oracle."""
    from ditto_tts_tpu.ops import conv_pallas as cp
    monkeypatch.setattr(cp, 'FORCE_INTERPRET', True)
    from ditto_tts_tpu.core.config import VocoderConfig
    from ditto_tts_tpu.models.vocoder import bigvgan_forward, init_bigvgan

    cfg = VocoderConfig(
        num_mels=8, upsample_rates=(2, 2), upsample_kernel_sizes=(4, 4),
        upsample_initial_channel=96,    # stage widths 48/24: both hybrid
        resblock_kernel_sizes=(3, 7), resblock_dilation_sizes=((1, 3),
                                                               (1, 3)),
        compute_dtype="float32", carry_dtype="float32")
    params = init_bigvgan(jax.random.key(9), cfg)
    params = jax.tree_util.tree_map(
        lambda a: a + 0.1 if a.ndim == 1 else a, params)
    mel = jnp.asarray(np.random.default_rng(10)
                      .standard_normal((2, 8, 80)).astype(np.float32))
    want = np.asarray(bigvgan_forward(
        params, cfg.replace(aa_impl="polyphase"), mel))
    got = np.asarray(bigvgan_forward(params, cfg, mel))
    assert got.shape == want.shape
    np.testing.assert_allclose(got[..., 64:-64], want[..., 64:-64],
                               rtol=5e-4, atol=5e-4)
    np.testing.assert_allclose(got, want, rtol=0.5, atol=0.25)
