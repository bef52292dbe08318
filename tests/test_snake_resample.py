"""Anti-aliased resampling + Snake activation tests."""

import numpy as np

import jax.numpy as jnp

from ditto_tts_tpu.ops.resample import (downsample1d, kaiser_sinc_filter1d,
                                        upsample1d)
from ditto_tts_tpu.ops.snake import (anti_aliased_activation,
                                     polyphase_anti_aliased_activation,
                                     snake, snake_beta)


def _sine(freq, sr, n, dtype=np.float32):
    t = np.arange(n) / sr
    return np.sin(2 * np.pi * freq * t).astype(dtype)


def test_kaiser_filter_unit_dc_gain():
    f = kaiser_sinc_filter1d(0.25, 0.3, 12)
    np.testing.assert_allclose(f.sum(), 1.0, rtol=1e-6)
    assert f.shape == (12,)


def test_upsample_preserves_passband_sine():
    sr = 1000
    x = _sine(50, sr, 512)[None, None, :]
    y = np.asarray(upsample1d(jnp.asarray(x), 2))
    assert y.shape == (1, 1, 1024)
    # even-length kernel introduces a half-sample delay (BigVGAN design)
    n = np.arange(1024)
    want = np.sin(2 * np.pi * 50 * (n - 0.5) / (2 * sr))
    np.testing.assert_allclose(y[0, 0, 50:-50], want[50:-50], atol=5e-3)


def test_down_after_up_is_identity_in_passband():
    # deep-passband content round-trips; (the 12-tap kaiser filter has a
    # wide transition band, so broadband signals would not)
    sr = 1000
    x = (_sine(40, sr, 600) + 0.5 * _sine(90, sr, 600))[None, None, :]
    x = np.repeat(x, 2, axis=1).astype(np.float32)
    y = np.asarray(downsample1d(upsample1d(jnp.asarray(x), 2), 2))
    assert y.shape == x.shape
    err = np.abs(y[..., 30:-30] - x[..., 30:-30]).max()
    assert err < 2e-2, err


def test_snake_formula():
    x = jnp.asarray(np.linspace(-2, 2, 64, dtype=np.float32))[None, None]
    alpha = jnp.asarray([np.log(2.0)], jnp.float32)  # exp -> 2.0
    got = np.asarray(snake(x, alpha, logscale=True))
    xn = np.asarray(x)
    want = xn + (1.0 / 2.0) * np.sin(2.0 * xn) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_snake_beta_formula():
    x = jnp.asarray(np.linspace(-1, 1, 32, dtype=np.float32))[None, None]
    alpha = jnp.asarray([0.5], jnp.float32)
    beta = jnp.asarray([1.5], jnp.float32)
    got = np.asarray(snake_beta(x, alpha, beta, logscale=False))
    xn = np.asarray(x)
    want = xn + (1.0 / (1.5 + 1e-9)) * np.sin(0.5 * xn) ** 2
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_anti_aliased_activation_shape_and_smooth_case():
    """On a low-frequency signal the anti-aliased path ~= plain activation."""
    sr = 1000
    x = (0.8 * _sine(20, sr, 400))[None, None, :]
    alpha = jnp.asarray([0.0], jnp.float32)  # exp -> 1.0

    def fn(v):
        return snake(v, alpha)

    plain = np.asarray(fn(jnp.asarray(x)))
    aa = np.asarray(anti_aliased_activation(jnp.asarray(x), fn))
    assert aa.shape == plain.shape
    err = np.abs(aa[..., 40:-40] - plain[..., 40:-40]).max()
    assert err < 2e-2, err


def test_polyphase_matches_composed_exactly():
    """Polyphase == composed (incl. replicate-pad edges) to fp32 round-off,
    for several shapes and both snake variants."""
    rng = np.random.default_rng(7)
    for b, c, t in [(1, 1, 16), (2, 3, 37), (2, 8, 501), (3, 5, 128)]:
        x = jnp.asarray(rng.standard_normal((b, c, t)), jnp.float32)
        alpha = jnp.asarray(rng.standard_normal(c), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c), jnp.float32)

        def fn(v):
            return snake_beta(v, alpha, beta, logscale=True)

        want = np.asarray(anti_aliased_activation(x, fn))
        got = np.asarray(polyphase_anti_aliased_activation(x, fn))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)

        def fn2(v):
            return snake(v, alpha, logscale=False)

        want = np.asarray(anti_aliased_activation(x, fn2))
        got = np.asarray(polyphase_anti_aliased_activation(x, fn2))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_fir_gemm_t_matches_slice_form():
    """Banded-GEMM FIR == the shifted multiply-add form it replaces."""
    from ditto_tts_tpu.ops.fir_gemm import fir_gemm_t

    rng = np.random.default_rng(11)
    for b, c, t_in, taps_n, start in [(1, 2, 40, 6, 0), (2, 3, 300, 6, 2),
                                      (1, 1, 129, 4, 5), (2, 5, 513, 6, 3)]:
        taps = rng.standard_normal(taps_n)
        t_out = t_in - start - taps_n + 1
        x = jnp.asarray(rng.standard_normal((b, c, t_in)), jnp.float32)
        got = np.asarray(fir_gemm_t(x, taps, start, t_out))
        xn = np.asarray(x)
        want = sum(float(taps[m]) * xn[:, :, start + m:start + m + t_out]
                   for m in range(taps_n))
        assert got.shape == (b, c, t_out)
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_polyphase_gemm_matches_polyphase_oracle():
    """polyphase_anti_aliased_activation_gemm ([B,T,C]) == the slice-form
    polyphase path, incl. replicate-pad edges."""
    from ditto_tts_tpu.ops.snake import polyphase_anti_aliased_activation_gemm

    rng = np.random.default_rng(13)
    for b, c, t in [(1, 2, 33), (2, 4, 200), (1, 3, 129)]:
        x = jnp.asarray(rng.standard_normal((b, t, c)), jnp.float32)
        alpha = jnp.asarray(rng.standard_normal(c), jnp.float32)
        beta = jnp.asarray(rng.standard_normal(c), jnp.float32)

        def fn_tlast(v):  # [B, C, T] slice-form reference, channels axis 1
            return snake_beta(v, alpha, beta, channel_axis=1)

        def fn_nlc(v):    # [B, T, C] for the oracle with time_axis=1
            return snake_beta(v, alpha, beta, channel_axis=-1)

        want = np.asarray(
            polyphase_anti_aliased_activation(x, fn_nlc, time_axis=1))
        got = np.asarray(
            polyphase_anti_aliased_activation_gemm(x, fn_tlast))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_anti_aliasing_suppresses_harmonics_above_nyquist():
    """Snake on a near-Nyquist tone creates out-of-band harmonics; the
    anti-aliased path must contain less aliased energy than the plain one."""
    sr = 1000
    x = (0.9 * _sine(420, sr, 2048))[None, None, :]
    alpha = jnp.asarray([np.log(3.0)], jnp.float32)

    def fn(v):
        return snake(v, alpha)

    plain = np.asarray(fn(jnp.asarray(x)))[0, 0]
    aa = np.asarray(anti_aliased_activation(jnp.asarray(x), fn))[0, 0]

    def alias_energy(sig):
        spec = np.abs(np.fft.rfft(sig[64:-64]))
        freqs = np.fft.rfftfreq(len(sig) - 128, 1 / sr)
        # 4th harmonic of 420 Hz = 1680 Hz aliases to 320 Hz — deep in the
        # stopband of the 12-tap kaiser filters (the 840->160 Hz alias sits
        # in their wide transition band and is only partially attenuated)
        band = (freqs > 300) & (freqs < 340)
        return spec[band].sum()

    assert alias_energy(aa) < 0.5 * alias_energy(plain)
