"""Mel/STFT tests: STFT vs torch.stft oracle, BigVGAN-pipeline semantics."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.ops.mel import (get_mel_spectrogram, mel_filterbank,
                                   stft_magnitude)


def test_stft_matches_torch():
    rng = np.random.default_rng(0)
    wav = rng.standard_normal((2, 4096)).astype(np.float32)
    n_fft, hop = 512, 128
    want = torch.stft(torch.from_numpy(wav), n_fft, hop_length=hop,
                      win_length=n_fft,
                      window=torch.hann_window(n_fft),
                      center=False, normalized=False, onesided=True,
                      return_complex=True)
    want = torch.sqrt(want.real ** 2 + want.imag ** 2 + 1e-9).numpy()
    got = np.asarray(stft_magnitude(jnp.asarray(wav), n_fft, hop))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_mel_filterbank_invariants():
    fb = mel_filterbank(24000, 1024, 100)
    assert fb.shape == (100, 513)
    assert fb.min() >= 0
    # every filter has support; filters tile the band
    assert (fb.sum(axis=1) > 0).all()
    # slaney norm: peak value decreases with center frequency (wider bands)
    peaks = fb.max(axis=1)
    assert peaks[0] > peaks[-1]


def test_mel_filterbank_matches_librosa_if_available():
    librosa = pytest.importorskip("librosa")
    want = librosa.filters.mel(sr=24000, n_fft=1024, n_mels=100)
    got = mel_filterbank(24000, 1024, 100)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-6)


def test_get_mel_spectrogram_shape_and_range():
    rng = np.random.default_rng(1)
    wav = (0.5 * rng.standard_normal((1, 24000))).astype(np.float32)
    mel = np.asarray(get_mel_spectrogram(jnp.asarray(wav)))
    # BigVGAN framing: (T - n_fft + 2*pad)/hop + 1 frames
    pad = (1024 - 256) // 2
    frames = (24000 + 2 * pad - 1024) // 256 + 1
    assert mel.shape == (1, 100, frames)
    assert mel.min() >= np.log(1e-5) - 1e-6
    assert np.isfinite(mel).all()


def test_mel_sine_peak_location():
    """A 1 kHz sine's energy should peak in the mel channel covering 1 kHz."""
    sr = 24000
    t = np.arange(sr) / sr
    wav = np.sin(2 * np.pi * 1000 * t).astype(np.float32)[None]
    mel = np.asarray(get_mel_spectrogram(jnp.asarray(wav)))
    mean_energy = mel[0].mean(axis=1)
    peak_channel = int(mean_energy.argmax())
    fb = mel_filterbank(sr, 1024, 100)
    freqs = np.linspace(0, sr / 2, 513)
    center = freqs[fb[peak_channel].argmax()]
    assert 800 < center < 1250, center
