"""STFT magnitude + slaney mel filterbank (BigVGAN analysis semantics).

Behavioral spec: BigVGAN meldataset.get_mel_spectrogram as invoked by the
reference before vocoding (ref: src/model/SpeechGenerator.py:125):
  * reflect-pad the waveform by (n_fft - hop)/2 on both sides
  * STFT center=False, periodic Hann, onesided
  * magnitude = sqrt(re^2 + im^2 + 1e-9)
  * mel basis = librosa slaney-scale, slaney-norm filterbank
  * dynamic compression: log(clamp(x, min=1e-5))

TPU design: the DFT is two real matmuls (frames x cos/sin bases) instead of
an FFT — at n_fft=1024 the [frames, 1024] x [1024, 513] GEMMs land on the
MXU and fuse with windowing; fp32 accumulation throughout.
"""

from __future__ import annotations

import functools
from typing import Optional

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# slaney mel filterbank (librosa.filters.mel semantics, htk=False)
# ---------------------------------------------------------------------------

def _hz_to_mel(f):
    f = np.asarray(f, np.float64)
    f_sp = 200.0 / 3
    mels = f / f_sp
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(f >= min_log_hz,
                    min_log_mel + np.log(np.maximum(f, 1e-10) / min_log_hz)
                    / logstep,
                    mels)


def _mel_to_hz(m):
    m = np.asarray(m, np.float64)
    f_sp = 200.0 / 3
    freqs = f_sp * m
    min_log_hz = 1000.0
    min_log_mel = min_log_hz / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel,
                    min_log_hz * np.exp(logstep * (m - min_log_mel)),
                    freqs)


@functools.lru_cache(maxsize=8)
def mel_filterbank(sample_rate: int, n_fft: int, num_mels: int,
                   fmin: float = 0.0,
                   fmax: Optional[float] = None) -> np.ndarray:
    """[num_mels, 1 + n_fft//2] slaney-normalized triangular filters."""
    if fmax is None:
        fmax = sample_rate / 2.0
    fftfreqs = np.linspace(0, sample_rate / 2.0, 1 + n_fft // 2)
    mel_pts = np.linspace(_hz_to_mel(fmin), _hz_to_mel(fmax), num_mels + 2)
    mel_f = _mel_to_hz(mel_pts)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (mel_f[2:num_mels + 2] - mel_f[:num_mels])
    weights = weights * enorm[:, None]
    return weights.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT as framed matmul DFT
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=8)
def _dft_bases(n_fft: int):
    n_freq = n_fft // 2 + 1
    t = np.arange(n_fft)[:, None]
    k = np.arange(n_freq)[None, :]
    ang = -2.0 * np.pi * t * k / n_fft
    window = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(n_fft) / n_fft)
    cos_b = (np.cos(ang) * window[:, None]).astype(np.float32)
    sin_b = (np.sin(ang) * window[:, None]).astype(np.float32)
    return cos_b, sin_b


def _frame(x, frame_length: int, hop: int):
    """x: [B, T] -> [B, n_frames, frame_length] (center=False)."""
    n = 1 + (x.shape[-1] - frame_length) // hop
    idx = (np.arange(n)[:, None] * hop + np.arange(frame_length)[None, :])
    return x[:, idx]


def stft_magnitude(x, n_fft: int, hop: int, *, eps: float = 1e-9):
    """x: [B, T] already padded -> [B, n_freq, n_frames] |STFT| with the
    periodic-Hann window folded into the DFT bases."""
    cos_b, sin_b = _dft_bases(n_fft)
    frames = _frame(x, n_fft, hop)
    re = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(cos_b),
                    preferred_element_type=jnp.float32)
    im = jnp.einsum("bnt,tk->bnk", frames, jnp.asarray(sin_b),
                    preferred_element_type=jnp.float32)
    mag = jnp.sqrt(re * re + im * im + eps)
    return mag.transpose(0, 2, 1)


def get_mel_spectrogram(wav, *, sample_rate: int = 24000, n_fft: int = 1024,
                        num_mels: int = 100, hop: int = 256,
                        win_size: int = 1024, fmin: float = 0.0,
                        fmax: Optional[float] = None):
    """wav: [B, T] in [-1, 1] -> log-mel [B, num_mels, frames]."""
    assert win_size == n_fft, "window folded into DFT bases requires equality"
    pad = (n_fft - hop) // 2
    x = jnp.pad(wav, ((0, 0), (pad, pad)), mode="reflect")
    mag = stft_magnitude(x, n_fft, hop)
    basis = jnp.asarray(mel_filterbank(sample_rate, n_fft, num_mels,
                                       fmin, fmax))
    mel = jnp.einsum("mf,bft->bmt", basis, mag,
                     preferred_element_type=jnp.float32)
    return jnp.log(jnp.clip(mel, min=1e-5))
