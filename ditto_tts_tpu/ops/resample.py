"""Kaiser-windowed sinc resampling (alias-free activation support).

Behavioral spec: the BigVGAN "alias-free torch" resamplers (UpSample1d /
DownSample1d with kaiser_sinc_filter1d) used inside the vocoder's
anti-aliased Snake activation — the one place the reference acknowledges a
custom CUDA kernel exists and disables it (ref: src/model/
SpeechGenerator.py:47-50, use_cuda_kernel=False). Filters are designed
host-side in numpy (static per (ratio, kernel_size)) and applied as grouped
convs, which XLA maps onto the MXU.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax
import jax.numpy as jnp


def _kaiser_beta(a: float) -> float:
    if a > 50.0:
        return 0.1102 * (a - 8.7)
    if a >= 21.0:
        return 0.5842 * (a - 21.0) ** 0.4 + 0.07886 * (a - 21.0)
    return 0.0


@functools.lru_cache(maxsize=16)
def kaiser_sinc_filter1d(cutoff: float, half_width: float,
                         kernel_size: int) -> np.ndarray:
    """LPF impulse response [kernel_size]; DC gain normalized to 1."""
    even = kernel_size % 2 == 0
    half_size = kernel_size // 2
    delta_f = 4.0 * half_width
    a = 2.285 * (half_size - 1) * math.pi * delta_f + 7.95
    beta = _kaiser_beta(a)
    window = np.kaiser(kernel_size, beta)
    if even:
        time = np.arange(-half_size, half_size) + 0.5
    else:
        time = np.arange(kernel_size) - half_size
    if cutoff == 0:
        return np.zeros(kernel_size, np.float32)
    filt = 2.0 * cutoff * window * np.sinc(2.0 * cutoff * time)
    filt = filt / filt.sum()
    return filt.astype(np.float32)


def _replicate_pad(x, left, right):
    parts = []
    if left > 0:
        parts.append(jnp.repeat(x[..., :1], left, axis=-1))
    parts.append(x)
    if right > 0:
        parts.append(jnp.repeat(x[..., -1:], right, axis=-1))
    return jnp.concatenate(parts, axis=-1)


def upsample1d(x, ratio: int = 2, kernel_size=None):
    """x: [B, C, T] -> [B, C, T*ratio] via zero-stuffed filtered upsampling."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    stride = ratio
    pad = k // ratio - 1
    pad_left = pad * stride + (k - stride) // 2
    pad_right = pad * stride + (k - stride + 1) // 2
    filt = jnp.asarray(kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, k))

    c = x.shape[1]
    # grouped transposed conv == conv of the zero-stuffed input (lhs_dilation)
    # with the flipped kernel and full padding
    w = jnp.broadcast_to(filt[::-1][None, None, :], (c, 1, k)).astype(x.dtype)
    x = _replicate_pad(x, pad, pad)
    y = ratio * jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding=((k - 1, k - 1),),
        lhs_dilation=(stride,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=c,
        preferred_element_type=jnp.float32).astype(x.dtype)
    end = y.shape[-1] - pad_right
    return y[..., pad_left:end]


def lowpass1d(x, cutoff: float, half_width: float, *, stride: int = 1,
              kernel_size: int = 12):
    """Grouped low-pass FIR with replicate padding (BigVGAN LowPassFilter1d)."""
    filt = jnp.asarray(kaiser_sinc_filter1d(cutoff, half_width, kernel_size))
    even = kernel_size % 2 == 0
    pad_left = kernel_size // 2 - int(even)
    pad_right = kernel_size // 2
    c = x.shape[1]
    w = jnp.broadcast_to(filt[None, None, :],
                         (c, 1, kernel_size)).astype(x.dtype)
    x = _replicate_pad(x, pad_left, pad_right)
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding="VALID",
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=c,
        preferred_element_type=jnp.float32).astype(x.dtype)


def downsample1d(x, ratio: int = 2, kernel_size=None):
    """x: [B, C, T] -> [B, C, T//ratio] anti-aliased decimation."""
    k = int(6 * ratio // 2) * 2 if kernel_size is None else kernel_size
    return lowpass1d(x, 0.5 / ratio, 0.6 / ratio, stride=ratio,
                     kernel_size=k)
