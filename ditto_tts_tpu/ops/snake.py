"""Snake / SnakeBeta periodic activations, plain and anti-aliased.

Behavioral spec: BigVGAN's activations.py (Snake, SnakeBeta) and its
alias-free Activation1d (2x kaiser-sinc upsample -> activation -> 2x
anti-aliased downsample) — the fused CUDA version of which the reference
disables (ref: src/model/SpeechGenerator.py:49). Here the anti-aliased path
is provided twice:

  * ``anti_aliased_activation``    — composed jnp ops (XLA-fused; oracle)
  * ``fused_snake_pallas``         — a single Pallas TPU kernel fusing
    zero-stuff upsample FIR + snake-beta + anti-aliased decimate FIR over
    channel-blocked tiles (ops/snake_pallas.py)

Formulas (alpha/beta per channel, logscale: alpha=exp(a)):
  snake(x)      = x + (1/alpha) sin^2(alpha x)
  snakebeta(x)  = x + (1/(beta+eps)) sin^2(alpha x)
"""

from __future__ import annotations

import jax.numpy as jnp

from .resample import downsample1d, upsample1d

_EPS = 1e-9


def snake(x, alpha, *, logscale: bool = True):
    """x: [B, C, T]; alpha: [C]."""
    a = jnp.exp(alpha) if logscale else alpha
    a = a[None, :, None]
    s = jnp.sin(a * x)
    return x + (1.0 / (a + _EPS)) * s * s


def snake_beta(x, alpha, beta, *, logscale: bool = True):
    """x: [B, C, T]; alpha, beta: [C] (BigVGAN SnakeBeta)."""
    if logscale:
        a = jnp.exp(alpha)
        b = jnp.exp(beta)
    else:
        a, b = alpha, beta
    a = a[None, :, None]
    b = b[None, :, None]
    s = jnp.sin(a * x)
    return x + (1.0 / (b + _EPS)) * s * s


def anti_aliased_activation(x, act_fn, *, up_ratio: int = 2,
                            down_ratio: int = 2):
    """BigVGAN Activation1d: upsample -> pointwise activation -> downsample."""
    y = upsample1d(x, up_ratio)
    y = act_fn(y)
    return downsample1d(y, down_ratio)
