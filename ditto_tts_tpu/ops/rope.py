"""Rotary position embeddings.

Semantics match the reference exactly (ref: src/components/DiT.py:43-72):
  inv_freq_j = 1 / 10000^(2j/d),   j in [0, d/2)
  pos[i]     = concat(i*inv_freq, i*inv_freq)          # [seq, d]
  rope(t)    = t * cos(pos) + rotate_half(t) * sin(pos)
  rotate_half([x1, x2]) = [-x2, x1]                    # half-split, not interleaved

The table is precomputed once per (seq_len, head_dim) — under jit these are
static — and the application is a fused elementwise op the XLA fuser folds
into the surrounding QKV projections.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp


@functools.lru_cache(maxsize=32)
def _freq_table_np(seq_len: int, dim: int):
    import numpy as np
    j = np.arange(0, dim, 2, dtype=np.float32)
    inv_freq = 1.0 / (10000.0 ** (j / dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.outer(t, inv_freq)                    # [seq, dim/2]
    pos = np.concatenate([freqs, freqs], axis=-1)    # [seq, dim]
    return np.cos(pos), np.sin(pos)


def rope_tables(seq_len: int, dim: int, dtype=jnp.float32):
    """Return (cos, sin) tables of shape [seq_len, dim]."""
    cos, sin = _freq_table_np(seq_len, dim)
    return jnp.asarray(cos, dtype), jnp.asarray(sin, dtype)


def rotate_half(x):
    half = x.shape[-1] // 2
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x, cos, sin):
    """Apply RoPE. ``x``: [..., seq, heads, head_dim] or [..., seq, head_dim];
    cos/sin: [seq, head_dim], broadcast over leading/head axes."""
    if x.ndim == 4:  # [batch, seq, heads, head_dim]
        cos = cos[None, :, None, :]
        sin = sin[None, :, None, :]
    c = cos.astype(x.dtype)
    s = sin.astype(x.dtype)
    return x * c + rotate_half(x) * s
