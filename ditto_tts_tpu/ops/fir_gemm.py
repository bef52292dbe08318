"""Short time-axis FIRs as banded GEMMs (MXU) instead of shifted adds (VPU).

The anti-aliased Snake activation applies four 6-tap FIRs per call (2x-up
even/odd phases, anti-aliased decimation of each phase).  Expressed as
shifted multiply-adds, XLA materializes every tap slice — the on-chip
ablation attributes ~220 ms of the 10 s/B=4 BigVGAN forward to these
chains.  Here each FIR is one dot_general with a compile-time banded
matrix over 128-row time blocks:

  out[t] = sum_m taps[m] * x[t + start + m]
         = A @ x_win,   A[i, i + m] = taps[m],  A: [128, 144]

The ~24x MAC inflation (144 vs 6 per element) is cheap on the MXU (>100
TFLOP/s bf16 vs a few TFLOP/s VPU), and the data makes ~2 HBM passes
instead of ~per-tap.  Same trick as the framed matmul-DFT mel
(ops/mel.py).  Exact: fp32 accumulation; summation order differs from the
slice form only within a 6-tap band.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

_TB = 128       # output rows per block
_HALO = 16      # extra rows read per block (>= start-span + taps - 1)


@functools.lru_cache(maxsize=64)
def _band_matrix(taps: tuple, dtype_name: str) -> jax.Array:
    a = np.zeros((_TB, _TB + _HALO), np.float64)
    for m, w in enumerate(taps):
        for i in range(_TB):
            a[i, i + m] = w
    return jnp.asarray(a, jnp.dtype(dtype_name))


def fir_gemm_t(x, taps, start: int, t_out: int):
    """Time-minor variant: out[b, c, t] = sum_m taps[m] * x[b, c, t+start+m].

    x: [B, C, T_in] — time is the MINOR axis, so the banded contraction
    happens on the lane dimension and the GEMM needs no relayout (the
    [B, T, C] variant pays a transpose per call; see the vocoder's
    "polyphase_gemm" activation which transposes once per activation
    instead)."""
    taps = tuple(float(t) for t in taps)
    assert start >= 0
    b, c, t_in = x.shape
    nb = -(-t_out // _TB)
    need = start + (nb + 1) * _TB
    if need > t_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need - t_in)))
    main = jax.lax.slice_in_dim(x, start, start + nb * _TB, axis=2)
    main = main.reshape(b, c, nb, _TB)
    ext = jax.lax.slice_in_dim(x, start + _TB, start + (nb + 1) * _TB,
                               axis=2).reshape(b, c, nb, _TB)
    win = jnp.concatenate([main, ext[..., :_HALO]], axis=3)
    a = _band_matrix(taps, str(x.dtype))
    out = jax.lax.dot_general(
        win, a,
        dimension_numbers=(((3,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [B, C, nb, TB]
    out = out.astype(x.dtype).reshape(b, c, nb * _TB)
    return jax.lax.slice_in_dim(out, 0, t_out, axis=2)


def fir_gemm(x, taps, start: int, t_out: int):
    """out[b, t, c] = sum_m taps[m] * x[b, t + start + m, c], t < t_out.

    x: [B, T_in, C] (already edge-padded by the caller so every index is
    in range: needs start >= 0 and t_out - 1 + start + len(taps) - 1 <
    T_in).  Computes via 128-row blocked banded GEMM in x.dtype operands
    with fp32 accumulation; returns x.dtype.
    """
    taps = tuple(float(t) for t in taps)
    assert start >= 0
    b, t_in, c = x.shape
    nb = -(-t_out // _TB)
    # rows needed: [start, start + nb*TB + HALO) for the windows, plus the
    # shifted-reshape trick below reads a full extra block
    need = start + (nb + 1) * _TB
    if need > t_in:
        x = jnp.pad(x, ((0, 0), (0, need - t_in), (0, 0)))
    main = jax.lax.slice_in_dim(x, start, start + nb * _TB, axis=1)
    main = main.reshape(b, nb, _TB, c)
    ext = jax.lax.slice_in_dim(x, start + _TB, start + _TB + nb * _TB,
                               axis=1).reshape(b, nb, _TB, c)
    win = jnp.concatenate([main, ext[:, :, :_HALO]], axis=2)
    a = _band_matrix(taps, str(x.dtype))
    out = jax.lax.dot_general(
        win, a,
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)            # [B, nb, C, TB]
    out = out.astype(x.dtype).transpose(0, 1, 3, 2).reshape(b, nb * _TB, c)
    return jax.lax.slice_in_dim(out, 0, t_out, axis=1)
