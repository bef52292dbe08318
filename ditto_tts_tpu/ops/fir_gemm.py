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
