"""Fused anti-aliased Snake activation as a single Pallas TPU kernel.

This is the TPU-native answer to BigVGAN's fused CUDA anti-aliased
activation, which the reference disables (ref: src/model/
SpeechGenerator.py:49, ``use_cuda_kernel=False``). The composed jnp path
(ops/snake.py) materializes a 2x-rate intermediate in HBM and runs the FIRs
as convs; this kernel computes everything in fp32 on the VPU in one pass
and never materializes the upsampled signal.

Key observation: the activation is pointwise, so the 2x-upsampled signal
never needs to be interleaved. With the 12-tap kaiser filter h (upsample)
and g (downsample), stride 2:

  up[2u]   = e[u] = 2 * sum_m h[2m+1] * x[u+2-m]        (odd-tap phase)
  up[2u+1] = o[u] = 2 * sum_m h[2m]   * x[u+3-m]        (even-tap phase)
  snake applies independently to e and o
  down[t]  = sum_m g[2m+1]*snake(e)[t+m-2] + g[2m]*snake(o)[t+m-3]

so the whole op is ~24 shifted multiply-adds + one sin^2 per element —
pure VPU work with static shifts, no relayouts.

Halo handling: the time axis is tiled in [ROWS, TB] blocks; each program
receives the current block plus one 128-lane halo block holding the P
samples on each side, gathered into a SEPARATE array by the wrapper. Round
1 passed three aliased BlockSpec views of one array instead, which hung
the tunneled single-chip backend nondeterministically — distinct operands
keep the standard Mosaic pipeline (automatic double-buffering, no manual
DMA) on the well-trodden path.

Edge semantics: the wrapper replicate-pads x; within 3 samples of the
sequence ends this differs slightly from the composed path (which
replicate-pads the *upsampled* signal). Interior matches the fp32 oracle
to round-off; tests pin both properties.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from .fastmath import sin2
from jax.experimental.pallas import tpu as pltpu

from .resample import kaiser_sinc_filter1d

_P = 8          # halo samples actually needed per side (>= 7)
_ROWS = 32      # sublanes per block (4x fp32 tile)
_EPS = 1e-9


@functools.lru_cache(maxsize=4)
def _phase_filters(ratio: int = 2, kernel_size: int = 12):
    h = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    g = kaiser_sinc_filter1d(0.5 / ratio, 0.6 / ratio, kernel_size)
    # up phases (include the x2 transpose-conv gain)
    he = tuple(float(2.0 * h[2 * m + 1]) for m in range(6))   # -> e[u]
    ho = tuple(float(2.0 * h[2 * m]) for m in range(6))       # -> o[u]
    go = tuple(float(g[2 * m]) for m in range(6))             # taps on o
    ge = tuple(float(g[2 * m + 1]) for m in range(6))         # taps on e
    return he, ho, ge, go


def _kernel(cur_ref, halo_ref, alpha_ref, beta_ref, out_ref, *,
            tb: int, logscale: bool, has_beta: bool):
    a = alpha_ref[...]                      # [ROWS, 1]
    b = beta_ref[...] if has_beta else a
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    inv_b = 1.0 / (b + _EPS)

    # haloed window: left halo ++ cur ++ right halo (halo block lanes:
    # [0:P] = left halo, [P:2P] = right halo, rest padding)
    halo = halo_ref[...]
    x = jnp.concatenate(
        [halo[:, :_P], cur_ref[...], halo[:, _P:2 * _P]], axis=1)

    he, ho, ge, go = _phase_filters()
    n = tb + 8  # e/o length: u in [t0-4, t0+tb+4)

    def phase(taps, base):
        acc = taps[0] * x[:, base:base + n]
        for m in range(1, 6):
            acc = acc + taps[m] * x[:, base - m:base - m + n]
        return acc

    # e[u]: x_loc[v + P - 2 - m]; o[u]: x_loc[v + P - 1 - m]
    e = phase(he, _P - 2)
    o = phase(ho, _P - 1)

    def snake(v):
        # pi-periodic fast sin^2 (ops/fastmath.py): Mosaic's full-range
        # jnp.sin measured ~half this kernel's runtime on v5e
        return v + inv_b * sin2(a * v)

    se = snake(e)
    so = snake(o)

    acc = ge[0] * se[:, 2:2 + tb] + go[0] * so[:, 1:1 + tb]
    for m in range(1, 6):
        acc = acc + ge[m] * se[:, m + 2:m + 2 + tb] \
                  + go[m] * so[:, m + 1:m + 1 + tb]
    out_ref[...] = acc.astype(out_ref.dtype)


def fused_snake_pallas(x, alpha, beta=None, *, logscale: bool = True,
                       block_t: int = 2048, interpret: bool = False):
    """x: [B, C, T]; alpha/beta: [C]. Returns [B, C, T].

    Fused 2x-up -> snake(-beta) -> 2x-down, equivalent to
    ``anti_aliased_activation(x, snake_beta(...))`` away from sequence edges.
    """
    bsz, ch, t = x.shape
    has_beta = beta is not None

    bc = bsz * ch
    bc_pad = -(-bc // _ROWS) * _ROWS
    block_t = min(block_t, max(-(-t // 128) * 128, 128))
    t_pad = -(-t // block_t) * block_t
    nt = t_pad // block_t

    xf = x.reshape(bc, t)
    # replicate pad P samples each side + right padding to a block multiple
    left = jnp.repeat(xf[:, :1], _P, axis=1)
    right = jnp.repeat(xf[:, -1:], t_pad - t + _P, axis=1)
    xg = jnp.concatenate([left, xf, right], axis=1)   # [bc, t_pad + 2P]
    xg = jnp.pad(xg, ((0, bc_pad - bc), (0, 0)))
    # per-block halo array: lanes [0:P] = P samples left of the block,
    # [P:2P] = P samples right of it; one 128-lane block per (b, i)
    halo_blocks = []
    for i in range(nt):
        lh = xg[:, i * block_t:i * block_t + _P]
        rh = xg[:, i * block_t + _P + block_t:
                i * block_t + 2 * _P + block_t]
        halo_blocks.append(jnp.pad(jnp.concatenate([lh, rh], axis=1),
                                   ((0, 0), (0, 128 - 2 * _P))))
    halos = jnp.concatenate(halo_blocks, axis=1)      # [bc_pad, nt * 128]
    xc = xg[:, _P:_P + t_pad]                         # data blocks

    al = jnp.tile(alpha, (bsz,))
    al = jnp.pad(al, (0, bc_pad - bc)).reshape(bc_pad, 1)
    if has_beta:
        be = jnp.tile(beta, (bsz,))
        be = jnp.pad(be, (0, bc_pad - bc)).reshape(bc_pad, 1)
    else:
        be = al

    out = pl.pallas_call(
        functools.partial(_kernel, tb=block_t, logscale=logscale,
                          has_beta=has_beta),
        grid=(bc_pad // _ROWS, nt),
        in_specs=[
            pl.BlockSpec((_ROWS, block_t), lambda b, i: (b, i)),  # cur
            pl.BlockSpec((_ROWS, 128), lambda b, i: (b, i)),      # halos
            pl.BlockSpec((_ROWS, 1), lambda b, i: (b, 0)),
            pl.BlockSpec((_ROWS, 1), lambda b, i: (b, 0)),
        ],
        out_specs=pl.BlockSpec((_ROWS, block_t), lambda b, i: (b, i)),
        out_shape=jax.ShapeDtypeStruct((bc_pad, t_pad), x.dtype),
        interpret=interpret,
    )(xc, halos, al, be)
    return out[:bc, :t].reshape(bsz, ch, t)
