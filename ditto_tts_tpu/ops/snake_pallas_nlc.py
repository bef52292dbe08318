"""Fused anti-aliased Snake kernel, channels-last ([B, T, C]) layout.

Companion to ops/snake_pallas.py (same polyphase math, NCL layout); this
variant matches the vocoder's TPU fast path (layout="nlc", tap-sum GEMM
convs), where the on-chip ablation shows XLA's lowering of the composed
polyphase activation dominates the vocoder: of 532 ms e2e, the FIR tap
chains cost ~222 ms and the two-phase snake ~114 ms because XLA
materializes the e/o/se/so intermediates in HBM.  Fused, each activation
reads x once and writes the result once — everything else lives in VMEM.

Layout: lanes = channels (128-tiled), sublanes = time.  The polyphase
shifts become static sublane slices of the block plus an 8-row halo on
each side, passed as a SEPARATE operand (aliased BlockSpec views of one
array hung the tunneled backend in round 1 — see ops/snake_pallas.py).

Edge semantics: the wrapper replicate-pads x in time; within 3 samples of
the sequence ends this differs slightly from the composed/polyphase path
(which replicate-pads the 2x-rate signal).  Interior matches the fp32
polyphase oracle to round-off; tests pin both.

Behavioral spec: BigVGAN Activation1d with use_cuda_kernel=False, which
the reference runs unfused (ref: src/model/SpeechGenerator.py:47-52).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from .fastmath import sin2
from .snake_pallas import _phase_filters

_P = 8          # halo rows per side (>= 7 needed)
_EPS = 1e-9


def _kernel(x_ref, halo_ref, a_ref, b_ref, o_ref, *,
            tb: int, logscale: bool, has_beta: bool):
    a = a_ref[...].astype(jnp.float32)             # [1, 128]
    b = b_ref[...].astype(jnp.float32) if has_beta else a
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    inv_b = 1.0 / (b + _EPS)

    halo = halo_ref[0].astype(jnp.float32)         # [2P, 128]
    x = jnp.concatenate(
        [halo[:_P], x_ref[0].astype(jnp.float32), halo[_P:2 * _P]], axis=0)

    he, ho, ge, go = _phase_filters()
    n = tb + 8                                     # e/o rows: u in [-4, tb+4)

    def phase(taps, base):
        acc = taps[0] * x[base:base + n]
        for m in range(1, 6):
            acc = acc + taps[m] * x[base - m:base - m + n]
        return acc

    e = phase(he, _P - 2)
    o = phase(ho, _P - 1)

    def snake(v):
        # pi-periodic fast sin^2 (ops/fastmath.py): Mosaic's full-range
        # jnp.sin measured ~half this kernel's runtime on v5e
        return v + inv_b * sin2(a * v)

    se = snake(e)
    so = snake(o)

    acc = ge[0] * se[2:2 + tb] + go[0] * so[1:1 + tb]
    for m in range(1, 6):
        acc = acc + ge[m] * se[m + 2:m + 2 + tb] \
                  + go[m] * so[m + 1:m + 1 + tb]
    o_ref[0] = acc.astype(o_ref.dtype)


def fused_snake_nlc(x, alpha, beta=None, *, logscale: bool = True,
                    block_t: int = 512, interpret: bool = False):
    """x: [B, T, C]; alpha/beta: [C].  Returns [B, T, C].

    Fused 2x-up -> snake(-beta) -> 2x-down, equal to the polyphase path
    away from sequence edges.  Channels are padded to a 128 multiple and
    time to a block multiple (replicate edge rows feed the halos).
    """
    bsz, t, ch = x.shape
    has_beta = beta is not None

    ch_pad = -(-ch // 128) * 128
    block_t = min(block_t, max(-(-t // 8) * 8, 8))
    t_pad = -(-t // block_t) * block_t
    nt = t_pad // block_t

    # replicate-pad P rows each side; right side also covers block padding
    left = jnp.repeat(x[:, :1], _P, axis=1)
    right = jnp.repeat(x[:, -1:], t_pad - t + _P, axis=1)
    xg = jnp.concatenate([left, x, right], axis=1)       # [B, t_pad+2P, C]
    xg = jnp.pad(xg, ((0, 0), (0, 0), (0, ch_pad - ch)))

    halos = jnp.concatenate(
        [jnp.concatenate(
            [xg[:, i * block_t:i * block_t + _P],
             xg[:, _P + (i + 1) * block_t:_P + (i + 1) * block_t + _P]],
            axis=1) for i in range(nt)], axis=1)         # [B, nt*2P, Cp]
    xc = xg[:, _P:_P + t_pad]

    a = jnp.pad(alpha, (0, ch_pad - ch)).reshape(1, ch_pad)
    b = (jnp.pad(beta, (0, ch_pad - ch)).reshape(1, ch_pad)
         if has_beta else a)

    out = pl.pallas_call(
        functools.partial(_kernel, tb=block_t, logscale=logscale,
                          has_beta=has_beta),
        grid=(bsz, ch_pad // 128, nt),
        in_specs=[
            pl.BlockSpec((1, block_t, 128), lambda b, c, i: (b, i, c)),
            pl.BlockSpec((1, 2 * _P, 128), lambda b, c, i: (b, i, c)),
            pl.BlockSpec((1, 128), lambda b, c, i: (0, c)),
            pl.BlockSpec((1, 128), lambda b, c, i: (0, c)),
        ],
        out_specs=pl.BlockSpec((1, block_t, 128), lambda b, c, i: (b, i, c)),
        out_shape=jax.ShapeDtypeStruct((bsz, t_pad, ch_pad), x.dtype),
        interpret=interpret,
    )(xc, halos, a, b)
    return out[:, :t, :ch]
