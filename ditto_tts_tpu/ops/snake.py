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

import jax
import jax.numpy as jnp

from .resample import (_replicate_pad, downsample1d, kaiser_sinc_filter1d,
                       upsample1d)

_EPS = 1e-9


def _chan_shape(x, channel_axis: int):
    """Broadcast shape placing a [C] param on ``channel_axis`` of x."""
    axis = channel_axis % x.ndim
    return tuple(-1 if i == axis else 1 for i in range(x.ndim))


def _sin2(v, fast: bool):
    """sin^2; ``fast`` uses the pi-periodic reduction (ops/fastmath.py,
    ~1e-5 abs) — production vocoder path only, oracle paths stay exact."""
    if fast:
        from .fastmath import sin2
        return sin2(v.astype(jnp.float32)).astype(v.dtype)
    s = jnp.sin(v)
    return s * s


def snake(x, alpha, *, logscale: bool = True, channel_axis: int = 1,
          fast: bool = False):
    """x with channels on ``channel_axis`` (default [B, C, T]); alpha: [C].
    Computes in x.dtype (exp/recip in fp32)."""
    shape = _chan_shape(x, channel_axis)
    a = jnp.exp(alpha) if logscale else alpha
    inv_a = (1.0 / (a + _EPS)).astype(x.dtype).reshape(shape)
    a = a.astype(x.dtype).reshape(shape)
    return x + inv_a * _sin2(a * x, fast)


def snake_beta(x, alpha, beta, *, logscale: bool = True,
               channel_axis: int = 1, fast: bool = False):
    """x with channels on ``channel_axis`` (default [B, C, T]); alpha,
    beta: [C] (BigVGAN SnakeBeta).

    exp/reciprocal run in the param dtype (fp32); the per-element work is
    carried in x.dtype so bf16 signals stay bf16 (no silent promotion)."""
    shape = _chan_shape(x, channel_axis)
    if logscale:
        a = jnp.exp(alpha)
        b = jnp.exp(beta)
    else:
        a, b = alpha, beta
    inv_b = (1.0 / (b + _EPS)).astype(x.dtype).reshape(shape)
    a = a.astype(x.dtype).reshape(shape)
    return x + inv_b * _sin2(a * x, fast)


def anti_aliased_activation(x, act_fn, *, up_ratio: int = 2,
                            down_ratio: int = 2):
    """BigVGAN Activation1d: upsample -> pointwise activation -> downsample."""
    y = upsample1d(x, up_ratio)
    y = act_fn(y)
    return downsample1d(y, down_ratio)


def polyphase_anti_aliased_activation(x, act_fn, *, kernel_size: int = 12,
                                      time_axis: int = -1):
    """Exact polyphase re-formulation of ``anti_aliased_activation`` (2x/2x).

    The 2x-rate signal is never materialized: the upsample FIR splits into
    even/odd 6-tap phases e[u] = y[2u], o[u] = y[2u+1] computed at 1x rate,
    the pointwise activation applies to each phase, and the anti-aliased
    decimation recombines them with the corresponding 6-tap phases of the
    low-pass filter. Matches the composed path (including its replicate-pad
    edge semantics, where the 2x-rate right edge replicates the *odd* phase
    and the left edge the *even* phase) to fp32 round-off.

    Everything is static slices + multiply-adds, so XLA fuses it into a few
    VPU passes — no depthwise convs, no stride-2/lhs-dilated convolutions,
    and an HLO an order of magnitude smaller than the composed form. The
    vocoder's standalone activations (act_post, narrow widths) use this
    form; inside AMP blocks at 96-384 channels the default is the fused
    act->conv Pallas kernel (ops/act_conv_pallas.py, aa_impl="fused_conv"),
    which embeds the same decomposition ahead of the conv taps.

    x: time on ``time_axis`` (default last, i.e. [B, C, T]; pass
    time_axis=1 for the channels-last [B, T, C] vocoder path).
    """
    if kernel_size != 12:
        raise ValueError("polyphase offsets are derived for kernel_size=12 "
                         "(the BigVGAN 2x ratio)")
    half = kernel_size // 2
    h = kaiser_sinc_filter1d(0.25, 0.3, kernel_size)
    pad = half - 1
    axis = time_axis % x.ndim
    t = x.shape[axis]

    def sl(src, start, n):
        return jax.lax.slice_in_dim(src, start, start + n, axis=axis)

    def rep(v, n):
        return jnp.repeat(v, n, axis=axis)

    xt = jnp.concatenate([rep(sl(x, 0, 1), pad), x,
                          rep(sl(x, t - 1, 1), pad)], axis=axis)

    def taps(weights, base, src, n):
        acc = float(weights[0]) * sl(src, base, n)
        for r in range(1, half):
            acc = acc + float(weights[r]) * sl(src, base + r, n)
        return acc

    # upsample phases (x2 transposed-conv gain folded in)
    e = taps(2.0 * h[0::2], pad - 3, xt, t)
    o = taps(2.0 * h[1::2], pad - 2, xt, t)
    se = act_fn(e)
    so = act_fn(o)

    # decimation: z[t] = sum_r g[2r] o[t+r-3] + g[2r+1] e[t+r-2], with the
    # 2x-rate replicate edges (left pads = e[0], right pads = o[-1])
    lval = sl(se, 0, 1)
    rval = sl(so, t - 1, 1)
    e_p = jnp.concatenate([rep(lval, half - 4), se,
                           rep(rval, half - 3)], axis=axis)
    o_p = jnp.concatenate([rep(lval, half - 3), so,
                           rep(rval, half - 4)], axis=axis)
    return taps(h[0::2], 0, o_p, t) + taps(h[1::2], 0, e_p, t)


def polyphase_anti_aliased_activation_gemm(x, act_fn, *,
                                           kernel_size: int = 12):
    """Same math as ``polyphase_anti_aliased_activation`` with the four
    6-tap FIRs lowered as banded GEMMs (ops/fir_gemm.py) — the MXU
    formulation for the TPU fast path.

    x: [B, T, C] (channels-last).  The band contraction must run on the
    minor axis to avoid a relayout per FIR, so the activation transposes
    to [B, C, T] once on entry and back once on exit — two bandwidth
    passes total instead of XLA's ~per-tap materialization of the slice
    form.  ``act_fn`` must accept the channels-second layout (pass
    channel_axis=1).  Identical values up to fp summation order within a
    tap.
    """
    if kernel_size != 12:
        raise ValueError("polyphase offsets are derived for kernel_size=12")
    from .fir_gemm import fir_gemm_t

    half = kernel_size // 2
    h = kaiser_sinc_filter1d(0.25, 0.3, kernel_size)
    pad = half - 1
    t = x.shape[1]
    xt = x.transpose(0, 2, 1)                        # [B, C, T]

    def rep(v, n):
        return jnp.repeat(v, n, axis=2)

    xt = jnp.concatenate([rep(xt[:, :, :1], pad), xt,
                          rep(xt[:, :, -1:], pad)], axis=2)
    e = fir_gemm_t(xt, 2.0 * h[0::2], pad - 3, t)
    o = fir_gemm_t(xt, 2.0 * h[1::2], pad - 2, t)
    se = act_fn(e)
    so = act_fn(o)

    lval = se[:, :, :1]
    rval = so[:, :, -1:]
    e_p = jnp.concatenate([rep(lval, half - 4), se, rep(rval, half - 3)],
                          axis=2)
    o_p = jnp.concatenate([rep(lval, half - 3), so, rep(rval, half - 4)],
                          axis=2)
    z = fir_gemm_t(o_p, h[0::2], 0, t) + fir_gemm_t(e_p, h[1::2], 0, t)
    return z.transpose(0, 2, 1)
