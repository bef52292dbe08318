"""1-D convolution primitives with torch semantics (NCL layout).

Weight layouts follow torch so HF checkpoints map in directly:
  conv1d:           [out_ch, in_ch, k]
  conv_transpose1d: [in_ch, out_ch, k]

Includes the EnCodec-style causal/reflect padding helpers used by the codec
(HF transformers EncodecConv1d/_get_extra_padding_for_conv1d semantics —
behavioral spec only, implementation is lax.conv_general_dilated which XLA
lowers onto the MXU as an implicit GEMM).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp


def conv1d(x, weight, bias=None, *, stride=1, dilation=1, groups=1,
           compute_dtype=None):
    """x: [N, C, L]; weight: [O, I/groups, K]. 'VALID' padding.

    ``compute_dtype`` (e.g. bfloat16) casts the operands for the MXU while
    keeping fp32 accumulation and an fp32 result + bias add — the standard
    TPU mixed-precision convolution."""
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    # bias joins the fp32 accumulator BEFORE the output cast: adding an
    # fp32 bias to an already-cast bf16 result would silently promote the
    # carried signal back to fp32 (jnp type promotion), doubling the HBM
    # traffic of every downstream op
    if bias is not None:
        y = y + bias[None, :, None].astype(y.dtype)
    return y.astype(out_dtype)


def conv_transpose1d(x, weight, bias=None, *, stride=1, compute_dtype=None):
    """x: [N, C, L]; weight: [I, O, K]. torch output length (L-1)*s + K."""
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    y = jax.lax.conv_transpose(
        x, weight,
        strides=(stride,),
        padding="VALID",
        # torch convtr weight is [in, out, k]; with transpose_kernel=True the
        # kernel is read as the gradient of a forward conv, i.e. 'OIH' here.
        dimension_numbers=("NCH", "OIH", "NCH"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:  # fp32 add pre-cast; see conv1d
        y = y + bias[None, :, None].astype(y.dtype)
    return y.astype(out_dtype)


def conv1d_nlc(x, weight, bias=None, *, stride=1, dilation=1, groups=1,
               compute_dtype=None):
    """Channels-last conv: x [N, L, C]; weight [O, I/groups, K] (torch
    layout, transposed to HIO inside — XLA folds the transpose into its
    kernel layout assignment). 'VALID' padding.

    On TPU, NHC/HWIO is the layout the conv lowering targets natively
    (C is the contraction axis of the implicit GEMM); feeding NCH makes
    XLA insert layout transposes around every conv."""
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    y = jax.lax.conv_general_dilated(
        x, weight,
        window_strides=(stride,),
        padding="VALID",
        rhs_dilation=(dilation,),
        dimension_numbers=("NHC", "OIH", "NHC"),
        feature_group_count=groups,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:  # fp32 add pre-cast; see conv1d
        y = y + bias[None, None, :].astype(y.dtype)
    return y.astype(out_dtype)


def conv_transpose1d_nlc(x, weight, bias=None, *, stride=1,
                         compute_dtype=None):
    """Channels-last transposed conv: x [N, L, C]; weight [I, O, K] (torch
    layout). torch output length (L-1)*s + K."""
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    y = jax.lax.conv_transpose(
        x, weight,
        strides=(stride,),
        padding="VALID",
        dimension_numbers=("NHC", "OIH", "NHC"),
        transpose_kernel=True,
        preferred_element_type=jnp.float32,
    )
    if bias is not None:  # fp32 add pre-cast; see conv1d
        y = y + bias[None, None, :].astype(y.dtype)
    return y.astype(out_dtype)


def conv1d_nlc_gemm(x, weight, bias=None, *, dilation=1, compute_dtype=None):
    """Channels-last 'VALID' conv as an explicit tap-sum of GEMMs.

    y[b, t, o] = sum_m  x[b, t + m*d, :] @ W[o, :, m]

    Each tap is a [B*T, C_in] x [C_in, C_out] dot_general accumulated in
    fp32 — the shape the MXU natively tiles — instead of XLA's 1-D conv
    emitter (which at BigVGAN's wide-channel stages runs an order of
    magnitude below matmul peak on TPU). The per-tap inputs are static
    slices of one padded operand, so no im2col patch matrix is ever
    materialized. Stride 1 only (all BigVGAN resblock convs).

    x: [N, L, C]; weight: [O, I, K] (torch conv1d layout).
    """
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    k = weight.shape[-1]
    t_out = x.shape[1] - (k - 1) * dilation
    # fp32 inter-tap accumulation: XLA materializes the partials in HBM
    # (the dominant conv cost at ~2 ms/conv) but a bf16 carry costs ~2 dB
    # of output SNR (drops below the 40 dB contract in
    # tests/test_vocoder.py) — the Pallas kernel in ops/conv_pallas.py
    # keeps the fp32 accumulator in VMEM instead.
    acc = None
    for m in range(k):
        xm = jax.lax.slice_in_dim(x, m * dilation, m * dilation + t_out,
                                  axis=1)
        ym = jax.lax.dot_general(
            xm, weight[:, :, m],
            dimension_numbers=(((2,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)        # [N, T, O]
        acc = ym if acc is None else acc + ym
    if bias is not None:  # fp32 add pre-cast; see conv1d
        acc = acc + bias[None, None, :].astype(acc.dtype)
    return acc.astype(out_dtype)


def _poly_weight(weight, r):
    """[I, O, K] transposed-conv weight -> [r*O, I, taps] forward-conv
    weight for the polyphase decomposition (taps = K // r).

    Derivation: y[n] = sum_t x[t] W[:, :, n - t*r]; with n = u*r + p and
    j = u - t in [0, taps):  y[u*r + p] = sum_j x[u - j] W[:, :, p + j*r].
    As a VALID conv over x zero-padded (taps-1) each side, tap m reads
    x[u - (taps-1-m)], so the forward kernel is the j-flipped phase p of W.
    Output channel index is p*O + o, making the [N, U, r, O] -> [N, U*r, O]
    interleave a free reshape in channels-last layout."""
    i, o, k = weight.shape
    taps = k // r
    w = weight.reshape(i, o, taps, r)[:, :, ::-1, :]   # [I, O, m, p]
    return w.transpose(3, 1, 0, 2).reshape(r * o, i, taps)


def conv_transpose1d_poly(x, weight, bias=None, *, stride=1,
                          compute_dtype=None, layout="ncl", gemm=False,
                          conv_fn=None):
    """Transposed conv lowered as ONE dense VALID conv + reshape.

    Exactly equal to ``conv_transpose1d(_nlc)`` (same output length
    (L-1)*stride + K; fp summation order differs only within a tap) when
    K is divisible by stride — BigVGAN (k=2r) and EnCodec decoders all
    satisfy this. Avoids lhs-dilated convolution: XLA's TPU lowering for
    lhs dilation either computes over inserted zeros or relayouts; the
    polyphase form is a plain implicit GEMM with r*O output channels, and
    in NLC the phase interleave is a free reshape (row-major [U, r, O]).

    x: [N, C, L] ("ncl") or [N, L, C] ("nlc"); weight: [I, O, K] torch
    transposed-conv layout.
    """
    r = stride
    i, o, k = weight.shape
    if r == 1 or k % r != 0:
        f = conv_transpose1d if layout == "ncl" else conv_transpose1d_nlc
        return f(x, weight, bias, stride=stride, compute_dtype=compute_dtype)
    taps = k // r
    w2 = _poly_weight(weight, r)
    if layout == "nlc":
        xp = jnp.pad(x, ((0, 0), (taps - 1, taps - 1), (0, 0)))
        # conv_fn overrides the lowering of the equivalent forward conv
        # (e.g. ops/conv_pallas.py's VMEM-accumulator kernel)
        cf = conv_fn or (conv1d_nlc_gemm if gemm else conv1d_nlc)
        y = cf(xp, w2, None, compute_dtype=compute_dtype)
        n, u, _ = y.shape
        y = y.reshape(n, u * r, o)
        if bias is not None:  # cast: fp32 bias must not promote a bf16 carry
            y = y + bias[None, None, :].astype(y.dtype)
        return y
    xp = jnp.pad(x, ((0, 0), (0, 0), (taps - 1, taps - 1)))
    y = (conv_fn or conv1d)(xp, w2, None, compute_dtype=compute_dtype)
    n, _, u = y.shape
    # [N, r*O, U]: channel = p*O + o -> [N, O, U*r] with time = u*r + p
    y = y.reshape(n, r, o, u).transpose(0, 2, 3, 1).reshape(n, o, u * r)
    if bias is not None:  # cast: fp32 bias must not promote a bf16 carry
        y = y + bias[None, :, None].astype(y.dtype)
    return y


def pad1d(x, paddings, mode="zero"):
    """Pad last axis by (left, right). Reflect handles short inputs by
    zero-extending first (EnCodec edge-case semantics)."""
    left, right = paddings
    if mode == "reflect":
        length = x.shape[-1]
        max_pad = max(left, right)
        extra = 0
        if length <= max_pad:
            extra = max_pad - length + 1
            x = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((0, extra),))
        y = jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((left, right),),
                    mode="reflect")
        if extra > 0:
            end = y.shape[-1] - extra
            y = y[..., :end]
        return y
    return jnp.pad(x, ((0, 0),) * (x.ndim - 1) + ((left, right),))


def _extra_padding_for_conv1d(length, kernel_size, stride, padding_total):
    n_frames = (length - kernel_size + padding_total) / stride + 1
    ideal = (math.ceil(n_frames) - 1) * stride + (kernel_size - padding_total)
    return max(ideal - length, 0)


def causal_conv1d(x, weight, bias=None, *, stride=1, dilation=1,
                  causal=True, pad_mode="reflect", conv_fn=None):
    """EnCodec conv with causal/centered auto-padding.

    Matches HF EncodecConv1d.forward: effective kernel = (k-1)*d + 1,
    padding_total = eff_k - stride, plus extra right padding so the final
    frame is complete; causal puts all of padding_total on the left.
    ``conv_fn`` overrides the stride-1 conv lowering (e.g. the time-minor
    Pallas kernel); strided convs always use lax.
    """
    k = weight.shape[-1]
    eff_k = (k - 1) * dilation + 1
    padding_total = eff_k - stride
    extra = _extra_padding_for_conv1d(x.shape[-1], eff_k, stride,
                                      padding_total)
    if causal:
        x = pad1d(x, (padding_total, extra), mode=pad_mode)
    else:
        right = padding_total // 2
        left = padding_total - right
        x = pad1d(x, (left, right + extra), mode=pad_mode)
    if conv_fn is not None and stride == 1:
        return conv_fn(x, weight, bias, dilation=dilation)
    return conv1d(x, weight, bias, stride=stride, dilation=dilation)


def causal_conv_transpose1d(x, weight, bias=None, *, stride=1, causal=True,
                            trim_right_ratio=1.0):
    """EnCodec transposed conv: full output then trim padding_total
    (causal: ceil(pt * trim_right_ratio) from the right, rest from left)."""
    k = weight.shape[-1]
    padding_total = k - stride
    y = conv_transpose1d(x, weight, bias, stride=stride)
    if causal:
        right = math.ceil(padding_total * trim_right_ratio)
        left = padding_total - right
    else:
        right = padding_total // 2
        left = padding_total - right
    end = y.shape[-1] - right
    return y[..., left:end]
