"""Fused anti-aliased-Snake -> conv1d Pallas kernel (channels-last).

The BigVGAN AMP block alternates anti-aliased SnakeBeta activations with
dilated convs.  Even with the VMEM-accumulator conv kernel
(ops/conv_pallas.py), each activation still costs a full HBM read+write
of the stage tensor — and XLA's lowering of the slice-form polyphase
activation materializes tap intermediates on top (the round-3 ablation
put the FIR chains + snake at ~2/3 of the vocoder).  This kernel computes

    y = conv1d(zero_pad(AA_snake(x), conv_pad), W, dilation)

in ONE pass: x is read once, the polyphase 2x-up -> snake -> 2x-down
activation is evaluated in fp32 entirely in VMEM (same math as
ops/snake_pallas_nlc.py), the activation rows outside [0, T) are zeroed
(matching the unfused path's zero-padded conv input), and the K tap
contractions run on the MXU with an fp32 VMEM accumulator.

Blocking follows conv_pallas v2: the input is passed twice with block
indices t and t+1 (halo without materializing windows); grid is
(batch, time, oc) with oc innermost so the x block stays resident (the
activation recompute per oc block is a few microseconds of VPU time —
HBM traffic is what matters).

Edge semantics: within ~6 samples of the sequence ends the in-kernel
activation (replicate-padded x, plain taps) differs slightly from the
polyphase oracle's 2x-rate replicate edges — the same caveat as
ops/snake_pallas_nlc.py; tests pin the interior exactly and the edges to
a loose tolerance.

Behavioral spec: BigVGAN Activation1d (use_cuda_kernel=False) followed by
Conv1d, which the reference runs as separate fp32 torch modules
(ref: src/model/SpeechGenerator.py:47-52).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from .fastmath import sin2
from jax.experimental.pallas import tpu as pltpu

from .resample import kaiser_sinc_filter1d

_EPS = 1e-9
_AH = 8                  # activation halo rows per side (needs >= 7)


@functools.lru_cache(maxsize=1)
def _taps():
    """Forward-applied polyphase taps (ops/snake.py conventions):
    e[t] = sum_r 2h[2r]   x[t+r-3];  o[t] = sum_r 2h[2r+1] x[t+r-2];
    z[t] = sum_r  h[2r]  so[t+r-3] +  h[2r+1] se[t+r-2]."""
    h = kaiser_sinc_filter1d(0.25, 0.3, 12)
    e_up = tuple(float(2.0 * h[2 * r]) for r in range(6))
    o_up = tuple(float(2.0 * h[2 * r + 1]) for r in range(6))
    z_o = tuple(float(h[2 * r]) for r in range(6))
    z_e = tuple(float(h[2 * r + 1]) for r in range(6))
    return e_up, o_up, z_e, z_o


def _kernel(xa_ref, xb_ref, w_ref, b_ref, al_ref, be_ref, o_ref, acc_ref,
            *, k: int, dil: int, bt: int, ca: int, halo: int,
            t_total: int, logscale: bool, has_beta: bool, compute_dtype):
    n_act = bt + 2 * ca          # act rows t in [-ca, bt + ca) rel. block
    n_ph = n_act + 6             # phase rows t' in [-3, n_act + 3)

    # NB: the activation body must stay UNconditional — wrapping it in
    # pl.when (to skip recompute across an oc sweep) crashes the Mosaic
    # compiler; instead the grid has no oc dimension (full-O weight
    # blocks) so the activation runs exactly once per time block.
    t0 = pl.program_id(1) * bt

    # window covers global x rows [t0 - ca - _AH, t0 + bt + ca + _AH).
    # The activation runs in fp32: Mosaic crashes lowering the bf16
    # odd-offset phase slice chains (empirical; fp32 compiles and the
    # arrays live only in VMEM so the precision is free).
    xw = jnp.concatenate([xa_ref[0], xb_ref[0][:halo]],
                         axis=0).astype(jnp.float32)

    a = al_ref[...].astype(jnp.float32)                # [1, C]
    b = be_ref[...].astype(jnp.float32) if has_beta else a
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    inv_b = 1.0 / (b + _EPS)

    e_up, o_up, z_e, z_o = _taps()

    def phase(taps, base):
        acc = taps[0] * xw[base:base + n_ph]
        for m in range(1, 6):
            acc = acc + taps[m] * xw[base + m:base + m + n_ph]
        return acc

    # e[t] = sum_r 2h[2r] x[t+r-3]; phase rows start at t = -3 -> xw
    # base (-3) - 3 + _AH = _AH - 6;  o[t] uses x[t+r-2] -> _AH - 5
    e = phase(e_up, _AH - 6)
    o = phase(o_up, _AH - 5)

    def snake(v):
        # pi-periodic fast sin^2 (ops/fastmath.py): Mosaic's full-range
        # jnp.sin measured ~half this kernel's runtime on v5e
        return v + inv_b * sin2(a * v)

    se = snake(e)
    so = snake(o)

    # z[t] = sum_r h[2r] so[t+r-3] + h[2r+1] se[t+r-2] (offset +3)
    z = z_o[0] * so[0:n_act] + z_e[0] * se[1:1 + n_act]
    for m in range(1, 6):
        z = z + z_o[m] * so[m:m + n_act] \
              + z_e[m] * se[m + 1:m + 1 + n_act]

    # zero activation rows outside [0, T): the unfused path zero-pads
    # the ACT OUTPUT before the VALID conv
    g_row = t0 - ca + jax.lax.broadcasted_iota(jnp.int32, z.shape, 0)
    z = jnp.where((g_row >= 0) & (g_row < t_total), z, 0.0)
    z = z.astype(compute_dtype)

    acc_ref[...] = b_ref[...] + jax.lax.dot_general(
        z[:bt], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    for m in range(1, k):
        acc_ref[...] += jax.lax.dot_general(
            z[m * dil:m * dil + bt], w_ref[m],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def aa_snake_conv1d(x, alpha, beta, weight, bias=None, *, dilation: int = 1,
                    logscale: bool = True, compute_dtype=None,
                    block_t: int = 0, interpret: bool = False):
    """x: [B, T, C]; alpha/beta: [C] (beta None => plain Snake);
    weight: [O, C, K] (torch conv1d layout).  Returns the 'SAME'
    conv of the anti-aliased Snake activation of x: [B, T, O] in x.dtype.
    """
    out_dtype = x.dtype
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype

    b_, t, c = x.shape
    o, i, k = weight.shape
    assert i == c, (i, c)
    ca = (k * dilation - dilation) // 2
    has_beta = beta is not None

    halo = -(-(2 * (ca + _AH)) // 16) * 16
    if -(-t // 16) * 16 < halo:
        # sequence too short for the two-block halo scheme — run the
        # unfused oracle path (polyphase activation + gemm tap-sum conv),
        # which handles any length
        from ..nn.conv import conv1d_nlc_gemm
        from .snake import polyphase_anti_aliased_activation, snake, \
            snake_beta

        def fn(v):
            if has_beta:
                return snake_beta(v, alpha, beta, logscale=logscale,
                                  channel_axis=-1)
            return snake(v, alpha, logscale=logscale, channel_axis=-1)

        z = polyphase_anti_aliased_activation(x, fn, time_axis=1)
        z = jnp.pad(z, ((0, 0), (ca, ca), (0, 0)))
        return conv1d_nlc_gemm(z, weight, bias, dilation=dilation,
                               compute_dtype=compute_dtype)
    isz = jnp.dtype(cdt).itemsize
    if block_t <= 0:
        # x blocks (2 copies, 2 buffers) + ~6 phase/act temps (carry
        # dtype) + fp32 acc + tap temp + out, after the full-O weight
        # block; ~12 MB budget. No oc grid dim: the activation runs once
        # per time block (pl.when-gated recompute-avoidance crashes
        # Mosaic; see kernel note).
        denom = 8 * c * isz + 24 * c + 12 * o   # fp32 act temps
        budget = max(12_000_000 - 2 * k * c * o * isz, denom * 256)
        block_t = min(max((budget // denom) // 256 * 256, 256), 2048)
    bt = min(block_t, -(-t // 16) * 16)
    assert halo <= bt, (halo, bt)
    nt = -(-t // bt)

    # replicate-pad so window row 0 = global x row t0 - ca - _AH, and the
    # xb (t+1) block exists for the last time block
    lpad = ca + _AH
    need_r = nt * bt + halo + bt - (t + lpad)
    left = jnp.repeat(x[:, :1], lpad, axis=1)
    right = jnp.repeat(x[:, -1:], max(need_r, 0), axis=1)
    xg = jnp.concatenate([left, x, right], axis=1)
    if xg.dtype != cdt:
        xg = xg.astype(cdt)

    w2 = jnp.transpose(weight, (2, 1, 0)).astype(cdt)      # [K, C, O]
    b_vec = (bias if bias is not None
             else jnp.zeros((o,), jnp.float32)).astype(jnp.float32)
    b_vec = b_vec.reshape(1, o)
    al = alpha.reshape(1, c).astype(jnp.float32)
    be = (beta if has_beta else alpha).reshape(1, c).astype(jnp.float32)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dil=dilation, bt=bt, ca=ca,
                          halo=halo, t_total=t, logscale=logscale,
                          has_beta=has_beta, compute_dtype=cdt),
        grid=(b_, nt),
        in_specs=[
            pl.BlockSpec((1, bt, c), lambda b, ti: (b, ti, 0)),
            pl.BlockSpec((1, bt, c), lambda b, ti: (b, ti + 1, 0)),
            pl.BlockSpec((k, c, o), lambda b, ti: (0, 0, 0)),
            pl.BlockSpec((1, o), lambda b, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda b, ti: (0, 0)),
            pl.BlockSpec((1, c), lambda b, ti: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, bt, o), lambda b, ti: (b, ti, 0)),
        out_shape=jax.ShapeDtypeStruct((b_, nt * bt, o), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, o), jnp.float32)],
        interpret=interpret,
    )(xg, xg, w2, b_vec, al, be)
    return out[:, :t]


# ---------------------------------------------------------------------------
# time-minor (NCL) fused kernel for the narrow hybrid-carry stages
# ---------------------------------------------------------------------------

def _kernel_ncl(xa_ref, xb_ref, w_ref, b_ref, al_ref, be_ref, *rest,
                k: int, dil: int, bt: int, ca: int, halo: int,
                t_total: int, logscale: bool, has_beta: bool,
                has_res: bool, compute_dtype):
    if has_res:
        res_ref, o_ref, zw_ref = rest
    else:
        o_ref, zw_ref = rest
    n_act = bt + 2 * ca          # act cols t in [-ca, bt + ca) rel. block
    n_ph = n_act + 6             # phase cols t' in [-3, n_act + 3)

    t0 = pl.program_id(1) * bt

    # window covers global x cols [t0 - ca - _AH, t0 + bt + ca + _AH);
    # activation in fp32 (same Mosaic constraint as the NLC kernel).
    # Time sits on LANES here, so the FIR taps are lane-offset slices
    # (an in-kernel transpose to put time on sublanes measured 2x
    # SLOWER end-to-end and OOMs scoped VMEM at C=48 — vector
    # transposes of [bt, C] blocks are not cheap on this core).
    xw = jnp.concatenate([xa_ref[0], xb_ref[0][:, :halo]],
                         axis=1).astype(jnp.float32)        # [C, bt+halo]

    a = al_ref[...].astype(jnp.float32)                     # [C, 1]
    b = be_ref[...].astype(jnp.float32) if has_beta else a
    if logscale:
        a = jnp.exp(a)
        b = jnp.exp(b)
    inv_b = 1.0 / (b + _EPS)

    e_up, o_up, z_e, z_o = _taps()

    def phase(taps, base):
        acc = taps[0] * xw[:, base:base + n_ph]
        for m in range(1, 6):
            acc = acc + taps[m] * xw[:, base + m:base + m + n_ph]
        return acc

    e = phase(e_up, _AH - 6)
    o_ph = phase(o_up, _AH - 5)

    def snake(v):
        # pi-periodic fast sin^2 (ops/fastmath.py): Mosaic's full-range
        # jnp.sin measured ~half this kernel's runtime on v5e
        return v + inv_b * sin2(a * v)

    se = snake(e)
    so = snake(o_ph)

    z = z_o[0] * so[:, 0:n_act] + z_e[0] * se[:, 1:1 + n_act]
    for m in range(1, 6):
        z = z + z_o[m] * so[:, m:m + n_act] \
              + z_e[m] * se[:, m + 1:m + 1 + n_act]

    g_col = t0 - ca + jax.lax.broadcasted_iota(jnp.int32, z.shape, 1)
    z = jnp.where((g_col >= 0) & (g_col < t_total), z, 0.0)

    # windowed contraction: ONE [O, K*C] x [K*C, bt] MXU dot instead of K
    # C-deep tap dots — at C=24/48 each tap pads its contraction to the
    # 128-row tile, so folding the taps into the contraction axis raises
    # MXU depth utilization ~K-fold for the same arithmetic.  The window
    # is assembled through an fp32 VMEM scratch: a vector concatenate of
    # lane-offset slices crashes Mosaic ("result/input offset mismatch on
    # non-concat dimension"), while full-width stores at C-aligned
    # sublane offsets lower fine (C is a multiple of the fp32 8-sublane
    # tile for every BigVGAN width).
    c = z.shape[0]
    for m in range(k):
        zw_ref[m * c:(m + 1) * c, :] = z[:, m * dil:m * dil + bt]
    acc = b_ref[...] + jax.lax.dot_general(
        w_ref[...], zw_ref[...].astype(compute_dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)                 # [O, bt]
    if has_res:
        acc = acc + res_ref[0].astype(jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def aa_snake_conv1d_ncl(x, alpha, beta, weight, bias=None, *,
                        dilation: int = 1, logscale: bool = True,
                        compute_dtype=None, block_t: int = 0,
                        interpret: bool = False, residual=None):
    """Time-minor twin of ``aa_snake_conv1d``: x [B, C, T] -> [B, O, T].

    For the narrow late BigVGAN stages (C=24/48) the hybrid carry is
    [B, C, T] (time on lanes); this kernel fuses the anti-aliased Snake
    activation (fp32, in VMEM) with the 'SAME' dilated conv and an
    optional residual add (``residual``: [B, O, T], added to the conv
    output before the store — the AMP block's ``x + conv2(act2(...))``
    rides along for free instead of costing its own HBM pass).
    weight: [O, C, K] torch layout.  Edge semantics match
    ``aa_snake_conv1d`` (replicate-padded in-kernel activation, zeroed
    outside [0, T)).
    """
    out_dtype = x.dtype
    cdt = jnp.dtype(compute_dtype) if compute_dtype is not None else x.dtype

    b_, c, t = x.shape
    o, i, k = weight.shape
    assert i == c, (i, c)
    ca = (k * dilation - dilation) // 2
    has_beta = beta is not None
    has_res = residual is not None

    halo = -(-(2 * (ca + _AH)) // 128) * 128
    if -(-t // 128) * 128 < halo:
        # too short for the two-block halo scheme — unfused oracle path
        from ..nn.conv import conv1d
        from .snake import polyphase_anti_aliased_activation, snake, \
            snake_beta

        def fn(v):
            if has_beta:
                return snake_beta(v, alpha, beta, logscale=logscale,
                                  channel_axis=1)
            return snake(v, alpha, logscale=logscale, channel_axis=1)

        z = polyphase_anti_aliased_activation(x, fn)
        z = jnp.pad(z, ((0, 0), (0, 0), (ca, ca)))
        out = conv1d(z, weight, bias, dilation=dilation,
                     compute_dtype=compute_dtype)
        return out + residual if has_res else out

    isz = jnp.dtype(cdt).itemsize
    if block_t <= 0:
        # x blocks (2 copies, 2 buffers, cdt) + ~7 fp32 act temps +
        # windowed zw scratch (fp32, K*C rows) + fp32 acc + out
        # (+ residual)
        denom = (8 * c + (4 if has_res else 0) * o) * isz \
            + 28 * c + 4 * k * c + 12 * o
        block_t = min(max((6_500_000 // denom) // 128 * 128, 256), 8192)
    bt = min(block_t, -(-t // 128) * 128)
    assert halo <= bt, (halo, bt)
    nt = -(-t // bt)

    lpad = ca + _AH
    need_r = nt * bt + halo + bt - (t + lpad)
    left = jnp.repeat(x[:, :, :1], lpad, axis=2)
    right = jnp.repeat(x[:, :, -1:], max(need_r, 0), axis=2)
    xg = jnp.concatenate([left, x, right], axis=2)
    if xg.dtype != cdt:
        xg = xg.astype(cdt)

    # [O, K*C] with column m*C + c matching zw's tap-major concat
    w2 = jnp.transpose(weight, (0, 2, 1)).reshape(o, k * c).astype(cdt)
    b_vec = (bias if bias is not None
             else jnp.zeros((o,), jnp.float32)).astype(jnp.float32)
    b_vec = b_vec.reshape(o, 1)
    al = alpha.reshape(c, 1).astype(jnp.float32)
    be = (beta if has_beta else alpha).reshape(c, 1).astype(jnp.float32)

    in_specs = [
        pl.BlockSpec((1, c, bt), lambda b, ti: (b, 0, ti)),
        pl.BlockSpec((1, c, bt), lambda b, ti: (b, 0, ti + 1)),
        pl.BlockSpec((o, k * c), lambda b, ti: (0, 0)),
        pl.BlockSpec((o, 1), lambda b, ti: (0, 0)),
        pl.BlockSpec((c, 1), lambda b, ti: (0, 0)),
        pl.BlockSpec((c, 1), lambda b, ti: (0, 0)),
    ]
    operands = [xg, xg, w2, b_vec, al, be]
    if has_res:
        rt = nt * bt
        if rt > t:
            residual = jnp.pad(residual, ((0, 0), (0, 0), (0, rt - t)))
        in_specs.append(pl.BlockSpec((1, o, bt), lambda b, ti: (b, 0, ti)))
        operands.append(residual)

    out = pl.pallas_call(
        functools.partial(_kernel_ncl, k=k, dil=dilation, bt=bt, ca=ca,
                          halo=halo, t_total=t, logscale=logscale,
                          has_beta=has_beta, has_res=has_res,
                          compute_dtype=cdt),
        grid=(b_, nt),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, o, bt), lambda b, ti: (b, 0, ti)),
        out_shape=jax.ShapeDtypeStruct((b_, o, nt * bt), out_dtype),
        scratch_shapes=[pltpu.VMEM((k * c, bt), jnp.float32)],
        interpret=interpret,
    )(*operands)
    return out[:, :, :t]
