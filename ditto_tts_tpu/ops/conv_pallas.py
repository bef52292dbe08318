"""Channels-last 1-D conv Pallas kernel: fp32 tap accumulator in VMEM.

The vocoder's TPU fast path lowers every stride-1 conv as a tap-sum of
GEMMs (nn/conv.py:conv1d_nlc_gemm).  XLA runs each tap as its own fusion,
so the K-1 fp32 partial sums round-trip HBM between taps — at BigVGAN's
bench geometry (10 s / B=4) that is ~10 HBM passes per conv and the
dominant conv cost (~2 ms/conv, round-3 ablation).  This kernel performs
the same tap-sum with the fp32 accumulator held in VMEM: each conv reads
its input ~twice (halo operand) and writes its output once, and every
tap's [block_t, C_in] x [C_in, ocb] contraction runs on the MXU.

Blocking (v2 — the v1 kernel materialized an overlapped-window array and
used a fixed 256-row block, which measured 2x SLOWER than the gemm form):

  * the input is passed TWICE with block indices t and t+1, so the kernel
    assembles [block_t + halo] rows by concatenating two VMEM-resident
    blocks — no windowed copy of x is ever written to HBM and no fusion
    barrier is introduced around one;
  * block_t scales inversely with channel width (~0.4M elements/block),
    so narrow late stages run 8-16k-row blocks instead of drowning in
    grid overhead;
  * grid is (batch, time, oc-blocks) with oc innermost: the x block stays
    VMEM-resident while the (much smaller) weight blocks cycle.

Behavioral spec: torch Conv1d VALID / stride 1 / rhs dilation (the shape
every BigVGAN resblock conv and — after the polyphase rewrite,
nn/conv.py:conv_transpose1d_poly — every upsample conv takes).  The
reference runs these in fp32 torch (ref: src/model/SpeechGenerator.py:52).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


# Test hook: force the Pallas kernel dispatches in interpret mode on
# non-TPU backends. Production behavior off-TPU is the plain XLA path
# (interpret mode is orders of magnitude slower and exists only to pin
# kernel math in CPU tests).
FORCE_INTERPRET = False


def pallas_mode():
    """None = don't dispatch pallas on this backend; else the interpret
    flag to pass to the kernels."""
    if jax.default_backend() == "tpu":
        return False
    return True if FORCE_INTERPRET else None


def _kernel(xa_ref, xb_ref, w_ref, b_ref, o_ref, acc_ref, *,
            k: int, dil: int, bt: int, halo: int):
    x = jnp.concatenate([xa_ref[0], xb_ref[0][:halo]], axis=0)
    # in-place accumulation into a VMEM scratch: one live [bt, ocb] fp32
    # temp at a time (a value-style sum kept all k tap products live and
    # blew the 16 MB VMEM budget at wide time blocks)
    acc_ref[...] = b_ref[...] + jax.lax.dot_general(
        x[:bt], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [bt, ocb]
    for m in range(1, k):
        acc_ref[...] += jax.lax.dot_general(
            x[m * dil:m * dil + bt], w_ref[m],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def conv1d_nlc_pallas(x, weight, bias=None, *, dilation: int = 1,
                      compute_dtype=None, block_t: int = 0,
                      oc_block: int = 256, interpret: bool = False):
    """x: [B, T, C_in]; weight: [O, I, K] (torch conv1d layout); 'VALID'
    padding, stride 1.  Returns [B, T - (K-1)*dilation, O] in x.dtype.

    Operands are cast to ``compute_dtype`` (bf16 for the MXU); taps
    accumulate in an fp32 VMEM register block; bias joins the fp32
    accumulator before the single output cast (same contract as
    nn/conv.py).  ``block_t`` 0 = auto (scaled by channel width).
    """
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)

    b_, t_in, c_in = x.shape
    o, i, k = weight.shape
    assert i == c_in, (i, c_in)
    t_out = t_in - (k - 1) * dilation
    assert t_out > 0

    if o <= oc_block:
        ocb = o
    else:
        # Mosaic requires block minor dims divisible by 128 (or == full):
        # largest 128-multiple divisor of O within the cap, else full O
        ocb = next((d for d in range(oc_block - oc_block % 128, 0, -128)
                    if o % d == 0), o)
    no = o // ocb

    halo = (k - 1) * dilation
    halo_a = max(-(-halo // 16) * 16, 16)
    if -(-t_out // 16) * 16 < halo_a:
        # too short for the two-block halo scheme (xb supplies at most one
        # block); the gemm tap-sum handles any length
        from ..nn.conv import conv1d_nlc_gemm
        return conv1d_nlc_gemm(x, weight, bias, dilation=dilation,
                               compute_dtype=None)
    if block_t <= 0:
        # VMEM-aware: x blocks 2 copies x 2 pipeline buffers (bf16) +
        # fp32 scratch + one live tap temp + out block, ~5 MB budget
        denom = 8 * c_in + 12 * ocb
        block_t = min(max((5_000_000 // denom) // 256 * 256, 256), 4096)
    bt = min(block_t, -(-t_out // 16) * 16)
    assert halo_a <= bt, (halo_a, bt)   # xb supplies at most one block
    nt = -(-t_out // bt)

    # pad so block t+1 exists for the last time block
    need = (nt + 1) * bt
    if need > t_in:
        x = jnp.pad(x, ((0, 0), (0, need - t_in), (0, 0)))

    w2 = jnp.transpose(weight, (2, 1, 0))               # [K, I, O]
    b_vec = (bias if bias is not None
             else jnp.zeros((o,), jnp.float32)).astype(jnp.float32)
    b_vec = b_vec.reshape(1, o)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dil=dilation, bt=bt, halo=halo_a),
        grid=(b_, nt, no),
        in_specs=[
            pl.BlockSpec((1, bt, c_in), lambda b, t, oi: (b, t, 0)),
            pl.BlockSpec((1, bt, c_in), lambda b, t, oi: (b, t + 1, 0)),
            pl.BlockSpec((k, c_in, ocb), lambda b, t, oi: (0, 0, oi)),
            pl.BlockSpec((1, ocb), lambda b, t, oi: (0, oi)),
        ],
        out_specs=pl.BlockSpec((1, bt, ocb), lambda b, t, oi: (b, t, oi)),
        out_shape=jax.ShapeDtypeStruct((b_, nt * bt, o), out_dtype),
        scratch_shapes=[pltpu.VMEM((bt, ocb), jnp.float32)],
        interpret=interpret,
    )(x, x, w2, b_vec)
    return out[:, :t_out]


# ---------------------------------------------------------------------------
# time-minor (NCL) variant for narrow channel widths
# ---------------------------------------------------------------------------

def _kernel_ncl(xa_ref, xb_ref, w_ref, b_ref, o_ref, acc_ref, *,
                k: int, dil: int, bt: int, halo: int):
    x = jnp.concatenate([xa_ref[0], xb_ref[0][:, :halo]], axis=1)
    # [O, C] x [C, bt] per tap: contraction over the (sublane) channel dim
    acc_ref[...] = b_ref[...] + jax.lax.dot_general(
        w_ref[0], x[:, :bt],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)              # [O, bt]
    for m in range(1, k):
        acc_ref[...] += jax.lax.dot_general(
            w_ref[m], x[:, m * dil:m * dil + bt],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[0] = acc_ref[...].astype(o_ref.dtype)


def _kernel_ncl_batched(xa_ref, xb_ref, w_ref, b_ref, o_ref, zw_ref, *,
                        k: int, dil: int, bt: int, halo: int):
    """Batch-in-sublane windowed kernel: refs are 2-D [B*C, ·] views of
    the [B, C, T] array (same HBM layout) and the weight is the
    block-diagonal [B*O, K*B*C] expansion, so the WHOLE batch advances
    in one grid sweep with one MXU dot per block — the per-batch grid
    at codec geometry (B=8, C=32, T=240k fp32) spent ~4.5x the HBM
    bound on ~540 tiny grid steps."""
    x = jnp.concatenate([xa_ref[...], xb_ref[:, :halo]], axis=1)
    bc = x.shape[0]
    for m in range(k):
        zw_ref[m * bc:(m + 1) * bc, :] = \
            x[:, m * dil:m * dil + bt].astype(jnp.float32)
    acc = b_ref[...] + jax.lax.dot_general(
        w_ref[...], zw_ref[...].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[...] = acc.astype(o_ref.dtype)


def conv1d_ncl_batched_pallas(x, weight, bias=None, *, dilation: int = 1,
                              compute_dtype=None, block_t: int = 0,
                              interpret: bool = False):
    """x: [B, C, T] -> [B, O, T'] (VALID, stride 1), whole batch per
    grid step.  Gated: falls back to the per-batch kernel when the
    block-diagonal expansion would not pay (see body).

    Measured OUTCOME (r5 slope probe, codec geometry B=8/C=32/T=240k
    fp32 k=3): 3.21 ms vs 2.94 per-batch — NO win.  The per-batch grid
    overhead hypothesis was wrong; these audio-rate convs sit ~3x over
    the pure HBM bound in every variant (per-batch, windowed, batched),
    i.e. they are DMA/stride-efficiency bound.  Kept (tested) as the
    probe record; production dispatch stays on the per-batch kernel."""
    b_, c_in, t_in = x.shape
    o, i, k = weight.shape
    assert i == c_in, (i, c_in)
    bc, bo = b_ * c_in, b_ * o
    if (b_ == 1 or bc % 8 or bo % 8 or bc > 1024 or k * bc > 4096):
        return conv1d_ncl_pallas(x, weight, bias, dilation=dilation,
                                 compute_dtype=compute_dtype,
                                 block_t=block_t, interpret=interpret,
                                 windowed=True)
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)
    t_out = t_in - (k - 1) * dilation
    assert t_out > 0

    halo = (k - 1) * dilation
    halo_a = max(-(-halo // 128) * 128, 128)
    if -(-t_out // 128) * 128 < halo_a:
        from ..nn.conv import conv1d
        return conv1d(x, weight, bias, dilation=dilation,
                      compute_dtype=None)
    if block_t <= 0:
        isz = jnp.dtype(x.dtype).itemsize
        denom = (8 * bc + 4 * bo) * isz + 4 * k * bc + 8 * bo
        block_t = min(max((6_500_000 // denom) // 128 * 128, 128), 8192)
    bt = min(block_t, -(-t_out // 128) * 128)
    assert halo_a <= bt, (halo_a, bt)
    nt = -(-t_out // bt)

    need = (nt + 1) * bt
    if need > t_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need - t_in)))
    xv = x.reshape(bc, -1)                      # same HBM layout

    # block-diagonal [B*O, K*B*C]: w_bd[b*O+o, m*BC + b*C + c] = w[o,c,m]
    eye = jnp.eye(b_, dtype=weight.dtype)
    w_bd = jnp.einsum("bd,ocm->bomdc", eye, weight)
    # flatten (b, o) then (m, d, c) — matching the scratch's tap-major,
    # batch-then-channel row order
    w_bd = w_bd.reshape(bo, k * bc)
    b_vec = (bias if bias is not None
             else jnp.zeros((o,), jnp.float32)).astype(jnp.float32)
    b_vec = jnp.tile(b_vec, b_).reshape(bo, 1)

    out = pl.pallas_call(
        functools.partial(_kernel_ncl_batched, k=k, dil=dilation, bt=bt,
                          halo=halo_a),
        grid=(nt,),
        in_specs=[
            pl.BlockSpec((bc, bt), lambda t: (0, t)),
            pl.BlockSpec((bc, bt), lambda t: (0, t + 1)),
            pl.BlockSpec((bo, k * bc), lambda t: (0, 0)),
            pl.BlockSpec((bo, 1), lambda t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bo, bt), lambda t: (0, t)),
        out_shape=jax.ShapeDtypeStruct((bo, nt * bt), out_dtype),
        scratch_shapes=[pltpu.VMEM((k * bc, bt), jnp.float32)],
        interpret=interpret,
    )(xv, xv, w_bd, b_vec)
    return out.reshape(b_, o, nt * bt)[:, :, :t_out]


def _kernel_ncl_windowed(xa_ref, xb_ref, w_ref, b_ref, o_ref, zw_ref, *,
                         k: int, dil: int, bt: int, halo: int):
    """Windowed-contraction variant: assemble [K*C, bt] in an fp32 VMEM
    scratch (C-aligned sublane stores compile; a vector concat of
    lane-offset slices crashes Mosaic) and contract in ONE
    [O, K*C] x [K*C, bt] dot — at narrow C each per-tap dot pads its
    contraction to the 128-row MXU tile, so folding taps into the
    contraction axis raises depth utilization ~K-fold."""
    x = jnp.concatenate([xa_ref[0], xb_ref[0][:, :halo]], axis=1)
    c = x.shape[0]
    for m in range(k):
        zw_ref[m * c:(m + 1) * c, :] = \
            x[:, m * dil:m * dil + bt].astype(jnp.float32)
    acc = b_ref[...] + jax.lax.dot_general(
        w_ref[...], zw_ref[...].astype(x.dtype),
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


def conv1d_ncl_pallas(x, weight, bias=None, *, dilation: int = 1,
                      compute_dtype=None, block_t: int = 0,
                      interpret: bool = False, windowed: bool = False):
    """Time-minor twin of ``conv1d_nlc_pallas``: x [B, C, T] -> [B, O, T'].

    For the narrow late BigVGAN stages (C=24/48) the channels-last HBM
    layout pads the 128-lane minor dim 5.3x/2.7x; carrying [B, C, T]
    keeps arrays dense (time on lanes, channels on sublanes) and each
    tap contracts [O, C] x [C, bt] on the MXU with the fp32 accumulator
    in VMEM.  weight: [O, I, K] torch layout; VALID, stride 1.
    """
    out_dtype = x.dtype
    if compute_dtype is None and x.dtype != weight.dtype:
        compute_dtype = jnp.promote_types(x.dtype, weight.dtype)
    if compute_dtype is not None:
        x = x.astype(compute_dtype)
        weight = weight.astype(compute_dtype)

    b_, c_in, t_in = x.shape
    o, i, k = weight.shape
    assert i == c_in, (i, c_in)
    t_out = t_in - (k - 1) * dilation
    assert t_out > 0

    halo = (k - 1) * dilation
    halo_a = max(-(-halo // 128) * 128, 128)
    if -(-t_out // 128) * 128 < halo_a:
        # too short for the two-block halo scheme; lax.conv handles any T
        from ..nn.conv import conv1d
        return conv1d(x, weight, bias, dilation=dilation,
                      compute_dtype=None)
    windowed = windowed and c_in % 8 == 0   # fp32 sublane-tile stores
    if block_t <= 0:
        # lanes are time; per-lane-column VMEM: x 2 copies x 2 buffers +
        # concat copy (operand dtype!) + fp32 scratch/tap temp + out.
        # Deliberately conservative: C=48/k=11/bf16 at bt=8192 measured
        # 18.2 MB scoped and C=512->128/fp32 at bt=1152 measured 22.4 MB
        # against the 16 MB limit.
        isz = jnp.dtype(x.dtype).itemsize
        denom = (8 * c_in + 4 * o) * isz + 8 * o
        if windowed:
            denom += 4 * k * c_in
        block_t = min(max((6_500_000 // denom) // 128 * 128, 256), 8192)
    bt = min(block_t, -(-t_out // 128) * 128)
    assert halo_a <= bt, (halo_a, bt)
    nt = -(-t_out // bt)

    need = (nt + 1) * bt
    if need > t_in:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, need - t_in)))

    b_vec = (bias if bias is not None
             else jnp.zeros((o,), jnp.float32)).astype(jnp.float32)
    b_vec = b_vec.reshape(o, 1)

    if windowed:
        # [O, K*C] with column m*C + c matching the scratch's tap-major
        # assembly
        w2 = jnp.transpose(weight, (0, 2, 1)).reshape(o, k * c_in)
        kernel = functools.partial(_kernel_ncl_windowed, k=k, dil=dilation,
                                   bt=bt, halo=halo_a)
        w_spec = pl.BlockSpec((o, k * c_in), lambda b, t: (0, 0))
        scratch = [pltpu.VMEM((k * c_in, bt), jnp.float32)]
    else:
        w2 = jnp.transpose(weight, (2, 0, 1))           # [K, O, I]
        kernel = functools.partial(_kernel_ncl, k=k, dil=dilation, bt=bt,
                                   halo=halo_a)
        w_spec = pl.BlockSpec((k, o, c_in), lambda b, t: (0, 0, 0))
        scratch = [pltpu.VMEM((o, bt), jnp.float32)]

    out = pl.pallas_call(
        kernel,
        grid=(b_, nt),
        in_specs=[
            pl.BlockSpec((1, c_in, bt), lambda b, t: (b, 0, t)),
            pl.BlockSpec((1, c_in, bt), lambda b, t: (b, 0, t + 1)),
            w_spec,
            pl.BlockSpec((o, 1), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, o, bt), lambda b, t: (b, 0, t)),
        out_shape=jax.ShapeDtypeStruct((b_, o, nt * bt), out_dtype),
        scratch_shapes=scratch,
        interpret=interpret,
    )(x, x, w2, b_vec)
    return out[:, :, :t_out]
