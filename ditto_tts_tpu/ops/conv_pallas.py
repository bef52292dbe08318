"""Channels-last 1-D conv Pallas kernel: fp32 tap accumulator in VMEM.

The vocoder's TPU fast path lowers every stride-1 conv as a tap-sum of
GEMMs (nn/conv.py:conv1d_nlc_gemm).  XLA runs each tap as its own fusion,
so the K-1 fp32 partial sums round-trip HBM between taps — at BigVGAN's
bench geometry (10 s / B=4) that is ~10 HBM passes per conv and the
dominant conv cost (~2 ms/conv, round-3 ablation).  This kernel performs
the same tap-sum with the fp32 accumulator held in VMEM: each conv reads
its input window once and writes its output once, and every tap's
[block_t, C_in] x [C_in, oc] contraction runs on the MXU.

Blocking: standard blocked BlockSpecs only (automatic pipelining — manual
ANY-space DMA deadlocked the tunneled backend, see CLAUDE.md).  Because
block windows must tile the input, the wrapper materializes an
overlapped-window view [B, nT, block_t + halo, C] via two static slices
(same trick as ops/fir_gemm.py) — ~(1 + halo/block_t) extra HBM passes,
still ~4 passes/conv total vs ~10 for the XLA tap-sum.

Grid is (batch, out-channel blocks, time blocks), time innermost, so the
weight block [K, C_in, ocb] stays VMEM-resident across the whole time
sweep.

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


def _kernel(xw_ref, w_ref, b_ref, o_ref, *, k: int, dil: int, bt: int):
    x = xw_ref[0, 0]                                    # [bt+halo, C_in]
    acc = jax.lax.dot_general(
        x[:bt], w_ref[0],
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # [bt, ocb]
    for m in range(1, k):
        acc = acc + jax.lax.dot_general(
            x[m * dil:m * dil + bt], w_ref[m],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc = acc + b_ref[...]                               # fp32, pre-cast
    o_ref[0] = acc.astype(o_ref.dtype)


def conv1d_nlc_pallas(x, weight, bias=None, *, dilation: int = 1,
                      compute_dtype=None, block_t: int = 256,
                      oc_block: int = 256, interpret: bool = False):
    """x: [B, T, C_in]; weight: [O, I, K] (torch conv1d layout); 'VALID'
    padding, stride 1.  Returns [B, T - (K-1)*dilation, O] in x.dtype.

    Operands are cast to ``compute_dtype`` (bf16 for the MXU); taps
    accumulate in an fp32 VMEM register block; bias joins the fp32
    accumulator before the single output cast (same contract as
    nn/conv.py).  Falls back assertions: O must be <= oc_block or a
    multiple of it.
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

    halo = (k - 1) * dilation
    bt = min(block_t, -(-t_out // 16) * 16)
    halo_a = max(-(-halo // 16) * 16, 16)
    assert halo_a <= bt, (halo_a, bt)   # window trick reads one extra block
    nt = -(-t_out // bt)

    if o <= oc_block:
        ocb = o
    else:
        # Mosaic requires block minor dims divisible by 128 (or == full):
        # largest 128-multiple divisor of O within the cap, else full O
        ocb = next((d for d in range(oc_block - oc_block % 128, 0, -128)
                    if o % d == 0), o)
    no = o // ocb

    # overlapped windows [B, nT, bt+halo_a, C] from two static slices
    need = nt * bt + halo_a + bt        # ext slice reads one block past main
    if need > t_in:
        x = jnp.pad(x, ((0, 0), (0, need - t_in), (0, 0)))
    main = jax.lax.slice_in_dim(x, 0, nt * bt, axis=1)
    main = main.reshape(b_, nt, bt, c_in)
    ext = jax.lax.slice_in_dim(x, bt, bt + nt * bt, axis=1)
    ext = ext.reshape(b_, nt, bt, c_in)
    win = jnp.concatenate([main, ext[:, :, :halo_a]], axis=2)

    w2 = jnp.transpose(weight, (2, 1, 0))               # [K, I, O]
    b_vec = (bias if bias is not None
             else jnp.zeros((o,), jnp.float32)).astype(jnp.float32)
    b_vec = b_vec.reshape(1, o)

    out = pl.pallas_call(
        functools.partial(_kernel, k=k, dil=dilation, bt=bt),
        grid=(b_, no, nt),
        in_specs=[
            pl.BlockSpec((1, 1, bt + halo_a, c_in),
                         lambda b, oi, t: (b, t, 0, 0)),
            pl.BlockSpec((k, c_in, ocb), lambda b, oi, t: (0, 0, oi)),
            pl.BlockSpec((1, ocb), lambda b, oi, t: (0, oi)),
        ],
        out_specs=pl.BlockSpec((1, bt, ocb), lambda b, oi, t: (b, t, oi)),
        out_shape=jax.ShapeDtypeStruct((b_, nt * bt, o), out_dtype),
        interpret=interpret,
    )(win, w2, b_vec)
    return out[:, :t_out]
