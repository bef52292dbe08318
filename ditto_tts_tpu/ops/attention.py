"""Attention ops: jnp reference SDPA + Pallas TPU kernel.

The reference computes unmasked full attention (no key-padding or causal mask
in the DiT path — ref: src/components/DiT.py:131-134 self-attn, DiT.py:144-148
cross-attn; the SLP decoder adds a causal self mask, ref: SpeechLP.py:58-62).

TPU design: sequence lengths here are short (<=1536 latent frames, <=1024 text
tokens), so the whole K/V block for one (batch, head) fits comfortably in
VMEM. The Pallas kernel therefore tiles only the query axis and keeps K/V
resident, computing a [block_q, Sk] score tile on the MXU with fp32
accumulation and fused masking/softmax on the VPU — one HBM read per operand,
no flash-style rescaling passes needed at these lengths. Shapes are padded to
hardware tiles by the wrapper and masked with a kv-length scalar in SMEM.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_TPU_PLATFORMS = ("tpu", "axon")


def on_tpu() -> bool:
    try:
        return jax.devices()[0].platform in _TPU_PLATFORMS
    except Exception:
        return False


# ---------------------------------------------------------------------------
# jnp reference (CPU path + golden oracle for the Pallas kernel)
# ---------------------------------------------------------------------------

def sdpa_reference(q, k, v, *, causal=False, bias=None, sm_scale=None):
    """Plain SDPA. q: [B, H, Sq, D], k/v: [B, H, Sk, D]. fp32 softmax."""
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(q.shape[-1])
    scores = jnp.einsum(
        "bhqd,bhkd->bhqk", q, k, preferred_element_type=jnp.float32)
    scores = scores * sm_scale
    if bias is not None:
        scores = scores + bias
    if causal:
        sq, sk = scores.shape[-2:]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        scores = jnp.where(col <= row, scores, -jnp.inf)
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum(
        "bhqk,bhkd->bhqd", p.astype(v.dtype), v,
        preferred_element_type=jnp.float32).astype(q.dtype)


# ---------------------------------------------------------------------------
# Pallas TPU kernel
# ---------------------------------------------------------------------------

def _attn_kernel(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale, causal,
                 block_q):
    qi = pl.program_id(1)
    kv_len = kvlen_ref[0]
    q = q_ref[0]                      # [block_q, D]
    k = k_ref[0]                      # [Sk_pad, D]
    v = v_ref[0]
    scores = jax.lax.dot_general(
        q, k, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32) * sm_scale
    col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, scores.shape, 0)
        mask = jnp.logical_and(mask, col <= row)
    scores = jnp.where(mask, scores, -1e30)
    m = jnp.max(scores, axis=-1, keepdims=True)
    e = jnp.exp(scores - m)
    p = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        p.astype(v.dtype), v, dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(o_ref.dtype)


def _round_up(x, m):
    return -(-x // m) * m


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "interpret"))
def pallas_attention(q, k, v, *, causal=False, sm_scale=None, block_q=256,
                     interpret=False):
    """Blocked TPU attention. q: [B, H, Sq, D], k/v: [B, H, Sk, D]."""
    B, H, Sq, D = q.shape
    Sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    block_q = min(block_q, _round_up(Sq, 8))
    sq_pad = _round_up(Sq, block_q)
    sk_pad = _round_up(Sk, 128)
    d_pad = _round_up(D, 128)

    qp = jnp.pad(q, ((0, 0), (0, 0), (0, sq_pad - Sq), (0, d_pad - D)))
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, sk_pad - Sk), (0, d_pad - D)))
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, sk_pad - Sk), (0, d_pad - D)))
    qp = qp.reshape(B * H, sq_pad, d_pad)
    kp = kp.reshape(B * H, sk_pad, d_pad)
    vp = vp.reshape(B * H, sk_pad, d_pad)

    kv_len = jnp.array([Sk], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * H, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, d_pad), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, sk_pad, d_pad), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d_pad), lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel, sm_scale=sm_scale, causal=causal,
                          block_q=block_q),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * H, sq_pad, d_pad), q.dtype),
        interpret=interpret,
    )(kv_len, qp, kp, vp)
    return out.reshape(B, H, sq_pad, d_pad)[:, :, :Sq, :D]


def _attn_kernel_packed(kvlen_ref, q_ref, k_ref, v_ref, o_ref, *, sm_scale,
                        causal, block_q, head_dim):
    """Head-pair-packed kernel: refs carry P=128//head_dim heads side by side
    in the 128-lane axis; each head's QK^T / softmax / PV runs on its own
    64-lane slice (contraction depth <=128 costs one MXU pass either way, so
    this matches the padded kernel's FLOPs while halving HBM traffic and
    VMEM footprint, and removing the pad/slice copies around the call)."""
    qi = pl.program_id(1)
    kv_len = kvlen_ref[0]
    q = q_ref[0]                      # [block_q, P*D]
    k = k_ref[0]                      # [Sk_pad, P*D]
    v = v_ref[0]
    packed = q.shape[-1] // head_dim
    col = jax.lax.broadcasted_iota(jnp.int32, (q.shape[0], k.shape[0]), 1)
    mask = col < kv_len
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (q.shape[0], k.shape[0]), 0)
        mask = jnp.logical_and(mask, col <= row)
    for p in range(packed):
        sl = slice(p * head_dim, (p + 1) * head_dim)
        scores = jax.lax.dot_general(
            q[:, sl], k[:, sl], dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32) * sm_scale
        scores = jnp.where(mask, scores, -1e30)
        m = jnp.max(scores, axis=-1, keepdims=True)
        e = jnp.exp(scores - m)
        probs = e / jnp.sum(e, axis=-1, keepdims=True)
        o_ref[0, :, sl] = jax.lax.dot_general(
            probs.astype(v.dtype), v[:, sl],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("causal", "sm_scale", "block_q", "interpret"))
def pallas_attention_packed(q, k, v, *, causal=False, sm_scale=None,
                            block_q=256, interpret=False):
    """Blocked TPU attention with 128//D heads packed per lane block.

    For the DiT's D=64 heads this avoids the 64->128 zero padding of
    ``pallas_attention``: no pad/unpad HBM copies, half the Q/K/V/O traffic,
    half the VMEM. Falls back to the padded kernel when D doesn't pack.
    """
    B, H, Sq, D = q.shape
    packed = 128 // D if D <= 128 and 128 % D == 0 else 1
    if packed <= 1 or H % packed != 0:
        return pallas_attention(q, k, v, causal=causal, sm_scale=sm_scale,
                                block_q=block_q, interpret=interpret)
    Sk = k.shape[2]
    if sm_scale is None:
        sm_scale = 1.0 / math.sqrt(D)

    block_q = min(block_q, _round_up(Sq, 8))
    sq_pad = _round_up(Sq, block_q)
    sk_pad = _round_up(Sk, 128)
    hp = H // packed

    def pack(x, s_pad):
        s = x.shape[2]
        x = jnp.pad(x, ((0, 0), (0, 0), (0, s_pad - s), (0, 0)))
        x = x.reshape(B, hp, packed, s_pad, D).swapaxes(2, 3)
        return x.reshape(B * hp, s_pad, packed * D)

    qp = pack(q, sq_pad)
    kp = pack(k, sk_pad)
    vp = pack(v, sk_pad)
    kv_len = jnp.array([Sk], jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B * hp, sq_pad // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, packed * D), lambda b, i, *_: (b, i, 0)),
            pl.BlockSpec((1, sk_pad, packed * D), lambda b, i, *_: (b, 0, 0)),
            pl.BlockSpec((1, sk_pad, packed * D), lambda b, i, *_: (b, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, packed * D),
                               lambda b, i, *_: (b, i, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_attn_kernel_packed, sm_scale=sm_scale,
                          causal=causal, block_q=block_q, head_dim=D),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((B * hp, sq_pad, packed * D), q.dtype),
        interpret=interpret,
    )(kv_len, qp, kp, vp)
    out = out.reshape(B, hp, sq_pad, packed, D).swapaxes(2, 3)
    return out.reshape(B, H, sq_pad, D)[:, :, :Sq]


# ---------------------------------------------------------------------------
# differentiable wrapper: Pallas forward, standard attention backward
# ---------------------------------------------------------------------------

@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def _pallas_attention_diff(q, k, v, causal, sm_scale):
    """pallas_attention_packed with a VJP, so the >=1000-key dispatch is
    usable inside training steps (pallas_call has no autodiff rule).  The
    backward recomputes probabilities in fp32 and applies the standard
    softmax-attention gradient — one layer's [B, H, Sq, Sk] at a time
    under remat_blocks, so memory stays bounded."""
    return pallas_attention_packed(q, k, v, causal=causal, sm_scale=sm_scale)


def _pallas_attn_fwd(q, k, v, causal, sm_scale):
    out = pallas_attention_packed(q, k, v, causal=causal, sm_scale=sm_scale)
    return out, (q, k, v)


def _pallas_attn_bwd(causal, sm_scale, res, g):
    q, k, v = res
    d = q.shape[-1]
    scale = sm_scale if sm_scale is not None else 1.0 / math.sqrt(d)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        sq, sk = q.shape[2], k.shape[2]
        row = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 0)
        col = jax.lax.broadcasted_iota(jnp.int32, (sq, sk), 1)
        s = jnp.where(col <= row, s, -1e30)
    p = jax.nn.softmax(s, axis=-1)                       # fp32
    gf = g.astype(jnp.float32)
    dv = jnp.einsum("bhqk,bhqd->bhkd", p, gf)
    dp = jnp.einsum("bhqd,bhkd->bhqk", gf, v.astype(jnp.float32))
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq = jnp.einsum("bhqk,bhkd->bhqd", ds,
                    k.astype(jnp.float32)) * scale
    dk = jnp.einsum("bhqk,bhqd->bhkd", ds,
                    q.astype(jnp.float32)) * scale
    return dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype)


_pallas_attention_diff.defvjp(_pallas_attn_fwd, _pallas_attn_bwd)


# ---------------------------------------------------------------------------
# dispatching entry point
# ---------------------------------------------------------------------------

def attention(q, k, v, *, causal=False, bias=None, sm_scale=None,
              use_pallas=None):
    """Multi-head attention over [B, H, S, D] tensors.

    Dispatch is empirical, from a slope-based microbench on the v5e chip
    (scripts/profile_attention.py, bf16, H=12, D=64, ms/call):

      Sk=750:  XLA 0.09   pallas pad128 0.20   pallas packed 0.18
      Sk=1024: XLA 0.51   pallas pad128 0.24   pallas packed 0.26
      Sk=1536: XLA 1.30   pallas pad128 0.54   pallas packed 0.41

    XLA's fused softmax wins while the whole [Sq, Sk] score tile stays
    small; past ~1k keys the Pallas kernels win by 2-3x, and the head-packed
    variant (no 64->128 d padding: half the HBM traffic, no pad copies) is
    the better of the two at long Sk. So: XLA below 1k keys, packed Pallas
    above; explicit additive bias always routes to XLA.
    """
    if use_pallas is None:
        # head_dim cap: the packed kernel keeps [block, d]-wide K/V tiles
        # in VMEM sized for transformer head dims; the SLP decoder's
        # single 1472-wide head (ref Config.py:69-99) blows scoped VMEM
        use_pallas = (on_tpu() and bias is None and k.shape[2] >= 1000
                      and q.shape[-1] <= 128)
    if use_pallas and bias is None:
        return _pallas_attention_diff(q, k, v, causal, sm_scale)
    return sdpa_reference(q, k, v, causal=causal, bias=bias, sm_scale=sm_scale)
