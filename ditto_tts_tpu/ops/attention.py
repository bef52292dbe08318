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


# ---------------------------------------------------------------------------
# dispatching entry point
# ---------------------------------------------------------------------------

def attention(q, k, v, *, causal=False, bias=None, sm_scale=None,
              use_pallas=None):
    """Multi-head attention over [B, H, S, D] tensors.

    Uses the Pallas kernel on TPU when there is no additive bias; otherwise
    the jnp reference (which XLA still fuses well on TPU).
    """
    if use_pallas is None:
        use_pallas = on_tpu() and bias is None
    if use_pallas and bias is None:
        return pallas_attention(q, k, v, causal=causal, sm_scale=sm_scale)
    return sdpa_reference(q, k, v, causal=causal, bias=bias, sm_scale=sm_scale)
