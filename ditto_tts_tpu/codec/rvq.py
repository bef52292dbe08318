"""Residual vector quantization (EnCodec semantics) + the reference's own
single-codebook VectorQuantizer.

RVQ behavioral spec: HF EncodecResidualVectorQuantizer — nearest-neighbor
(euclidean) codebook per stage on the residual, decode = sum of codebook
embeddings. num_quantizers for a bandwidth: floor(bw*1000 / (log2(K)*frame_rate)),
e.g. 2 codebooks at 1.5 kbps for the 24 kHz model (the reference's default
path — its "2 codebook channels", ref: src/components/EnCodec.py:35-37).

The standalone :class:`VectorQuantizer` mirrors the reference's extra
learnable codebook over GPT2-width latents (ref: src/components/
VectorQuantizer.py:4-43): L2-argmin indices only. ``straight_through``
adds the standard STE + commitment losses the reference lacks (quirk #4) —
default on for training, off for ref-compat.

TPU notes: distance argmin is one [N, D] x [D, K] matmul (MXU) + row argmin
(VPU); the RVQ stage loop is a short static Python loop (2-32 stages) that
XLA unrolls.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp


def nearest_codebook_indices(x, codebook, *, ref_exact: bool = False):
    """x: [..., D]; codebook: [K, D] -> int32 indices [...].

    Default: argmin_k ||x - c_k||^2 == argmax_k (2 x.c_k - ||c_k||^2) — one
    matmul, no ||x||^2 term (it is constant per row).

    ``ref_exact`` reproduces the reference's distance expression
    (ref: src/components/VectorQuantizer.py:34-41) term-for-term:
    ``(||x||^2 - 2 x@C^T) + ||c||^2`` with argmin. The two are equal in
    exact arithmetic but round differently: at degenerate latent scale
    (||x||^2 ~ 1e10) the reference formula crushes fp32 resolution of each
    row to ~ulp(||x||^2), so matching its argmin requires matching its
    rounding, not just its math.
    """
    flat = x.reshape(-1, x.shape[-1])
    dots = jax.lax.dot_general(
        flat, codebook,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)
    c2 = jnp.sum(jnp.square(codebook.astype(jnp.float32)), axis=-1)
    if ref_exact:
        x2 = jnp.sum(jnp.square(flat.astype(jnp.float32)), axis=-1,
                     keepdims=True)
        dist = (x2 - 2.0 * dots) + c2[None, :]
        idx = jnp.argmin(dist, axis=-1).astype(jnp.int32)
    else:
        scores = 2.0 * dots - c2[None, :]
        idx = jnp.argmax(scores, axis=-1).astype(jnp.int32)
    return idx.reshape(x.shape[:-1])


def num_quantizers_for_bandwidth(codebook_size: int, frame_rate: int,
                                 bandwidth_kbps: Optional[float],
                                 max_quantizers: int) -> int:
    if bandwidth_kbps is None or bandwidth_kbps <= 0:
        return max_quantizers
    bw_per_q = math.log2(codebook_size) * frame_rate
    return max(1, int(math.floor(bandwidth_kbps * 1000 / bw_per_q)))


def rvq_encode(codebooks, latents, num_quantizers: int):
    """codebooks: [NQ, K, D]; latents: [B, D, T] -> codes [B, nq, T]."""
    x = latents.transpose(0, 2, 1)          # [B, T, D]
    residual = x
    codes = []
    for q in range(num_quantizers):
        idx = nearest_codebook_indices(residual, codebooks[q])
        quant = jnp.take(codebooks[q], idx, axis=0)
        residual = residual - quant
        codes.append(idx)
    return jnp.stack(codes, axis=1)         # [B, nq, T]


def rvq_decode(codebooks, codes):
    """codes: [B, nq, T] -> latents [B, D, T] (sum over stages)."""
    nq = codes.shape[1]
    out = 0.0
    for q in range(nq):
        out = out + jnp.take(codebooks[q], codes[:, q], axis=0)
    return out.transpose(0, 2, 1)


# ---------------------------------------------------------------------------
# the reference's own learnable VQ over GPT2-width latents
# ---------------------------------------------------------------------------

def init_vector_quantizer(key, codebook_size: int, latent_dim: int,
                          dtype=jnp.float32):
    """Xavier-uniform codebook (ref: VectorQuantizer.py:19-20)."""
    bound = math.sqrt(6.0 / (codebook_size + latent_dim))
    return {"codebook": jax.random.uniform(
        key, (codebook_size, latent_dim), dtype, -bound, bound)}


def vq_indices(params, latents, *, ref_exact: bool = False):
    """L2-argmin codebook indices; latents [..., D] -> [...] int32.

    Matches the reference forward exactly (VectorQuantizer.py:22-43):
    indices only, no gradient path (quirk #4). ``ref_exact`` additionally
    matches the reference's fp32 distance *rounding* (see
    :func:`nearest_codebook_indices`).
    """
    return nearest_codebook_indices(latents, params["codebook"],
                                    ref_exact=ref_exact)


def vq_straight_through(params, latents, *, commitment_cost: float = 0.25):
    """Proper trainable VQ: returns (quantized_ste, indices, losses).

    The straight-through estimator passes decoder gradients to the encoder;
    codebook loss pulls codes toward encoder outputs, commitment loss the
    other way. This is the corrected formulation the reference lacks.
    """
    idx = nearest_codebook_indices(latents, params["codebook"])
    quant = jnp.take(params["codebook"], idx, axis=0)
    codebook_loss = jnp.mean(
        jnp.square(quant - jax.lax.stop_gradient(latents)))
    commit_loss = jnp.mean(
        jnp.square(jax.lax.stop_gradient(quant) - latents))
    ste = latents + jax.lax.stop_gradient(quant - latents)
    return ste, idx, {"codebook_loss": codebook_loss,
                      "commitment_loss": commitment_cost * commit_loss}
