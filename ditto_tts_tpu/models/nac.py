"""Neural Audio Codec (NAC): codec latents aligned to a GPT2 LM.

Re-design of the reference NAC (ref: src/model/NeuralAudioCodec.py:8-67):

  frozen EnCodec encode -> discrete codes [B, nq=2, T]
  trainable embedding head: codes -> latents [B, 2, T, hidden=768]
  trainable VectorQuantizer over latents -> indices (used as codec codes)
  frozen EnCodec decode(indices) -> reconstruction; MSE vs input
  LM path: latents truncated to 1024 frames, mean over codebook axis,
  fed to frozen GPT2 as inputs_embeds with text ids as labels -> CE loss
  total = reconstruction + lambda * lm  (lambda=0.1, ref Config.py:47)

``trainable_params``/``frozen_params`` split makes the freeze semantics
explicit for optimizers (the reference freezes GPT2 + decoder via
requires_grad, ref NeuralAudioCodec.py:21-25; the encoder is frozen inside
the EnCodec wrapper, ref EnCodec.py:17-18).

By default the VQ uses straight-through + commitment losses (the corrected
formulation); ``ref_compat=True`` reproduces quirk #4 (argmin indices only,
no gradient path to the codebook).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..codec import encodec as codec_mod
from ..codec import rvq as rvq_mod
from ..core.config import CodecConfig, NACConfig
from ..nn.core import Embedding
from ..text import gpt2 as gpt2_mod


def init_nac_trainable(key, cfg: NACConfig, dtype=jnp.float32) -> Dict:
    k1, k2 = jax.random.split(key)
    return {
        "embedding_head": Embedding(cfg.codebook_size,
                                    cfg.hidden_size).init(k1, dtype),
        "vector_quantizer": rvq_mod.init_vector_quantizer(
            k2, cfg.codebook_size, cfg.hidden_size, dtype),
    }


def audio_encoder(trainable, codec_params, codec_cfg: CodecConfig, audio,
                  padding_mask=None):
    """Waveform -> latents [B, nq, T, hidden] (ref EnCodec.py:20-39).

    The codec encode is a frozen path — callers should wrap params in
    stop_gradient or keep them out of the optimizer.
    """
    codes = codec_mod.codec_encode(codec_params, codec_cfg, audio,
                                   padding_mask, bandwidth_kbps=1.5)
    latents = jnp.take(trainable["embedding_head"]["weight"], codes, axis=0)
    return latents, codes


def nac_forward(trainable, codec_params, gpt2_params, nac_cfg: NACConfig,
                codec_cfg: CodecConfig, gpt2_cfg: gpt2_mod.GPT2Config,
                text_ids, text_mask, audio, padding_mask=None, *,
                ref_compat: bool = False):
    """Full NAC training forward; returns dict of losses + tensors."""
    latents, _ = audio_encoder(trainable, codec_params, codec_cfg, audio,
                               padding_mask)

    if ref_compat:
        vq_indices = rvq_mod.vq_indices(trainable["vector_quantizer"],
                                        latents)
        vq_losses = {}
    else:
        _, vq_indices, vq_losses = rvq_mod.vq_straight_through(
            trainable["vector_quantizer"], latents)

    recon = codec_mod.codec_decode(codec_params, codec_cfg, vq_indices,
                                   output_length=audio.shape[-1])
    reconstruction_loss = jnp.mean(jnp.square(
        recon.astype(jnp.float32) - audio.astype(jnp.float32)))

    # LM alignment: truncate frames to GPT2 context, mean over codebook axis
    max_len = gpt2_cfg.n_positions
    lm_latents = jnp.mean(latents[:, :, :max_len], axis=1)  # [B, T', H]
    t = lm_latents.shape[1]
    attn_mask = text_mask[:, :t]
    labels = text_ids[:, :t]
    logits = gpt2_mod.gpt2_logits(gpt2_params, gpt2_cfg, lm_latents,
                                  attn_mask)
    lm = gpt2_mod.lm_loss(logits, labels)

    total = reconstruction_loss + nac_cfg.lambda_factor * lm
    for v in vq_losses.values():
        total = total + v
    return {
        "reconstructed_audio": recon,
        "audio_latents": latents,
        "lm_loss": lm,
        "reconstruction_loss": reconstruction_loss,
        "total_loss": total,
        **vq_losses,
    }
