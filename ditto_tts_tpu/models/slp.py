"""Speech Length Predictor (SLP).

Re-design of the reference SLP (ref: src/model/SpeechLP.py:7-62): ByT5
encodes text; the codec+embedding-head encodes audio into [B, nq, T, 1472]
latents flattened to [B, nq*T, 1472]; a causal transformer decoder
cross-attends audio->text; the last position predicts one of 11 duration
classes (seconds - 10 in [0, 10], ref Config.py:77 + MLS.py:72-78).

``slp_predict_frames`` is the *corrected* inference path (quirk #5: the
reference uses the raw logits tensor as a shape, SpeechGenerator.py:156-158):
argmax -> seconds (+10) -> latent frames at the codec frame rate.
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..codec import encodec as codec_mod
from ..core.config import CodecConfig, SLPConfig
from ..nn.core import Embedding, Linear, dense
from ..nn.transformer import TransformerDecoder
from ..text import byt5 as byt5_mod


def _decoder(cfg: SLPConfig) -> TransformerDecoder:
    # torch: dim_feedforward = hidden * nhead (ref SpeechLP.py:26)
    return TransformerDecoder(cfg.embedding_dim, cfg.num_heads,
                              cfg.embedding_dim * cfg.num_heads,
                              cfg.num_layers)


def init_slp_trainable(key, cfg: SLPConfig, codebook_size: int = 1024,
                       dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "embedding_head": Embedding(codebook_size,
                                    cfg.embedding_dim).init(k1, dtype),
        "decoder": _decoder(cfg).init(k2, dtype),
        "length_predictor": Linear(cfg.embedding_dim,
                                   cfg.nb_classes).init(k3, dtype),
    }


def slp_forward(trainable, byt5_params, codec_params, cfg: SLPConfig,
                byt5_cfg: byt5_mod.ByT5Config, codec_cfg: CodecConfig,
                text_ids, text_mask, audio, padding_mask=None):
    """Returns duration-class logits [B, nb_classes]."""
    z_text = byt5_mod.byt5_encode(byt5_params, byt5_cfg, text_ids, text_mask)

    codes = codec_mod.codec_encode(codec_params, codec_cfg, audio,
                                   padding_mask, bandwidth_kbps=1.5)
    z_audio = jnp.take(trainable["embedding_head"]["weight"], codes, axis=0)
    b, nq, t, d = z_audio.shape
    z_audio = z_audio.reshape(b, nq * t, d)  # ref SpeechLP.py:48

    dec = _decoder(cfg)
    h = dec.apply(trainable["decoder"], z_audio, z_text, causal_self=True)
    return dense(trainable["length_predictor"], h[:, -1, :])


def slp_predict_frames(logits, frame_rate: int = 75,
                       min_seconds: int = 10) -> jnp.ndarray:
    """Corrected SLP decode: class argmax -> seconds -> latent frames."""
    seconds = jnp.argmax(logits, axis=-1) + min_seconds
    return seconds * frame_rate
