"""EnCodec-24kHz-compatible neural codec: encode → RVQ codes → decode.

Behavioral spec: HF transformers ``EncodecModel`` for the 24 kHz
configuration (chunk_length=None → single frame; normalize=False → no audio
scales), which the reference uses frozen (ref: src/components/EnCodec.py:16,
src/model/NeuralAudioCodec.py:17,42). Weight import folds torch weight-norm
(weight_g/weight_v or parametrizations.original0/1) into plain conv weights.

API:
  init_codec(key, cfg)                      -> params pytree
  codec_encode(params, cfg, audio, mask)    -> codes [B, nq, T]
  codec_decode(params, cfg, codes, length)  -> waveform [B, ch, length]
  import_hf_state_dict(state_dict, cfg)     -> params pytree
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..core.config import CodecConfig
from . import rvq, seanet


def init_codec(key, cfg: CodecConfig, dtype=jnp.float32) -> Dict:
    k1, k2, k3 = jax.random.split(key, 3)
    return {
        "encoder": seanet.init_encoder(k1, cfg, dtype),
        "decoder": seanet.init_decoder(k2, cfg, dtype),
        "quantizer": {"codebooks": jax.random.normal(
            k3, (cfg.num_quantizers, cfg.codebook_size, cfg.dimension),
            dtype)},
    }


def codec_encode(params, cfg: CodecConfig, audio, padding_mask=None,
                 bandwidth_kbps: Optional[float] = 1.5):
    """audio: [B, channels, L]; padding_mask: [B, L] (1 = valid).

    Returns codes [B, nq, T] (nq = bandwidth-determined codebooks; 2 at
    1.5 kbps — the reference's two "codebook channels").
    """
    if padding_mask is not None:
        audio = audio * padding_mask[:, None, :].astype(audio.dtype)
    latents = seanet.encode(params["encoder"], cfg, audio)
    nq = rvq.num_quantizers_for_bandwidth(
        cfg.codebook_size, _frame_rate(cfg), bandwidth_kbps,
        cfg.num_quantizers)
    return rvq.rvq_encode(params["quantizer"]["codebooks"], latents, nq)


def codec_latents(params, cfg: CodecConfig, audio, padding_mask=None):
    """Continuous pre-quantization latents [B, dimension, T]."""
    if padding_mask is not None:
        audio = audio * padding_mask[:, None, :].astype(audio.dtype)
    return seanet.encode(params["encoder"], cfg, audio)


def codec_decode(params, cfg: CodecConfig, codes,
                 output_length: Optional[int] = None):
    """codes: [B, nq, T] -> waveform [B, channels, L] (truncated to
    output_length if given, matching decode-vs-padding-mask truncation)."""
    latents = rvq.rvq_decode(params["quantizer"]["codebooks"], codes)
    audio = seanet.decode(params["decoder"], cfg, latents)
    if output_length is not None and audio.shape[-1] > output_length:
        audio = audio[..., :output_length]
    return audio


def _frame_rate(cfg: CodecConfig) -> int:
    import math
    return int(math.ceil(cfg.sample_rate / cfg.hop_length))


# ---------------------------------------------------------------------------
# HF checkpoint import
# ---------------------------------------------------------------------------

def _fold_weight_norm(sd: Dict[str, np.ndarray], prefix: str) -> np.ndarray:
    """Resolve a conv weight under torch weight_norm naming variants."""
    if f"{prefix}.weight" in sd:
        return np.asarray(sd[f"{prefix}.weight"])
    if f"{prefix}.weight_g" in sd:
        g = np.asarray(sd[f"{prefix}.weight_g"])
        v = np.asarray(sd[f"{prefix}.weight_v"])
    elif f"{prefix}.parametrizations.weight.original0" in sd:
        g = np.asarray(sd[f"{prefix}.parametrizations.weight.original0"])
        v = np.asarray(sd[f"{prefix}.parametrizations.weight.original1"])
    else:
        raise KeyError(f"no weight found under {prefix}")
    # torch weight_norm over dims (1, 2): w = g * v / ||v||
    norm = np.sqrt(np.sum(v ** 2, axis=(1, 2), keepdims=True))
    return g * v / norm


def _conv_from(sd, prefix) -> Dict:
    return {"weight": jnp.asarray(_fold_weight_norm(sd, f"{prefix}.conv")),
            "bias": jnp.asarray(np.asarray(sd[f"{prefix}.conv.bias"]))}


def _lstm_from(sd, prefix, num_layers) -> list:
    out = []
    for i in range(num_layers):
        out.append({
            "weight_ih": jnp.asarray(np.asarray(
                sd[f"{prefix}.lstm.weight_ih_l{i}"])),
            "weight_hh": jnp.asarray(np.asarray(
                sd[f"{prefix}.lstm.weight_hh_l{i}"])),
            "bias_ih": jnp.asarray(np.asarray(
                sd[f"{prefix}.lstm.bias_ih_l{i}"])),
            "bias_hh": jnp.asarray(np.asarray(
                sd[f"{prefix}.lstm.bias_hh_l{i}"])),
        })
    return out


def _resblock_from(sd, prefix) -> Dict:
    # HF resblock module list: [ELU, conv, ELU, conv]; shortcut conv
    return {
        "conv1": _conv_from(sd, f"{prefix}.block.1"),
        "conv2": _conv_from(sd, f"{prefix}.block.3"),
        "shortcut": _conv_from(sd, f"{prefix}.shortcut"),
    }


def import_hf_state_dict(sd: Dict[str, np.ndarray],
                         cfg: CodecConfig) -> Dict:
    """Map an HF EncodecModel state_dict into this codec's param pytree.

    Walks the encoder/decoder layer lists in construction order (conv,
    [res xN, ELU, down] per ratio, LSTM, ELU, final conv — and the decoder
    mirror), skipping parameter-less ELU slots.
    """
    nres = cfg.num_residual_layers

    # encoder: 0=init conv, per ratio: res*nres, ELU, down ; then lstm, ELU, final
    enc: Dict = {"init_conv": _conv_from(sd, "encoder.layers.0")}
    idx = 1
    stages = []
    for ratio in reversed(cfg.ratios):
        res = []
        for _ in range(nres):
            res.append(_resblock_from(sd, f"encoder.layers.{idx}"))
            idx += 1
        idx += 1  # ELU
        stages.append({"resblocks": res,
                       "down": _conv_from(sd, f"encoder.layers.{idx}")})
        idx += 1
    enc["stages"] = stages
    enc["lstm"] = _lstm_from(sd, f"encoder.layers.{idx}", cfg.lstm_layers)
    idx += 2  # lstm, ELU
    enc["final_conv"] = _conv_from(sd, f"encoder.layers.{idx}")

    # decoder: 0=init conv, 1=lstm, per ratio: ELU, up, res*nres ; ELU, final
    dec: Dict = {"init_conv": _conv_from(sd, "decoder.layers.0"),
                 "lstm": _lstm_from(sd, "decoder.layers.1", cfg.lstm_layers)}
    idx = 2
    stages = []
    for ratio in cfg.ratios:
        idx += 1  # ELU
        up = _conv_from(sd, f"decoder.layers.{idx}")
        idx += 1
        res = []
        for _ in range(nres):
            res.append(_resblock_from(sd, f"decoder.layers.{idx}"))
            idx += 1
        stages.append({"up": up, "resblocks": res})
    dec["stages"] = stages
    idx += 1  # ELU
    dec["final_conv"] = _conv_from(sd, f"decoder.layers.{idx}")

    codebooks = np.stack([
        np.asarray(sd[f"quantizer.layers.{q}.codebook.embed"])
        for q in range(cfg.num_quantizers)])

    return {"encoder": enc, "decoder": dec,
            "quantizer": {"codebooks": jnp.asarray(codebooks)}}
