"""Speech2Text ASR (s2t-medium-style encoder-decoder) in JAX.

The reference uses a frozen HF ``facebook/s2t-medium-mustc-multilingual-st``
for CER/WER evaluation with forced French BOS (ref: src/model/
Speech2Text.py:5-21). This is a from-scratch JAX implementation of that
architecture so evaluation runs on-TPU without torch:

  fbank features [B, T, 80] -> Conv1dSubsampler (2x conv1d stride 2, GLU)
  -> x sqrt(d_model) + sinusoidal positions -> pre-norm transformer encoder
  (final LN); decoder: scaled token embeds + sinusoidal positions ->
  pre-norm decoder layers with cross-attention -> final LN -> tied LM head.

Position ids follow the fairseq convention: cumsum over the validity mask
(+ padding_idx offset), pad positions pinned to the zero row.

``greedy_decode`` runs fixed-length greedy generation with a forced
language BOS (the reference forces ``fr``). ``log_mel_fbank`` provides a
kaldi-style 80-dim fbank (povey window, snip-edges, per-utterance CMVN)
matching the HF processor's preprocessing closely enough for eval use.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.core import dense, layer_norm


@dataclasses.dataclass(frozen=True)
class S2TConfig:
    vocab_size: int = 10000
    d_model: int = 256
    encoder_layers: int = 12
    decoder_layers: int = 6
    encoder_heads: int = 4
    decoder_heads: int = 4
    encoder_ffn: int = 2048
    decoder_ffn: int = 2048
    num_conv_layers: int = 2
    conv_channels: int = 1024
    conv_kernel: int = 5
    input_features: int = 80
    pad_token_id: int = 1
    eos_token_id: int = 2
    max_positions: int = 6000


def s2t_medium_config() -> S2TConfig:
    return S2TConfig(d_model=512, encoder_heads=8, decoder_heads=8,
                     vocab_size=10000)


# ---------------------------------------------------------------------------
# sinusoidal positions (fairseq convention)
# ---------------------------------------------------------------------------

def _sinusoid_table(num: int, dim: int, padding_idx: int) -> np.ndarray:
    half = dim // 2
    freq = np.exp(np.arange(half, dtype=np.float64)
                  * -(math.log(10000.0) / (half - 1)))
    pos = np.arange(num, dtype=np.float64)[:, None] * freq[None, :]
    emb = np.concatenate([np.sin(pos), np.cos(pos)], axis=1)
    if dim % 2 == 1:
        emb = np.concatenate([emb, np.zeros((num, 1))], axis=1)
    emb[padding_idx] = 0.0
    return emb.astype(np.float32)


def _positions_from_mask(mask, padding_idx: int):
    """fairseq position ids: cumsum over valid slots + padding_idx."""
    m = mask.astype(jnp.int32)
    return jnp.cumsum(m, axis=1) * m + padding_idx


def _pos_embed(cfg: S2TConfig, mask):
    seq = mask.shape[1]
    table = jnp.asarray(_sinusoid_table(seq + cfg.pad_token_id + 2,
                                        cfg.d_model, cfg.pad_token_id))
    ids = _positions_from_mask(mask, cfg.pad_token_id)
    return jnp.take(table, ids, axis=0)


# ---------------------------------------------------------------------------
# modules
# ---------------------------------------------------------------------------

def _mha(p, q_in, kv_in, heads, bias_add=None):
    d = q_in.shape[-1]
    hd = d // heads
    q = dense(p["q_proj"], q_in) * (hd ** -0.5)
    k = dense(p["k_proj"], kv_in)
    v = dense(p["v_proj"], kv_in)

    def split(x):
        b, s, _ = x.shape
        return x.reshape(b, s, heads, hd).transpose(0, 2, 1, 3)

    scores = jnp.einsum("bhqd,bhkd->bhqk", split(q), split(k),
                        preferred_element_type=jnp.float32)
    if bias_add is not None:
        scores = scores + bias_add
    probs = jax.nn.softmax(scores, axis=-1)
    out = jnp.einsum("bhqk,bhkd->bhqd", probs.astype(v.dtype), split(v),
                     preferred_element_type=jnp.float32).astype(q_in.dtype)
    b, h, s, _ = out.shape
    return dense(p["out_proj"], out.transpose(0, 2, 1, 3).reshape(b, s, d))


def _pad_bias(mask):
    return (1.0 - mask.astype(jnp.float32))[:, None, None, :] * -1e9


def _causal_bias(s):
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    return jnp.where(col <= row, 0.0, -1e9)[None, None]


def subsample(params, cfg: S2TConfig, features, mask):
    """features: [B, T, 80] -> [B, ceil(T/4), d_model]; mask downsampled."""
    h = features.transpose(0, 2, 1)              # [B, 80, T]
    for conv in params["conv_layers"]:
        k = conv["weight"].shape[-1]
        pad = k // 2
        h = jnp.pad(h, ((0, 0), (0, 0), (pad, pad)))
        h = jax.lax.conv_general_dilated(
            h, conv["weight"], window_strides=(2,), padding="VALID",
            dimension_numbers=("NCH", "OIH", "NCH"),
            preferred_element_type=jnp.float32).astype(features.dtype)
        h = h + conv["bias"][None, :, None]
        a, b = jnp.split(h, 2, axis=1)
        h = a * jax.nn.sigmoid(b)                # GLU over channels
        mask = mask[:, ::2][:, :h.shape[-1]]
    return h.transpose(0, 2, 1), mask


def encode(params, cfg: S2TConfig, features, mask):
    h, mask = subsample(params["conv"], cfg, features, mask)
    h = h * math.sqrt(cfg.d_model) + _pos_embed(cfg, mask)
    bias = _pad_bias(mask)
    for lyr in params["encoder_layers"]:
        res = h
        x = layer_norm(lyr["self_attn_layer_norm"], h)
        h = res + _mha(lyr["self_attn"], x, x, cfg.encoder_heads, bias)
        res = h
        x = layer_norm(lyr["final_layer_norm"], h)
        x = jax.nn.relu(dense(lyr["fc1"], x))
        h = res + dense(lyr["fc2"], x)
    return layer_norm(params["encoder_norm"], h), mask


def decode_logits(params, cfg: S2TConfig, token_ids, enc_out, enc_mask):
    tok_mask = (token_ids != cfg.pad_token_id)
    h = jnp.take(params["embed_tokens"]["weight"], token_ids, axis=0)
    h = h * math.sqrt(cfg.d_model) + _pos_embed(cfg, tok_mask)
    s = token_ids.shape[1]
    self_bias = _causal_bias(s) + _pad_bias(tok_mask)
    cross_bias = _pad_bias(enc_mask)
    for lyr in params["decoder_layers"]:
        res = h
        x = layer_norm(lyr["self_attn_layer_norm"], h)
        h = res + _mha(lyr["self_attn"], x, x, cfg.decoder_heads, self_bias)
        res = h
        x = layer_norm(lyr["encoder_attn_layer_norm"], h)
        h = res + _mha(lyr["encoder_attn"], x, enc_out, cfg.decoder_heads,
                       cross_bias)
        res = h
        x = layer_norm(lyr["final_layer_norm"], h)
        x = jax.nn.relu(dense(lyr["fc1"], x))
        h = res + dense(lyr["fc2"], x)
    h = layer_norm(params["decoder_norm"], h)
    # tied LM head
    return jax.lax.dot_general(
        h, params["embed_tokens"]["weight"],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def greedy_decode(params, cfg: S2TConfig, features, mask, *,
                  forced_bos_id: int, max_len: int = 128,
                  decoder_start_id: Optional[int] = None):
    """Fixed-length greedy generation. Returns [B, max_len] int32 ids
    (eos-padded). Sequence layout: <start> <lang> tokens... </s>."""
    start = cfg.eos_token_id if decoder_start_id is None else decoder_start_id
    enc_out, enc_mask = encode(params, cfg, features, mask)
    b = features.shape[0]
    ids = jnp.full((b, max_len), cfg.pad_token_id, jnp.int32)
    ids = ids.at[:, 0].set(start)
    ids = ids.at[:, 1].set(forced_bos_id)
    done = jnp.zeros((b,), bool)

    def body(i, carry):
        ids, done = carry
        logits = decode_logits(params, cfg, ids, enc_out, enc_mask)
        nxt = jnp.argmax(logits[:, i - 1], axis=-1).astype(jnp.int32)
        nxt = jnp.where(done, cfg.pad_token_id, nxt)
        ids = ids.at[:, i].set(nxt)
        done = jnp.logical_or(done, nxt == cfg.eos_token_id)
        return ids, done

    ids, _ = jax.lax.fori_loop(2, max_len, body, (ids, done))
    return ids


# ---------------------------------------------------------------------------
# kaldi-style fbank features (HF Speech2TextFeatureExtractor equivalent)
# ---------------------------------------------------------------------------

def log_mel_fbank(wav: np.ndarray, sample_rate: int = 16000, *,
                  num_mels: int = 80, frame_ms: float = 25.0,
                  shift_ms: float = 10.0, cmvn: bool = True) -> np.ndarray:
    """[T] float waveform -> [frames, num_mels] log-mel fbank with
    per-utterance mean/var normalization (kaldi povey window, snip edges)."""
    wav = np.asarray(wav, np.float64) * 32768.0   # kaldi int16 scaling
    frame = int(sample_rate * frame_ms / 1000)
    shift = int(sample_rate * shift_ms / 1000)
    n_fft = 1 << (frame - 1).bit_length()
    n = 1 + (len(wav) - frame) // shift
    if n <= 0:
        return np.zeros((0, num_mels), np.float32)
    idx = np.arange(n)[:, None] * shift + np.arange(frame)[None, :]
    frames = wav[idx]
    frames = frames - frames.mean(axis=1, keepdims=True)  # remove DC
    frames = np.concatenate(
        [frames[:, :1], frames[:, 1:] - 0.97 * frames[:, :-1]], axis=1)
    window = (0.5 - 0.5 * np.cos(
        2 * np.pi * np.arange(frame) / (frame - 1))) ** 0.85  # povey
    spec = np.abs(np.fft.rfft(frames * window, n_fft)) ** 2
    # mel filterbank on the kaldi (HTK) mel scale
    def hz2mel(f):
        return 1127.0 * np.log(1.0 + np.asarray(f, np.float64) / 700.0)

    def mel2hz(m):
        return 700.0 * (np.exp(np.asarray(m, np.float64) / 1127.0) - 1.0)

    low, high = hz2mel(20.0), hz2mel(sample_rate / 2.0)
    pts = mel2hz(np.linspace(low, high, num_mels + 2))
    bins = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    fb = np.zeros((num_mels, len(bins)))
    for m in range(num_mels):
        left, center, right = pts[m], pts[m + 1], pts[m + 2]
        up = (bins - left) / (center - left)
        down = (right - bins) / (right - center)
        fb[m] = np.maximum(0, np.minimum(up, down))
    mel = spec @ fb.T
    logmel = np.log(np.maximum(mel, 1e-10))
    if cmvn:
        logmel = (logmel - logmel.mean(axis=0, keepdims=True)) \
            / (logmel.std(axis=0, keepdims=True) + 1e-8)
    return logmel.astype(np.float32)


# ---------------------------------------------------------------------------
# init + HF import
# ---------------------------------------------------------------------------

def init_s2t(key, cfg: S2TConfig, dtype=jnp.float32) -> Dict:
    from ..nn.core import Linear
    ks = iter(jax.random.split(key, 16 + 8 * (cfg.encoder_layers
                                              + cfg.decoder_layers)))

    def lin(i, o):
        return Linear(i, o).init(next(ks), dtype)

    def ln(d):
        return {"weight": jnp.ones((d,), dtype),
                "bias": jnp.zeros((d,), dtype)}

    def attn(d):
        return {"q_proj": lin(d, d), "k_proj": lin(d, d),
                "v_proj": lin(d, d), "out_proj": lin(d, d)}

    d = cfg.d_model
    convs = []
    in_ch = cfg.input_features
    for i in range(cfg.num_conv_layers):
        out_ch = (cfg.conv_channels if i < cfg.num_conv_layers - 1
                  else cfg.d_model * 2)
        w = 0.02 * jax.random.normal(
            next(ks), (out_ch, in_ch, cfg.conv_kernel), dtype)
        convs.append({"weight": w, "bias": jnp.zeros((out_ch,), dtype)})
        in_ch = out_ch // 2
    enc_layers = []
    for _ in range(cfg.encoder_layers):
        enc_layers.append({
            "self_attn": attn(d), "self_attn_layer_norm": ln(d),
            "fc1": lin(d, cfg.encoder_ffn), "fc2": lin(cfg.encoder_ffn, d),
            "final_layer_norm": ln(d)})
    dec_layers = []
    for _ in range(cfg.decoder_layers):
        dec_layers.append({
            "self_attn": attn(d), "self_attn_layer_norm": ln(d),
            "encoder_attn": attn(d), "encoder_attn_layer_norm": ln(d),
            "fc1": lin(d, cfg.decoder_ffn), "fc2": lin(cfg.decoder_ffn, d),
            "final_layer_norm": ln(d)})
    return {
        "conv": {"conv_layers": convs},
        "encoder_layers": enc_layers,
        "encoder_norm": ln(d),
        "embed_tokens": {"weight": 0.02 * jax.random.normal(
            next(ks), (cfg.vocab_size, d), dtype)},
        "decoder_layers": dec_layers,
        "decoder_norm": ln(d),
    }


def import_hf_state_dict(sd: Dict[str, np.ndarray],
                         cfg: S2TConfig) -> Dict:
    """Map an HF Speech2TextForConditionalGeneration state_dict."""
    p = "model." if any(k.startswith("model.") for k in sd) else ""

    def arr(n):
        return jnp.asarray(np.asarray(sd[n]))

    def lin(prefix):
        out = {"weight": arr(f"{prefix}.weight")}
        if f"{prefix}.bias" in sd:
            out["bias"] = arr(f"{prefix}.bias")
        return out

    def attn(prefix):
        return {k: lin(f"{prefix}.{k}")
                for k in ("q_proj", "k_proj", "v_proj", "out_proj")}

    convs = [lin(f"{p}encoder.conv.conv_layers.{i}")
             for i in range(cfg.num_conv_layers)]
    enc_layers = []
    for i in range(cfg.encoder_layers):
        b = f"{p}encoder.layers.{i}"
        enc_layers.append({
            "self_attn": attn(f"{b}.self_attn"),
            "self_attn_layer_norm": lin(f"{b}.self_attn_layer_norm"),
            "fc1": lin(f"{b}.fc1"), "fc2": lin(f"{b}.fc2"),
            "final_layer_norm": lin(f"{b}.final_layer_norm")})
    dec_layers = []
    for i in range(cfg.decoder_layers):
        b = f"{p}decoder.layers.{i}"
        dec_layers.append({
            "self_attn": attn(f"{b}.self_attn"),
            "self_attn_layer_norm": lin(f"{b}.self_attn_layer_norm"),
            "encoder_attn": attn(f"{b}.encoder_attn"),
            "encoder_attn_layer_norm": lin(f"{b}.encoder_attn_layer_norm"),
            "fc1": lin(f"{b}.fc1"), "fc2": lin(f"{b}.fc2"),
            "final_layer_norm": lin(f"{b}.final_layer_norm")})
    return {
        "conv": {"conv_layers": convs},
        "encoder_layers": enc_layers,
        "encoder_norm": lin(f"{p}encoder.layer_norm"),
        "embed_tokens": lin(f"{p}decoder.embed_tokens"),
        "decoder_layers": dec_layers,
        "decoder_norm": lin(f"{p}decoder.layer_norm"),
    }
