"""SEANet-style convolutional encoder/decoder (EnCodec-24kHz geometry).

Behavioral spec: HF transformers EncodecEncoder/EncodecDecoder (see
modeling_encodec.py) — referenced by the reference repo through the frozen
``facebook/encodec_24khz`` model (ref: src/components/EnCodec.py:16,
src/model/NeuralAudioCodec.py:17). This is a from-scratch functional JAX
implementation; weight-norm from checkpoints is folded into plain conv
weights at import time (codec/encodec.py).

Encoder: init conv -> 4x [resblock, ELU, strided conv x2ch] (strides
2,4,5,8) -> 2-layer residual LSTM -> ELU -> final conv to latent dim.
Decoder mirrors it with transposed convs (strides 8,5,4,2).

All convs run as lax.conv_general_dilated (MXU implicit GEMM); the LSTM
hoists input projections out of the time scan (nn/lstm.py).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from ..core.config import CodecConfig
from ..nn.conv import causal_conv1d, causal_conv_transpose1d
from ..nn.lstm import init_lstm, lstm


def _conv_init(key, out_ch, in_ch, k, dtype=jnp.float32):
    import math
    kw, kb = jax.random.split(key)
    fan_in = in_ch * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(kw, (out_ch, in_ch, k), dtype,
                                     -bound, bound),
        "bias": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def _convtr_init(key, in_ch, out_ch, k, dtype=jnp.float32):
    import math
    kw, kb = jax.random.split(key)
    fan_in = out_ch * k
    bound = 1.0 / math.sqrt(fan_in)
    return {
        "weight": jax.random.uniform(kw, (in_ch, out_ch, k), dtype,
                                     -bound, bound),
        "bias": jax.random.uniform(kb, (out_ch,), dtype, -bound, bound),
    }


def _resblock_init(key, cfg: CodecConfig, dim: int, dtype=jnp.float32):
    k1, k2, k3 = jax.random.split(key, 3)
    hidden = dim // cfg.compress
    return {
        "conv1": _conv_init(k1, hidden, dim, cfg.residual_kernel_size, dtype),
        "conv2": _conv_init(k2, dim, hidden, 1, dtype),
        "shortcut": _conv_init(k3, dim, dim, 1, dtype),
    }


def init_encoder(key, cfg: CodecConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 4 + 2 * len(cfg.ratios))
    ki = iter(keys)
    stages = []
    ch = cfg.num_filters
    params = {"init_conv": _conv_init(next(ki), ch, cfg.channels,
                                      cfg.kernel_size, dtype)}
    for ratio in reversed(cfg.ratios):
        res = [_resblock_init(next(ki), cfg, ch, dtype)
               for _ in range(cfg.num_residual_layers)]
        down = _conv_init(next(ki), ch * 2, ch, ratio * 2, dtype)
        stages.append({"resblocks": res, "down": down})
        ch *= 2
    params["stages"] = stages
    params["lstm"] = init_lstm(next(ki), ch, ch, cfg.lstm_layers, dtype)
    params["final_conv"] = _conv_init(next(ki), cfg.dimension, ch,
                                      cfg.last_kernel_size, dtype)
    return params


def init_decoder(key, cfg: CodecConfig, dtype=jnp.float32) -> Dict:
    keys = jax.random.split(key, 4 + 2 * len(cfg.ratios))
    ki = iter(keys)
    ch = cfg.num_filters * (2 ** len(cfg.ratios))
    params = {"init_conv": _conv_init(next(ki), ch, cfg.dimension,
                                      cfg.kernel_size, dtype)}
    params["lstm"] = init_lstm(next(ki), ch, ch, cfg.lstm_layers, dtype)
    stages = []
    for ratio in cfg.ratios:
        up = _convtr_init(next(ki), ch, ch // 2, ratio * 2, dtype)
        res = [_resblock_init(next(ki), cfg, ch // 2, dtype)
               for _ in range(cfg.num_residual_layers)]
        stages.append({"up": up, "resblocks": res})
        ch //= 2
    params["stages"] = stages
    params["final_conv"] = _conv_init(next(ki), cfg.channels, ch,
                                      cfg.last_kernel_size, dtype)
    return params


def _conv_fn(cfg: CodecConfig):
    """Stride-1 conv lowering for the [B, C, T] SEANet bodies: the
    time-minor VMEM-accumulator Pallas kernel where the shape qualifies
    (ops/conv_pallas.py — same dispatch rationale as the vocoder's
    narrow stages; the codec is 32-512 channels at up to 240k samples).
    cfg.conv_impl='xla' restores lax.conv everywhere.  Off-TPU the
    fallback is always lax.conv (interpret mode is test-only — forced
    via ops.conv_pallas.FORCE_INTERPRET)."""
    if getattr(cfg, "conv_impl", "pallas") != "pallas":
        return None
    from ..ops.conv_pallas import pallas_mode
    interp = pallas_mode()
    if interp is None:
        return None
    from ..ops.conv_pallas import conv1d_ncl_pallas

    def f(x, w, b=None, *, dilation=1):
        if min(w.shape[0], w.shape[1]) < 8:   # 1-ch waveform ends
            from ..nn.conv import conv1d
            return conv1d(x, w, b, dilation=dilation)
        return conv1d_ncl_pallas(x, w, b, dilation=dilation,
                                 interpret=interp)
    return f


def _resblock(p, cfg: CodecConfig, x, dilation: int, conv_fn=None):
    y = jax.nn.elu(x)
    y = causal_conv1d(y, p["conv1"]["weight"], p["conv1"]["bias"],
                      dilation=dilation, causal=cfg.causal, conv_fn=conv_fn)
    y = jax.nn.elu(y)
    y = causal_conv1d(y, p["conv2"]["weight"], p["conv2"]["bias"],
                      causal=cfg.causal, conv_fn=conv_fn)
    short = causal_conv1d(x, p["shortcut"]["weight"], p["shortcut"]["bias"],
                          causal=cfg.causal, conv_fn=conv_fn)
    return short + y


def _residual_lstm(params, x):
    """x: [B, C, T]; EnCodec applies LSTM time-major with residual."""
    h = x.transpose(2, 0, 1)           # [T, B, C]
    h = lstm(params, h) + h
    return h.transpose(1, 2, 0)


def encode(params, cfg: CodecConfig, x):
    """x: [B, channels, L] waveform -> [B, dimension, frames] latents."""
    cf = _conv_fn(cfg)
    h = causal_conv1d(x, params["init_conv"]["weight"],
                      params["init_conv"]["bias"], causal=cfg.causal,
                      conv_fn=cf)
    for stage, ratio in zip(params["stages"], reversed(cfg.ratios)):
        for j, rb in enumerate(stage["resblocks"]):
            h = _resblock(rb, cfg, h, cfg.dilation_base ** j, conv_fn=cf)
        h = jax.nn.elu(h)
        h = causal_conv1d(h, stage["down"]["weight"], stage["down"]["bias"],
                          stride=ratio, causal=cfg.causal)
    h = _residual_lstm(params["lstm"], h)
    h = jax.nn.elu(h)
    return causal_conv1d(h, params["final_conv"]["weight"],
                         params["final_conv"]["bias"], causal=cfg.causal,
                         conv_fn=cf)


def decode(params, cfg: CodecConfig, z):
    """z: [B, dimension, frames] -> [B, channels, L] waveform."""
    cf = _conv_fn(cfg)
    h = causal_conv1d(z, params["init_conv"]["weight"],
                      params["init_conv"]["bias"], causal=cfg.causal,
                      conv_fn=cf)
    h = _residual_lstm(params["lstm"], h)
    for stage, ratio in zip(params["stages"], cfg.ratios):
        h = jax.nn.elu(h)
        h = causal_conv_transpose1d(
            h, stage["up"]["weight"], stage["up"]["bias"],
            stride=ratio, causal=cfg.causal,
            trim_right_ratio=cfg.trim_right_ratio)
        for j, rb in enumerate(stage["resblocks"]):
            h = _resblock(rb, cfg, h, cfg.dilation_base ** j, conv_fn=cf)
    h = jax.nn.elu(h)
    return causal_conv1d(h, params["final_conv"]["weight"],
                         params["final_conv"]["bias"], causal=cfg.causal,
                         conv_fn=cf)
