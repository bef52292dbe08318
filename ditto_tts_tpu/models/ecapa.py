"""ECAPA-TDNN speaker embedding in JAX (speechbrain-compatible geometry).

The reference computes SIM-o/SIM-r with speechbrain's frozen
``spkrec-ecapa-voxceleb`` ECAPA-TDNN (ref: src/Experiments.ipynb cell 14).
This is a from-scratch JAX implementation of the published architecture
(Desplanques et al. 2020) at that checkpoint's geometry:

  fbank [B, T, 80] -> TDNN conv(k5) -> 3x SE-Res2Net blocks (k3, dilations
  2/3/4, scale 8, SE-128) -> concat(3 x 512) -> conv 1536 -> attentive
  statistics pooling (128 attention channels, global context) -> BN ->
  linear to 192-dim embedding.

BatchNorms run in inference mode (running stats — the model is frozen for
eval). ``import_speechbrain_state_dict`` maps the speechbrain checkpoint
naming (embedding_model.blocks.*) into the param tree.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class ECAPAConfig:
    input_features: int = 80
    channels: int = 512
    out_channels: int = 1536
    embedding_dim: int = 192
    scale: int = 8
    se_channels: int = 128
    attention_channels: int = 128
    kernel: int = 5
    res_kernel: int = 3
    dilations: tuple = (2, 3, 4)


def _conv1d_same(x, w, b=None, *, dilation=1):
    """x: [B, C, T]; torch-layout w [O, I, K]; reflect 'same' padding
    (speechbrain Conv1d default)."""
    k = w.shape[-1]
    eff = (k - 1) * dilation
    left = eff // 2
    right = eff - left
    if left or right:
        x = jnp.pad(x, ((0, 0), (0, 0), (left, right)), mode="reflect")
    y = jax.lax.conv_general_dilated(
        x, w, window_strides=(1,), padding="VALID", rhs_dilation=(dilation,),
        dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32).astype(x.dtype)
    if b is not None:
        y = y + b[None, :, None]
    return y


def _bn(p, x, eps=1e-5):
    """Inference BatchNorm1d over channel axis of [B, C, T] or [B, C]."""
    mean = p["running_mean"]
    var = p["running_var"]
    shape = (1, -1, 1) if x.ndim == 3 else (1, -1)
    y = (x - mean.reshape(shape)) * jax.lax.rsqrt(
        var.reshape(shape) + eps)
    return y * p["weight"].reshape(shape) + p["bias"].reshape(shape)


def _tdnn(p, x, *, dilation=1):
    return _bn(p["norm"], jax.nn.relu(
        _conv1d_same(x, p["conv"]["weight"], p["conv"].get("bias"),
                     dilation=dilation)))


def _res2net(p, cfg: ECAPAConfig, x, dilation):
    chunks = jnp.split(x, cfg.scale, axis=1)
    outs = [chunks[0]]
    prev = None
    for i in range(1, cfg.scale):
        inp = chunks[i] if prev is None else chunks[i] + prev
        prev = _tdnn(p["blocks"][i - 1], inp, dilation=dilation)
        outs.append(prev)
    return jnp.concatenate(outs, axis=1)


def _se(p, x, lengths_mask=None):
    if lengths_mask is None:
        s = jnp.mean(x, axis=2, keepdims=True)
    else:
        m = lengths_mask[:, None, :].astype(x.dtype)
        s = jnp.sum(x * m, axis=2, keepdims=True) \
            / jnp.sum(m, axis=2, keepdims=True)
    s = jax.nn.relu(_conv1d_same(s, p["conv1"]["weight"],
                                 p["conv1"].get("bias")))
    s = jax.nn.sigmoid(_conv1d_same(s, p["conv2"]["weight"],
                                    p["conv2"].get("bias")))
    return x * s


def _se_res2net_block(p, cfg: ECAPAConfig, x, dilation, mask):
    residual = x
    y = _tdnn(p["tdnn1"], x)
    y = _res2net(p["res2net"], cfg, y, dilation)
    y = _tdnn(p["tdnn2"], y)
    y = _se(p["se"], y, mask)
    return y + residual


def _asp(p, cfg: ECAPAConfig, x, mask=None):
    """Attentive statistics pooling with global context."""
    b, c, t = x.shape
    if mask is None:
        m = jnp.ones((b, t), x.dtype)
    else:
        m = mask.astype(x.dtype)
    total = jnp.sum(m, axis=1, keepdims=True)

    def stats(v, w):
        mean = jnp.sum(v * w[:, None, :], axis=2) / total
        var = jnp.sum((v - mean[..., None]) ** 2 * w[:, None, :],
                      axis=2) / total
        return mean, jnp.sqrt(jnp.clip(var, 1e-12))

    gmean, gstd = stats(x, m)
    ctx = jnp.concatenate(
        [x, jnp.broadcast_to(gmean[..., None], x.shape),
         jnp.broadcast_to(gstd[..., None], x.shape)], axis=1)
    # attention MLP is a full TDNNBlock (conv -> ReLU -> BN) then tanh
    # (speechbrain AttentiveStatisticsPooling.tdnn), then the score conv
    a = jnp.tanh(_bn(p["tdnn_norm"], jax.nn.relu(_conv1d_same(
        ctx, p["tdnn_conv"]["weight"], p["tdnn_conv"].get("bias")))))
    a = _conv1d_same(a, p["conv"]["weight"], p["conv"].get("bias"))
    a = jnp.where(m[:, None, :] > 0, a, -jnp.inf)
    w = jax.nn.softmax(a, axis=2)
    mean = jnp.sum(x * w, axis=2)
    # weighted E[(x-mean)^2] like speechbrain's _compute_statistics
    std = jnp.sqrt(jnp.clip(
        jnp.sum((x - mean[..., None]) ** 2 * w, axis=2), 1e-12))
    return jnp.concatenate([mean, std], axis=1)


def ecapa_embed(params, cfg: ECAPAConfig, features, mask=None):
    """features: [B, T, 80] fbank -> [B, 192] speaker embedding."""
    x = features.transpose(0, 2, 1)          # [B, 80, T]
    x = _tdnn(params["block0"], x)
    outs = []
    for i, dil in enumerate(cfg.dilations):
        x = _se_res2net_block(params["blocks"][i], cfg, x, dil, mask)
        outs.append(x)
    x = jnp.concatenate(outs, axis=1)
    # MFA is a full TDNNBlock (conv -> ReLU -> BN), speechbrain ECAPA_TDNN.mfa
    x = _tdnn(params["mfa"], x)
    pooled = _asp(params["asp"], cfg, x, mask)
    pooled = _bn(params["asp_norm"], pooled[..., None])[..., 0]
    emb = _conv1d_same(pooled[..., None], params["fc"]["weight"],
                       params["fc"].get("bias"))[..., 0]
    return emb


def tiny_ecapa_config() -> ECAPAConfig:
    """Sandbox geometry for closed-loop eval discrimination: small enough
    to train on CPU in seconds, same architecture end to end."""
    return ECAPAConfig(channels=64, out_channels=128, embedding_dim=32,
                       se_channels=32, attention_channels=32, scale=4)


def init_ecapa(key, cfg: ECAPAConfig, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 128))

    def conv(o, i, k):
        return {"weight": 0.05 * jax.random.normal(next(ks), (o, i, k),
                                                   dtype),
                "bias": jnp.zeros((o,), dtype)}

    def bn(c):
        return {"weight": jnp.ones((c,), dtype),
                "bias": jnp.zeros((c,), dtype),
                "running_mean": jnp.zeros((c,), dtype),
                "running_var": jnp.ones((c,), dtype)}

    def tdnn(o, i, k):
        return {"conv": conv(o, i, k), "norm": bn(o)}

    c = cfg.channels
    sub = c // cfg.scale
    blocks = []
    for _ in cfg.dilations:
        blocks.append({
            "tdnn1": tdnn(c, c, 1),
            "res2net": {"blocks": [tdnn(sub, sub, cfg.res_kernel)
                                   for _ in range(cfg.scale - 1)]},
            "tdnn2": tdnn(c, c, 1),
            "se": {"conv1": conv(cfg.se_channels, c, 1),
                   "conv2": conv(c, cfg.se_channels, 1)},
        })
    return {
        "block0": tdnn(c, cfg.input_features, cfg.kernel),
        "blocks": blocks,
        "mfa": tdnn(cfg.out_channels, 3 * c, 1),
        "asp": {"tdnn_conv": conv(cfg.attention_channels,
                                  3 * cfg.out_channels, 1),
                "tdnn_norm": bn(cfg.attention_channels),
                "conv": conv(cfg.out_channels, cfg.attention_channels, 1)},
        "asp_norm": bn(2 * cfg.out_channels),
        "fc": conv(cfg.embedding_dim, 2 * cfg.out_channels, 1),
    }


def import_speechbrain_state_dict(sd: Dict[str, np.ndarray],
                                  cfg: ECAPAConfig) -> Dict:
    """Map a speechbrain ECAPA-TDNN embedding_model state_dict.

    speechbrain naming: blocks.0 = initial TDNN, blocks.1-3 = SERes2Net,
    blocks.4 = MFA conv, mfa? -> asp = ASP, asp_bn, fc. Conv weights live
    under ``.conv.weight`` with shape [O, I, K]; BN under ``.norm.norm.*``.
    """
    pre = ""
    if any(k.startswith("embedding_model.") for k in sd):
        pre = "embedding_model."

    def arr(n):
        return jnp.asarray(np.asarray(sd[pre + n]))

    def conv(n):
        out = {"weight": arr(f"{n}.conv.weight")}
        if pre + f"{n}.conv.bias" in sd:
            out["bias"] = arr(f"{n}.conv.bias")
        return out

    def bn(n):
        return {"weight": arr(f"{n}.norm.weight"),
                "bias": arr(f"{n}.norm.bias"),
                "running_mean": arr(f"{n}.norm.running_mean"),
                "running_var": arr(f"{n}.norm.running_var")}

    def tdnn(n):
        return {"conv": conv(f"{n}.conv"), "norm": bn(f"{n}.norm")}

    blocks = []
    for b in range(1, 4):
        base = f"blocks.{b}"
        blocks.append({
            "tdnn1": tdnn(f"{base}.tdnn1"),
            "res2net": {"blocks": [tdnn(f"{base}.res2net_block.blocks.{i}")
                                   for i in range(cfg.scale - 1)]},
            "tdnn2": tdnn(f"{base}.tdnn2"),
            "se": {"conv1": conv(f"{base}.se_block.conv1"),
                   "conv2": conv(f"{base}.se_block.conv2")},
        })
    return {
        "block0": tdnn("blocks.0"),
        "blocks": blocks,
        "mfa": tdnn("mfa"),
        "asp": {"tdnn_conv": conv("asp.tdnn.conv"),
                "tdnn_norm": bn("asp.tdnn.norm"),
                "conv": conv("asp.conv")},
        "asp_norm": bn("asp_bn"),
        "fc": conv("fc"),
    }
