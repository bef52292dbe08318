"""ByT5 (T5 v1.1) encoder stack in JAX (HF-weight compatible).

The reference uses a frozen ``google/byt5-small`` encoder as the SLP's text
encoder (ref: src/components/ByT5.py:5-32, src/model/SpeechLP.py:17-18;
d_model=1472, ref Config.py:74). This is a from-scratch implementation of
the T5 encoder semantics:

  * RMS layer norm (no mean subtraction), weight-only, pre-LN blocks
  * self-attention WITHOUT 1/sqrt(d) scaling (T5 convention), with shared
    relative-position bucket bias from block 0
  * gated-GELU feed-forward (wi_0 ⊙ gelu_new, wi_1, wo), no biases anywhere

byt5-small geometry: vocab 384, d_model 1472, d_ff 3584, 12 encoder layers,
6 heads, d_kv 64, 32 buckets / max_distance 128.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from .gpt2 import gelu_new


@dataclasses.dataclass(frozen=True)
class ByT5Config:
    vocab_size: int = 384
    d_model: int = 1472
    d_kv: int = 64
    d_ff: int = 3584
    num_layers: int = 12
    num_heads: int = 6
    relative_attention_num_buckets: int = 32
    relative_attention_max_distance: int = 128
    layer_norm_epsilon: float = 1e-6

    @property
    def inner_dim(self) -> int:
        return self.num_heads * self.d_kv


def byt5_small_config() -> ByT5Config:
    return ByT5Config()


def rms_norm(weight, x, eps=1e-6):
    xf = x.astype(jnp.float32)
    var = jnp.mean(jnp.square(xf), axis=-1, keepdims=True)
    return (weight * (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype))


def _relative_position_bucket(relative_position, num_buckets=32,
                              max_distance=128):
    """T5 bidirectional bucketing (numpy, host-side: static per seq len)."""
    rp = relative_position
    num_buckets //= 2
    ret = (rp > 0).astype(np.int64) * num_buckets
    rp = np.abs(rp)
    max_exact = num_buckets // 2
    is_small = rp < max_exact
    large = max_exact + (
        np.log(np.maximum(rp, 1) / max_exact) / np.log(max_distance / max_exact)
        * (num_buckets - max_exact)).astype(np.int64)
    large = np.minimum(large, num_buckets - 1)
    return ret + np.where(is_small, rp, large)


def position_bias(params, cfg: ByT5Config, seq_len: int):
    """[1, heads, S, S] additive bias from block-0's relative embedding."""
    ctx = np.arange(seq_len)[:, None]
    mem = np.arange(seq_len)[None, :]
    buckets = _relative_position_bucket(
        mem - ctx, cfg.relative_attention_num_buckets,
        cfg.relative_attention_max_distance)
    table = params["relative_attention_bias"]["weight"]  # [buckets, heads]
    bias = jnp.take(table, jnp.asarray(buckets), axis=0)  # [S, S, heads]
    return bias.transpose(2, 0, 1)[None]


def _no_bias_dense(w, x):
    return jax.lax.dot_general(
        x, w, dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)


def _self_attn(p, cfg: ByT5Config, x, bias):
    b, s, _ = x.shape
    nh, dk = cfg.num_heads, cfg.d_kv
    q = _no_bias_dense(p["q"]["weight"], x).reshape(b, s, nh, dk)
    k = _no_bias_dense(p["k"]["weight"], x).reshape(b, s, nh, dk)
    v = _no_bias_dense(p["v"]["weight"], x).reshape(b, s, nh, dk)
    # T5: no 1/sqrt(d) scaling
    scores = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                        preferred_element_type=jnp.float32)
    scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bkhd->bqhd", probs, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    return _no_bias_dense(p["o"]["weight"], out.reshape(b, s, nh * dk))


def byt5_encode(params, cfg: ByT5Config, input_ids, attention_mask=None):
    """input_ids: [B, S] -> last hidden state [B, S, d_model]."""
    x = jnp.take(params["shared"]["weight"], input_ids, axis=0)

    s = input_ids.shape[1]
    bias = position_bias(params["block0_rel"], cfg, s)
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
        bias = bias + pad[:, None, None, :]

    for blk in params["blocks"]:
        h = rms_norm(blk["attn_norm"]["weight"], x, cfg.layer_norm_epsilon)
        x = x + _self_attn(blk["attn"], cfg, h, bias)
        h = rms_norm(blk["ff_norm"]["weight"], x, cfg.layer_norm_epsilon)
        gated = gelu_new(_no_bias_dense(blk["ff"]["wi_0"]["weight"], h)) \
            * _no_bias_dense(blk["ff"]["wi_1"]["weight"], h)
        x = x + _no_bias_dense(blk["ff"]["wo"]["weight"], gated)

    return rms_norm(params["final_norm"]["weight"], x,
                    cfg.layer_norm_epsilon)


# ---------------------------------------------------------------------------
# init + HF import
# ---------------------------------------------------------------------------

def init_byt5(key, cfg: ByT5Config, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 3 + 8 * cfg.num_layers))

    def w(k, shape, std):
        return {"weight": std * jax.random.normal(k, shape, dtype)}

    d, dk, nh, dff = cfg.d_model, cfg.d_kv, cfg.num_heads, cfg.d_ff
    inner = nh * dk
    blocks = []
    for _ in range(cfg.num_layers):
        blocks.append({
            "attn": {
                "q": w(next(ks), (inner, d), (d * dk) ** -0.5),
                "k": w(next(ks), (inner, d), d ** -0.5),
                "v": w(next(ks), (inner, d), d ** -0.5),
                "o": w(next(ks), (d, inner), inner ** -0.5),
            },
            "attn_norm": {"weight": jnp.ones((d,), dtype)},
            "ff": {
                "wi_0": w(next(ks), (dff, d), d ** -0.5),
                "wi_1": w(next(ks), (dff, d), d ** -0.5),
                "wo": w(next(ks), (d, dff), dff ** -0.5),
            },
            "ff_norm": {"weight": jnp.ones((d,), dtype)},
        })
    return {
        "shared": w(next(ks), (cfg.vocab_size, d), 1.0),
        "block0_rel": {"relative_attention_bias": w(
            next(ks), (cfg.relative_attention_num_buckets, nh),
            inner ** -0.5)},
        "blocks": blocks,
        "final_norm": {"weight": jnp.ones((d,), dtype)},
    }


def import_hf_state_dict(sd: Dict[str, np.ndarray],
                         cfg: ByT5Config) -> Dict:
    """Map an HF T5EncoderModel state_dict to params."""
    def arr(name):
        return jnp.asarray(np.asarray(sd[name]))

    blocks = []
    for i in range(cfg.num_layers):
        b = f"encoder.block.{i}"
        blocks.append({
            "attn": {
                "q": {"weight": arr(f"{b}.layer.0.SelfAttention.q.weight")},
                "k": {"weight": arr(f"{b}.layer.0.SelfAttention.k.weight")},
                "v": {"weight": arr(f"{b}.layer.0.SelfAttention.v.weight")},
                "o": {"weight": arr(f"{b}.layer.0.SelfAttention.o.weight")},
            },
            "attn_norm": {"weight": arr(f"{b}.layer.0.layer_norm.weight")},
            "ff": {
                "wi_0": {"weight": arr(
                    f"{b}.layer.1.DenseReluDense.wi_0.weight")},
                "wi_1": {"weight": arr(
                    f"{b}.layer.1.DenseReluDense.wi_1.weight")},
                "wo": {"weight": arr(f"{b}.layer.1.DenseReluDense.wo.weight")},
            },
            "ff_norm": {"weight": arr(f"{b}.layer.1.layer_norm.weight")},
        })
    return {
        "shared": {"weight": arr("shared.weight")},
        "block0_rel": {"relative_attention_bias": {"weight": arr(
            "encoder.block.0.layer.0.SelfAttention"
            ".relative_attention_bias.weight")}},
        "blocks": blocks,
        "final_norm": {"weight": arr("encoder.final_layer_norm.weight")},
    }
