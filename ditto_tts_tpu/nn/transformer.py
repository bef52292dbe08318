"""Post-LN transformer decoder (torch.nn.TransformerDecoder semantics).

The SLP uses a stock torch TransformerDecoder with causal self-attention and
cross-attention to ByT5 text memory (ref: src/model/SpeechLP.py:22-30,50-52).
Torch defaults reproduced here: post-norm (norm_first=False), ReLU FF,
dropout inert at inference, LN eps 1e-5, packed MHA in_proj layout.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .core import LayerNorm, Linear, dense, layer_norm
from ..ops.attention import attention
from ..models import dit as _dit_mod  # reuse _mha_init layout


def _mha_apply(params, num_heads, q_in, kv_in, *, causal=False):
    h = q_in.shape[-1]
    w = params["in_proj_weight"]
    b = params["in_proj_bias"]
    q = dense({"weight": w[:h], "bias": b[:h]}, q_in)
    k = dense({"weight": w[h:2 * h], "bias": b[h:2 * h]}, kv_in)
    v = dense({"weight": w[2 * h:], "bias": b[2 * h:]}, kv_in)

    def split(x):
        bsz, s, _ = x.shape
        return x.reshape(bsz, s, num_heads, h // num_heads).transpose(
            0, 2, 1, 3)

    out = attention(split(q), split(k), split(v), causal=causal)
    bsz, nh, s, d = out.shape
    out = out.transpose(0, 2, 1, 3).reshape(bsz, s, h)
    return dense(params["out_proj"], out)


@dataclasses.dataclass(frozen=True)
class TransformerDecoderLayer:
    d_model: int
    nhead: int
    dim_feedforward: int

    def init(self, key, dtype=jnp.float32) -> Dict:
        ks = jax.random.split(key, 7)
        d = self.d_model
        return {
            "self_attn": _dit_mod._mha_init(ks[0], d, dtype),
            "cross_attn": _dit_mod._mha_init(ks[1], d, dtype),
            "linear1": Linear(d, self.dim_feedforward).init(ks[2], dtype),
            "linear2": Linear(self.dim_feedforward, d).init(ks[3], dtype),
            "norm1": LayerNorm(d).init(ks[4], dtype),
            "norm2": LayerNorm(d).init(ks[5], dtype),
            "norm3": LayerNorm(d).init(ks[6], dtype),
        }

    def apply(self, params, x, memory, *, causal_self=True):
        # post-norm: x = LN(x + sublayer(x))
        sa = _mha_apply(params["self_attn"], self.nhead, x, x,
                        causal=causal_self)
        x = layer_norm(params["norm1"], x + sa)
        ca = _mha_apply(params["cross_attn"], self.nhead, x, memory)
        x = layer_norm(params["norm2"], x + ca)
        ff = dense(params["linear2"],
                   jax.nn.relu(dense(params["linear1"], x)))
        return layer_norm(params["norm3"], x + ff)


@dataclasses.dataclass(frozen=True)
class TransformerDecoder:
    d_model: int
    nhead: int
    dim_feedforward: int
    num_layers: int

    def init(self, key, dtype=jnp.float32):
        layer = TransformerDecoderLayer(self.d_model, self.nhead,
                                        self.dim_feedforward)
        return [layer.init(k, dtype)
                for k in jax.random.split(key, self.num_layers)]

    def apply(self, params_layers, x, memory, *, causal_self=True):
        layer = TransformerDecoderLayer(self.d_model, self.nhead,
                                        self.dim_feedforward)
        for p in params_layers:
            x = layer.apply(p, x, memory, causal_self=causal_self)
        return x
