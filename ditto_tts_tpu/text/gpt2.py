"""GPT2 language model in JAX (HF-weight compatible).

Used two ways by the framework, mirroring the reference:
  * NAC alignment loss: GPT2 LM over codec latent embeddings with text ids
    as labels (ref: src/model/NeuralAudioCodec.py:52-58).
  * DiT text conditioning: raw ``wte`` token embeddings
    (ref: src/TrainDiTTO.py:72-73, SpeechGenerator.py:101-103).

Implements the full gpt2-small decoder stack: learned positions, pre-LN
blocks with causal self-attention (HF ``Conv1D`` [in, out] weight layout),
exact-tanh GELU ("gelu_new"), tied LM head. Forward takes ``inputs_embeds``
(the NAC path feeds latents directly) and an optional attention mask;
``lm_loss`` reproduces HF's shifted cross-entropy.

TPU notes: everything is dense matmul + softmax at seq<=1024 — XLA fuses
this well without custom kernels; the causal mask is applied as an additive
bias so the attention op stays a single fused region. bf16-friendly: all
reductions in fp32.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..nn.core import layer_norm


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    vocab_size: int = 50257
    n_positions: int = 1024
    n_embd: int = 768
    n_layer: int = 12
    n_head: int = 12
    layer_norm_epsilon: float = 1e-5


def gelu_new(x):
    """HF 'gelu_new' — tanh approximation used by GPT2."""
    c = math.sqrt(2.0 / math.pi)
    xf = x.astype(jnp.float32)
    y = 0.5 * xf * (1.0 + jnp.tanh(c * (xf + 0.044715 * jnp.power(xf, 3.0))))
    return y.astype(x.dtype)


def _conv1d_hf(params, x):
    """HF GPT2 'Conv1D': y = x @ W + b with W stored [in, out]."""
    y = jax.lax.dot_general(
        x, params["weight"],
        dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32).astype(x.dtype)
    return y + params["bias"]


def _attn(block, cfg: GPT2Config, x, attn_bias):
    b, s, h = x.shape
    nh, d = cfg.n_head, h // cfg.n_head
    qkv = _conv1d_hf(block["attn"]["c_attn"], x)
    q, k, v = jnp.split(qkv, 3, axis=-1)
    q = q.reshape(b, s, nh, d).transpose(0, 2, 1, 3)
    k = k.reshape(b, s, nh, d).transpose(0, 2, 1, 3)
    v = v.reshape(b, s, nh, d).transpose(0, 2, 1, 3)
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                        preferred_element_type=jnp.float32) / math.sqrt(d)
    scores = scores + attn_bias
    p = jax.nn.softmax(scores, axis=-1).astype(v.dtype)
    out = jnp.einsum("bhqk,bhkd->bhqd", p, v,
                     preferred_element_type=jnp.float32).astype(x.dtype)
    out = out.transpose(0, 2, 1, 3).reshape(b, s, h)
    return _conv1d_hf(block["attn"]["c_proj"], out)


def _block(block, cfg: GPT2Config, x, attn_bias):
    x = x + _attn(block, cfg, layer_norm(block["ln_1"], x,
                                         eps=cfg.layer_norm_epsilon),
                  attn_bias)
    h = layer_norm(block["ln_2"], x, eps=cfg.layer_norm_epsilon)
    h = gelu_new(_conv1d_hf(block["mlp"]["c_fc"], h))
    h = _conv1d_hf(block["mlp"]["c_proj"], h)
    return x + h


def gpt2_hidden_states(params, cfg: GPT2Config, inputs_embeds,
                       attention_mask=None):
    """Transformer stack on embeddings. inputs_embeds: [B, S, H]."""
    b, s, _ = inputs_embeds.shape
    pos = jnp.arange(s)
    x = inputs_embeds + jnp.take(params["wpe"]["weight"], pos, axis=0)

    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    bias = jnp.where(col <= row, 0.0, -1e9)[None, None]
    if attention_mask is not None:
        pad = (1.0 - attention_mask.astype(jnp.float32)) * -1e9
        bias = bias + pad[:, None, None, :]

    for blk in params["h"]:
        x = _block(blk, cfg, x, bias)
    return layer_norm(params["ln_f"], x, eps=cfg.layer_norm_epsilon)


def gpt2_logits(params, cfg: GPT2Config, inputs_embeds, attention_mask=None):
    h = gpt2_hidden_states(params, cfg, inputs_embeds, attention_mask)
    # tied LM head: logits = h @ wte.T
    return jax.lax.dot_general(
        h, params["wte"]["weight"],
        dimension_numbers=(((2,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)


def lm_loss(logits, labels):
    """HF causal-LM loss: shift, mean CE over positions (no ignore index —
    the reference passes raw ids as labels, NeuralAudioCodec.py:52-56)."""
    lg = logits[:, :-1].astype(jnp.float32)
    lb = labels[:, 1:]
    logp = jax.nn.log_softmax(lg, axis=-1)
    nll = -jnp.take_along_axis(logp, lb[..., None], axis=-1)[..., 0]
    return jnp.mean(nll)


def embed_tokens(params, ids):
    """Raw wte lookup (DiT text conditioning path)."""
    return jnp.take(params["wte"]["weight"], ids, axis=0)


# ---------------------------------------------------------------------------
# init + HF import
# ---------------------------------------------------------------------------

def init_gpt2(key, cfg: GPT2Config, dtype=jnp.float32) -> Dict:
    ks = iter(jax.random.split(key, 4 + 8 * cfg.n_layer))
    h = cfg.n_embd

    def nrm(k, shape, std=0.02):
        return std * jax.random.normal(k, shape, dtype)

    def c1d(k, din, dout):
        return {"weight": nrm(k, (din, dout)),
                "bias": jnp.zeros((dout,), dtype)}

    def ln():
        return {"weight": jnp.ones((h,), dtype),
                "bias": jnp.zeros((h,), dtype)}

    blocks = []
    for _ in range(cfg.n_layer):
        blocks.append({
            "ln_1": ln(),
            "attn": {"c_attn": c1d(next(ks), h, 3 * h),
                     "c_proj": c1d(next(ks), h, h)},
            "ln_2": ln(),
            "mlp": {"c_fc": c1d(next(ks), h, 4 * h),
                    "c_proj": c1d(next(ks), 4 * h, h)},
        })
    return {
        "wte": {"weight": nrm(next(ks), (cfg.vocab_size, h))},
        "wpe": {"weight": nrm(next(ks), (cfg.n_positions, h), 0.01)},
        "h": blocks,
        "ln_f": ln(),
    }


def import_hf_state_dict(sd: Dict[str, np.ndarray],
                         cfg: GPT2Config) -> Dict:
    """Map an HF GPT2LMHeadModel (or GPT2Model) state_dict to params."""
    p = "transformer." if any(k.startswith("transformer.") for k in sd) else ""

    def arr(name):
        return jnp.asarray(np.asarray(sd[name]))

    def c1d(prefix):
        return {"weight": arr(f"{prefix}.weight"),
                "bias": arr(f"{prefix}.bias")}

    blocks = []
    for i in range(cfg.n_layer):
        b = f"{p}h.{i}"
        blocks.append({
            "ln_1": c1d(f"{b}.ln_1"),
            "attn": {"c_attn": c1d(f"{b}.attn.c_attn"),
                     "c_proj": c1d(f"{b}.attn.c_proj")},
            "ln_2": c1d(f"{b}.ln_2"),
            "mlp": {"c_fc": c1d(f"{b}.mlp.c_fc"),
                    "c_proj": c1d(f"{b}.mlp.c_proj")},
        })
    return {
        "wte": {"weight": arr(f"{p}wte.weight")},
        "wpe": {"weight": arr(f"{p}wpe.weight")},
        "h": blocks,
        "ln_f": c1d(f"{p}ln_f"),
    }
