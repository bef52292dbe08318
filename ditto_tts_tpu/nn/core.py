"""Functional NN primitives.

Params are plain pytrees (nested dicts of jnp arrays): trivially shardable
with ``NamedSharding``, trivially serializable, and trivially mappable onto
HF safetensors checkpoints. Each module is a pair (init, apply); the light
``Module`` classes below just bundle the two with a static config.

Numerical conventions match the PyTorch defaults the reference relies on:
  * Linear: ``y = x @ W.T + b`` with W of shape [out, in] (torch layout, so
    HF checkpoints load without transposition mistakes).
  * LayerNorm: biased variance (1/N), eps inside the sqrt, affine optional —
    matches torch.nn.LayerNorm semantics used throughout the reference
    (ref: src/components/DiT.py:82,88,93 and GlobalAdaLN at DiT.py:23).
  * Embedding: table lookup, table shape [num, dim].
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# initializers (match torch defaults so random-init comparisons are sane)
# ---------------------------------------------------------------------------

def kaiming_uniform(key, shape, fan_in, a=math.sqrt(5), dtype=jnp.float32):
    """torch.nn.Linear default weight init."""
    gain = math.sqrt(2.0 / (1.0 + a * a))
    bound = gain * math.sqrt(3.0 / fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def uniform_fan_in(key, shape, fan_in, dtype=jnp.float32):
    """torch.nn.Linear default bias init."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def xavier_uniform(key, shape, fan_in, fan_out, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def normal(key, shape, std=1.0, dtype=jnp.float32):
    return std * jax.random.normal(key, shape, dtype)


# ---------------------------------------------------------------------------
# pure apply functions
# ---------------------------------------------------------------------------

def dense(params, x, *, precision=None):
    """``x @ W.T + b`` with torch-layout W [out, in]."""
    w = params["weight"]
    y = jax.lax.dot_general(
        x, w,
        dimension_numbers=(((x.ndim - 1,), (1,)), ((), ())),
        precision=precision,
        preferred_element_type=jnp.float32,
    ).astype(x.dtype)
    b = params.get("bias")
    if b is not None:
        y = y + b
    return y


def layer_norm(params, x, *, eps=1e-5, dtype=jnp.float32):
    """torch.nn.LayerNorm over the last axis; stats in fp32."""
    xf = x.astype(dtype)
    mean = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(xf - mean), axis=-1, keepdims=True)
    y = (xf - mean) * jax.lax.rsqrt(var + eps)
    if params and "weight" in params:
        y = y * params["weight"] + params["bias"]
    return y.astype(x.dtype)


def embed(params, ids):
    return jnp.take(params["weight"], ids, axis=0)


# ---------------------------------------------------------------------------
# module bundles
# ---------------------------------------------------------------------------

@dataclasses.dataclass(frozen=True)
class Linear:
    in_features: int
    out_features: int
    use_bias: bool = True

    def init(self, key, dtype=jnp.float32):
        kw, kb = jax.random.split(key)
        p = {"weight": kaiming_uniform(
            kw, (self.out_features, self.in_features), self.in_features,
            dtype=dtype)}
        if self.use_bias:
            p["bias"] = uniform_fan_in(
                kb, (self.out_features,), self.in_features, dtype=dtype)
        return p

    def apply(self, params, x):
        return dense(params, x)


@dataclasses.dataclass(frozen=True)
class LayerNorm:
    dim: int
    eps: float = 1e-5
    affine: bool = True

    def init(self, key, dtype=jnp.float32):
        del key
        if not self.affine:
            return {}
        return {"weight": jnp.ones((self.dim,), dtype),
                "bias": jnp.zeros((self.dim,), dtype)}

    def apply(self, params, x):
        return layer_norm(params, x, eps=self.eps)


@dataclasses.dataclass(frozen=True)
class Embedding:
    num_embeddings: int
    features: int

    def init(self, key, dtype=jnp.float32):
        # torch.nn.Embedding default: N(0, 1)
        return {"weight": normal(key, (self.num_embeddings, self.features),
                                 dtype=dtype)}

    def apply(self, params, ids):
        return embed(params, ids)


def count_params(tree) -> int:
    return sum(int(x.size) for x in jax.tree_util.tree_leaves(tree))
