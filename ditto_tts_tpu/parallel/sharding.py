"""Sharding rules: map param-pytree paths to PartitionSpecs.

Tensor-parallel layout for the DiT (megatron-style pairs, so each block
needs one all-reduce per attention and one per MLP, inserted automatically
by GSPMD over the ICI ring):

  in_proj (row-parallel out features)  ->  out_proj (col-parallel in)
  mlp_fc1/gate (row-parallel)          ->  mlp_fc2 (col-parallel)

GPT2's HF-layout ([in, out]) matmuls get the transposed specs. Embedding
tables, norms, biases of col-parallel layers, and everything small stays
replicated. The batch axis shards over "data"; gradients of replicated
params are all-reduced over "data" by GSPMD (the DP gradient psum).
"""

from __future__ import annotations

import re
from typing import Any

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# (path regex, spec) — first match wins. Paths look like
# "blocks/3/attn/in_proj_weight".
_DIT_RULES = [
    (r"attn/in_proj_weight$", P("model", None)),
    (r"attn/in_proj_bias$", P("model")),
    (r"attn/out_proj/weight$", P(None, "model")),
    (r"attn/out_proj/bias$", P()),
    (r"(mlp_fc1|gate)/weight$", P("model", None)),
    (r"(mlp_fc1|gate)/bias$", P("model")),
    (r"mlp_fc2/weight$", P(None, "model")),
    (r"mlp_fc2/bias$", P()),
]

# SLP duration-predictor decoder (nn/transformer.py layout): same
# megatron pairing — qkv in_proj row-parallel -> out_proj col-parallel,
# linear1 row-parallel -> linear2 col-parallel; embedding head, 11-class
# length predictor and norms replicated (tiny).
_SLP_RULES = [
    (r"(self_attn|cross_attn)/in_proj_weight$", P("model", None)),
    (r"(self_attn|cross_attn)/in_proj_bias$", P("model")),
    (r"out_proj/weight$", P(None, "model")),
    (r"out_proj/bias$", P()),
    (r"linear1/weight$", P("model", None)),
    (r"linear1/bias$", P("model")),
    (r"linear2/weight$", P(None, "model")),
    (r"linear2/bias$", P()),
]

_GPT2_RULES = [
    (r"c_attn/weight$", P(None, "model")),
    (r"c_attn/bias$", P("model")),
    (r"attn/c_proj/weight$", P("model", None)),
    (r"mlp/c_fc/weight$", P(None, "model")),
    (r"mlp/c_fc/bias$", P("model")),
    (r"mlp/c_proj/weight$", P("model", None)),
]


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):
            parts.append(str(p.key))
        elif hasattr(p, "idx"):
            parts.append(str(p.idx))
        else:
            parts.append(str(p))
    return "/".join(parts)


def spec_for_path(path: str, rules) -> P:
    for pat, spec in rules:
        if re.search(pat, path):
            return spec
    return P()


def tree_specs(params: Any, rules) -> Any:
    """PartitionSpec pytree matching ``params`` structure."""
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: spec_for_path(_path_str(path), rules), params)


def dit_param_specs(params: Any) -> Any:
    return tree_specs(params, _DIT_RULES)


def gpt2_param_specs(params: Any) -> Any:
    return tree_specs(params, _GPT2_RULES)


def slp_param_specs(params: Any) -> Any:
    return tree_specs(params, _SLP_RULES)


def replicated_specs(params: Any) -> Any:
    return jax.tree_util.tree_map(lambda _: P(), params)


def shard_tree(mesh: Mesh, params: Any, specs: Any) -> Any:
    """device_put each leaf with its NamedSharding."""
    return jax.tree_util.tree_map(
        lambda leaf, spec: jax.device_put(leaf, NamedSharding(mesh, spec)),
        params, specs)
