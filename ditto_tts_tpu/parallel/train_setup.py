"""Mesh wiring for training entry points: one place that knows how a DiTTO
train state shards over the (data, model) mesh.

Used by BOTH ``scripts/train_ditto.py`` (the real CLI path) and
``__graft_entry__.dryrun_multichip`` (the driver's virtual-mesh compile
check), so the dry run exercises the same sharding code the CLI runs.

Layout (see ``parallel/sharding.py`` for the megatron-style rules):
  * DiT params TP-shard over "model"; AdamW mu/nu mirror the param tree
    so they shard identically; scalar step / schedule state replicated.
  * Frozen encoders (codec, GPT2, embedding head) replicated — they are
    small and inference-only here.
  * Batches shard their leading axis over "data" (pure DP); GSPMD inserts
    the gradient all-reduce over "data" and the pair of per-block
    all-reduces over "model" (megatron pattern) on the ICI.

The reference has no counterpart (SURVEY §2.2: single device, no
distributed layer) — this is north-star config 5 machinery.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Tuple

import jax
from jax.sharding import Mesh, PartitionSpec as P

from . import sharding as shard_mod


def state_specs(state: Dict, param_specs: Any) -> Dict:
    """PartitionSpec tree for a train-step state ({params, opt_state,
    step}): the given specs on params, mirrored on AdamW mu/nu,
    everything else replicated.

    With the flat single-vector AdamW (train/steps.py make_adamw
    flat=True) mu/nu are one raveled array and cannot mirror per-param
    TP specs — they replicate instead (correct for pure DP; TP training
    should build the step with ``flat_opt=False``)."""
    adam_state = state["opt_state"][0]
    mirror = (jax.tree_util.tree_structure(adam_state.mu)
              == jax.tree_util.tree_structure(state["params"]))
    mu_specs = param_specs if mirror else P()
    opt_specs = (adam_state._replace(count=P(), mu=mu_specs,
                                     nu=mu_specs),) + tuple(
        jax.tree_util.tree_map(lambda _: P(), s)
        for s in state["opt_state"][1:])
    return {"params": param_specs, "opt_state": opt_specs, "step": P()}


def ditto_state_specs(state: Dict) -> Dict:
    """TP specs on DiT params (megatron rules), AdamW mirrored."""
    return state_specs(state, shard_mod.dit_param_specs(state["params"]))


def batch_specs(batch: Any) -> Any:
    """Shard every batch leaf's leading axis over "data"."""
    return jax.tree_util.tree_map(lambda _: P("data"), batch)


def setup_mesh_training(mesh: Mesh, state: Dict, frozen: Dict,
                        param_specs: Any = None
                        ) -> Tuple[Dict, Dict, Callable, Callable]:
    """Place state/frozen on the mesh; return (state, frozen,
    shard_state, shard_batch).

    ``param_specs`` defaults to the DiT TP rules; pass
    ``sharding.slp_param_specs(state["params"])`` for the SLP decoder or
    ``sharding.replicated_specs(...)`` for pure-DP (NAC) training.
    ``shard_state`` re-places a host-restored state (checkpoint resume)
    with the same shardings; ``shard_batch`` places one host batch with
    its leading axis split over "data".
    """
    if param_specs is None:
        specs = ditto_state_specs(state)
    else:
        specs = state_specs(state, param_specs)
    state_specs_tree = specs
    state = shard_mod.shard_tree(mesh, state, state_specs_tree)
    frozen = shard_mod.shard_tree(mesh, frozen,
                                  shard_mod.replicated_specs(frozen))

    def shard_state(s: Dict) -> Dict:
        return shard_mod.shard_tree(mesh, s, state_specs_tree)

    def shard_batch(b: Any) -> Any:
        return shard_mod.shard_tree(mesh, b, batch_specs(b))

    return state, frozen, shard_state, shard_batch
