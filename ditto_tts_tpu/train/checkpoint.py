"""Checkpointing: param/optimizer pytrees <-> .npz files, plus a torch
``.pth`` converter for reference-weight ingestion.

Capability parity with the reference checkpoint format (ref: src/utils/
Trainer.py:106-125 — dict of epoch/model/optimizer/history) with corrected
semantics and no pickle: arrays go in one compressed .npz keyed by tree
path, structure (dict keys, list indices, scalars) is reconstructed from
the keys; history/metadata ride alongside as JSON.

Multi-host: call ``save`` only on process 0 for replicated state (the
standard JAX pattern); sharded arrays should be gathered by the caller
(small models here are fully replicated or TP-shardable on restore).
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


_SEP = "//"


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = []
        for p in path:
            if hasattr(p, "key"):
                parts.append(f"k:{p.key}")
            elif hasattr(p, "idx"):
                parts.append(f"i:{p.idx}")
            else:
                parts.append(f"k:{p}")
        flat[_SEP.join(parts)] = np.asarray(leaf)
    return flat


def _unflatten(flat: Dict[str, np.ndarray]) -> Any:
    root: Any = None

    def insert(key: str, value):
        nonlocal root
        parts = key.split(_SEP)
        if root is None:
            root = [] if parts[0].startswith("i:") else {}
        node = root
        for i, part in enumerate(parts):
            last = i == len(parts) - 1
            if part.startswith("i:"):
                idx = int(part[2:])
                while len(node) <= idx:
                    node.append(None)
                if last:
                    node[idx] = value
                else:
                    if node[idx] is None:
                        node[idx] = ([] if parts[i + 1].startswith("i:")
                                     else {})
                    node = node[idx]
            else:
                k = part[2:]
                if last:
                    node[k] = value
                else:
                    if k not in node or node[k] is None:
                        node[k] = ([] if parts[i + 1].startswith("i:")
                                   else {})
                    node = node[k]

    for key in sorted(flat):
        insert(key, flat[key])
    return root


def save_checkpoint(path: str, state: Any,
                    metadata: Optional[Dict] = None) -> None:
    """Write state pytree (+ JSON metadata) to ``path`` (.npz) and
    ``path + '.json'``."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(jax.device_get(state))
    np.savez_compressed(path if path.endswith(".npz") else path + ".npz",
                        **flat)
    if metadata is not None:
        with open(_meta_path(path), "w") as f:
            json.dump(metadata, f)


def load_checkpoint(path: str) -> Tuple[Any, Optional[Dict]]:
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as z:
        flat = {k: z[k] for k in z.files}
    meta = None
    if os.path.exists(_meta_path(path)):
        with open(_meta_path(path)) as f:
            meta = json.load(f)
    return _unflatten(flat), meta


def _meta_path(path: str) -> str:
    base = path[:-4] if path.endswith(".npz") else path
    return base + ".json"


def latest_checkpoint(checkpoint_dir: str,
                      prefix: str = "checkpoint") -> Optional[str]:
    """Highest-epoch ``{prefix}_epoch_{n}.npz`` in the directory
    (resume semantics of ref Trainer.py:73-76)."""
    if not os.path.isdir(checkpoint_dir):
        return None
    best, best_n = None, -1
    pat = re.compile(rf"{re.escape(prefix)}_epoch_(\d+)\.npz$")
    for name in os.listdir(checkpoint_dir):
        m = pat.match(name)
        if m and int(m.group(1)) > best_n:
            best_n = int(m.group(1))
            best = os.path.join(checkpoint_dir, name)
    return best


def convert_torch_checkpoint(pth_path: str) -> Dict[str, np.ndarray]:
    """Load a reference ``.pth`` (dict with model_state_dict, ref
    Trainer.py:106-114) into a flat numpy state dict for the HF importers."""
    import torch

    obj = torch.load(pth_path, map_location="cpu", weights_only=False)
    sd = obj.get("model_state_dict", obj) if isinstance(obj, dict) else obj
    return {k: v.detach().cpu().numpy() for k, v in sd.items()
            if hasattr(v, "detach")}
