"""Checkpointing: param/optimizer pytrees <-> .npz files, plus a torch
``.pth`` converter for reference-weight ingestion.

Capability parity with the reference checkpoint format (ref: src/utils/
Trainer.py:106-125 — dict of epoch/model/optimizer/history) with corrected
semantics and no pickle: arrays go in one compressed .npz keyed by tree
path, structure (dict keys, list indices, scalars) is reconstructed from
the keys; history/metadata ride alongside as JSON.

Multi-host: ``save_checkpoint`` is a COLLECTIVE — every process must call
it with the same state.  Leaves that are not fully addressable (sharded
across processes) are allgathered to their global value on every host
(``multihost_utils.process_allgather``); only process 0 writes the file.
Exercised by the 2-process smoke (tests/test_multihost.py) with a state
sharded across the process boundary.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import numpy as np
import jax


_SEP = "//"


def _path_str(path) -> str:
    parts = []
    for p in path:
        if hasattr(p, "key"):           # DictKey / FlattenedIndexKey
            parts.append(f"k:{p.key}")
        elif hasattr(p, "idx"):         # SequenceKey
            parts.append(f"i:{p.idx}")
        elif hasattr(p, "name"):        # GetAttrKey (NamedTuple opt states)
            parts.append(f"k:{p.name}")
        else:
            parts.append(f"k:{p}")
    return _SEP.join(parts)


def _fetch_global(leaf) -> np.ndarray:
    """Leaf -> host numpy of the GLOBAL value.

    A cross-process-sharded jax.Array is not fully addressable, so
    ``device_get`` would throw; allgather it instead (collective — every
    process reaches this call because every process saves the same tree
    in the same order)."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.experimental import multihost_utils as mu
        return np.asarray(mu.process_allgather(leaf, tiled=True))
    return np.asarray(jax.device_get(leaf))


def _flatten(tree: Any) -> Dict[str, np.ndarray]:
    return {_path_str(path): _fetch_global(leaf)
            for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]}


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
    ``path + '.json'``.

    Collective under multi-process JAX: every process must call (the
    gather of non-addressable leaves is an allgather); only process 0
    touches the filesystem."""
    flat = _flatten(state)
    if jax.process_index() != 0:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
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


def restore_into(template: Any, path: str) -> Any:
    """Path-keyed restore: load the .npz and place each stored array at the
    template leaf with the SAME tree path, casting to the template dtype.

    Unlike order-based adoption, a structural drift between save and load
    (renamed dict key, reordered optimizer state, added field) fails loudly
    with the offending paths instead of silently mis-assigning weights.
    """
    npz_path = path if path.endswith(".npz") else path + ".npz"
    with np.load(npz_path) as z:
        flat = {k: z[k] for k in z.files}

    leaves_with_paths, treedef = jax.tree_util.tree_flatten_with_path(
        template)
    tmpl_paths = [_path_str(p) for p, _ in leaves_with_paths]
    missing = [p for p in tmpl_paths if p not in flat]
    extra = sorted(set(flat) - set(tmpl_paths))
    if missing or extra:
        raise KeyError(
            f"checkpoint/template structure mismatch for {path}: "
            f"missing {missing[:5]}{'...' if len(missing) > 5 else ''} "
            f"extra {extra[:5]}{'...' if len(extra) > 5 else ''}")
    new_leaves = []
    for p, (_, tmpl_leaf) in zip(tmpl_paths, leaves_with_paths):
        arr = flat[p]
        tmpl_arr = np.asarray(tmpl_leaf)
        if arr.shape != tmpl_arr.shape:
            raise ValueError(f"shape mismatch at {p}: checkpoint "
                             f"{arr.shape} vs template {tmpl_arr.shape}")
        new_leaves.append(jax.numpy.asarray(arr, tmpl_arr.dtype))
    return treedef.unflatten(new_leaves)


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
