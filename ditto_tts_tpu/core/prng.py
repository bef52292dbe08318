"""PRNG discipline.

Every stochastic site takes an explicit ``jax.random`` key. Helpers here keep
key-splitting structured (named streams instead of positional splits) so that
adding a new random site never silently changes another site's stream —
a prerequisite for the determinism tests (same key => identical outputs) and
for reproducible multi-host training (key folded by host id / step).
"""

from __future__ import annotations

from typing import Dict, Iterable

import jax


def split_named(key: jax.Array, names: Iterable[str]) -> Dict[str, jax.Array]:
    """Split ``key`` into one independent key per name.

    Uses ``fold_in`` on a stable hash of each name, so streams are insensitive
    to the order in which names are listed.
    """
    return {name: jax.random.fold_in(key, _stable_hash(name)) for name in names}


def for_step(key: jax.Array, step) -> jax.Array:
    """Per-training-step key: deterministic in (base key, step)."""
    return jax.random.fold_in(key, step)


def for_host(key: jax.Array, process_index: int) -> jax.Array:
    """Per-host data-loading key (model-side keys must NOT use this)."""
    return jax.random.fold_in(key, 0x9E3779B9 ^ process_index)


def _stable_hash(name: str) -> int:
    # FNV-1a 32-bit — stable across processes (unlike builtin hash()).
    h = 0x811C9DC5
    for b in name.encode("utf-8"):
        h = ((h ^ b) * 0x01000193) & 0xFFFFFFFF
    return h
