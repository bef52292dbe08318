"""Tracing/profiling utilities (SURVEY §5.1 — the reference has none).

Thin wrappers over ``jax.profiler``: named trace annotations visible in
TensorBoard/XProf traces, a trace-dump context manager, and a determinism
checker (same key => identical outputs; SURVEY §5.2's substitute for race
detection on an SPMD runtime).
"""

from __future__ import annotations

import contextlib
from typing import Any, Callable

import numpy as np
import jax


annotate = jax.profiler.TraceAnnotation  # with annotate("train_step"): ...


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace into ``log_dir`` (TensorBoard-compatible)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def check_determinism(fn: Callable[..., Any], *args, runs: int = 2) -> bool:
    """True iff ``fn(*args)`` produces bit-identical pytrees across runs."""
    first = jax.device_get(jax.block_until_ready(fn(*args)))
    for _ in range(runs - 1):
        again = jax.device_get(jax.block_until_ready(fn(*args)))
        leaves_a = jax.tree_util.tree_leaves(first)
        leaves_b = jax.tree_util.tree_leaves(again)
        for a, b in zip(leaves_a, leaves_b):
            if not np.array_equal(np.asarray(a), np.asarray(b)):
                return False
    return True
