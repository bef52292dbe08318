"""Throughput/latency harness: audio-seconds synthesized per second per chip.

The reference publishes no throughput numbers (BASELINE.md); this harness
establishes them. Methodology: jit once, warm up (compile excluded), then
min-of-N wall-clock with ``block_until_ready`` — the standard JAX timing
discipline (async dispatch means un-blocked timing measures nothing).
"""

from __future__ import annotations

import time
from typing import Callable, Dict

import jax


def time_fn(fn: Callable, *args, iters: int = 3, warmup: int = 1) -> float:
    """Min wall-clock seconds over ``iters`` after ``warmup`` calls."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def synthesis_throughput(fn: Callable, args, *, batch: int,
                         utterance_seconds: float,
                         iters: int = 3) -> Dict[str, float]:
    """Returns audio-seconds/s/chip + latency for a jitted synthesize fn."""
    dt = time_fn(fn, *args, iters=iters)
    n_chips = max(jax.device_count(), 1)
    return {
        "seconds_per_batch": dt,
        "audio_seconds_per_second": batch * utterance_seconds / dt,
        "audio_seconds_per_second_per_chip":
            batch * utterance_seconds / dt / n_chips,
        "rtf": dt / (batch * utterance_seconds),  # real-time factor (lower=better)
    }


def train_step_throughput(step_fn: Callable, state, frozen, batch, key, *,
                          batch_size: int, utterance_seconds: float,
                          iters: int = 3) -> Dict[str, float]:
    """Audio-seconds of training data consumed per second per chip."""
    # functional step: state is re-fed, so timing iterations are stable
    def run():
        return step_fn(state, frozen, batch, key)

    jax.block_until_ready(run())
    best = float("inf")
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(run())
        best = min(best, time.perf_counter() - t0)
    n_chips = max(jax.device_count(), 1)
    return {
        "seconds_per_step": best,
        "audio_seconds_per_second_per_chip":
            batch_size * utterance_seconds / best / n_chips,
    }
