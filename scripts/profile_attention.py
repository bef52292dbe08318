"""Microbenchmark attention variants on the TPU (slope method).

Timing on the tunneled single-chip backend is tricky: per-dispatch latency
is ~25 ms, ``block_until_ready`` can return before execution finishes, and
a device while-loop carries ~0.1 ms/iteration overhead. So each variant is
measured as the SLOPE between K=8 and K=40 chained calls inside one jit,
with a scalar readback forcing real completion — fixed costs cancel.

Run from repo root: timeout 580 python scripts/profile_attention.py
"""
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.ops.attention import (pallas_attention,
                                         pallas_attention_packed,
                                         sdpa_reference)

SHAPES = [(4, 12, 750, 64), (4, 12, 1024, 64), (4, 12, 1536, 64)]


def slope_ms(fn, q, k, v):
    res = {}
    for reps in (8, 40):
        @jax.jit
        def many(q, k, v, reps=reps):
            def body(i, qq):
                o = fn(qq, k, v)
                return qq * 0.5 + o.astype(qq.dtype) * 0.5
            out = jax.lax.fori_loop(0, reps, body, q)
            return jnp.sum(out[..., -1])  # scalar readback = real completion

        float(many(q, k, v))  # compile + warm
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            float(many(q, k, v))
            ts.append(time.perf_counter() - t0)
        res[reps] = min(ts)
    return (res[40] - res[8]) / 32 * 1e3


def main():
    print("device:", jax.devices()[0])
    rng = np.random.default_rng(0)
    for (B, H, S, D) in SHAPES:
        q, k, v = (jnp.asarray(rng.standard_normal((B, H, S, D)),
                               jnp.bfloat16) for _ in range(3))
        fl = 2 * 2 * B * H * S * S * D
        print(f"--- B={B} H={H} S={S} D={D} ({fl/1e9:.1f} GFLOP)")
        for name, fn in (
                ("xla sdpa", sdpa_reference),
                ("pallas pad128", pallas_attention),
                ("pallas packed", pallas_attention_packed)):
            ms = slope_ms(fn, q, k, v)
            print(f"  {name:20s} {ms:8.4f} ms/call  "
                  f"{fl/(ms*1e-3)/1e12:7.2f} TFLOP/s")


if __name__ == "__main__":
    main()
