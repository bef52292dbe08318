"""Micro-benchmark: conv1d formulations on BigVGAN-shaped workloads.

The tunneled single-chip backend has ~22 ms per-dispatch latency, so each
variant runs ITERS times inside ONE jit region (a lax.scan with a real data
dependency, output re-padded to the input length so shapes are static and
XLA cannot hoist the conv out of the loop). Reported per-iteration time
subtracts the measured empty-dispatch floor.

Variants (all bf16 operands, fp32 accumulation, transposes in-region):
  nch   — lax.conv_general_dilated, NCH/OIH (current nn/conv.py path)
  nhc   — lax.conv_general_dilated, NHC/HIO (feature-minor, XLA-preferred)
  gemm  — shifted-matmul in time-major layout:
          y[b,t,o] = sum_kappa x[b, t+kappa*d, :] @ W_kappa
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

B = 4
ITERS = 10
SHAPES = [
    (768, 3752, 3, 1), (768, 3752, 7, 3), (768, 3752, 11, 5),
    (384, 15008, 3, 1), (384, 15008, 7, 3), (384, 15008, 11, 5),
    (192, 30016, 7, 3),
    (96, 60032, 7, 3),
    (48, 120064, 7, 3),
    (24, 240128, 7, 3),
]
CDT = jnp.bfloat16


def body_nch(x, w, d):
    return jax.lax.conv_general_dilated(
        x.astype(CDT), w.astype(CDT), window_strides=(1,), padding="VALID",
        rhs_dilation=(d,), dimension_numbers=("NCH", "OIH", "NCH"),
        preferred_element_type=jnp.float32)


def body_nhc(x, w, d):
    # x arrives [B, C, L]; transpose costs included
    xt = x.transpose(0, 2, 1).astype(CDT)
    wt = w.transpose(2, 1, 0).astype(CDT)
    y = jax.lax.conv_general_dilated(
        xt, wt, window_strides=(1,), padding="VALID", rhs_dilation=(d,),
        dimension_numbers=("NHC", "HIO", "NHC"),
        preferred_element_type=jnp.float32)
    return y.transpose(0, 2, 1)


def body_gemm(x, w, d):
    k = w.shape[-1]
    lout = x.shape[-1] - (k - 1) * d
    xt = x.transpose(0, 2, 1).astype(CDT)
    acc = None
    for kap in range(k):
        xs = jax.lax.dynamic_slice_in_dim(xt, kap * d, lout, axis=1)
        part = jnp.einsum("btc,co->bto", xs, w[:, :, kap].T.astype(CDT),
                          preferred_element_type=jnp.float32)
        acc = part if acc is None else acc + part
    return acc.transpose(0, 2, 1)


def make_loop(body, w, d, pad):
    def step(x, _):
        y = body(x, w, d)
        y = jnp.pad(y, ((0, 0), (0, 0), (0, pad)))
        # cheap nonlinearity keeps a data dependency without changing scale
        return y * 0.999 + 1e-6, None

    def loop(x):
        x, _ = jax.lax.scan(step, x, None, length=ITERS)
        return jnp.sum(x[..., :8])

    return loop


def timed(fn, x, reps=4):
    f = jax.jit(fn)
    float(f(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(f(x))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    rng = np.random.default_rng(0)
    # dispatch floor: trivial jit call
    floor = timed(lambda x: jnp.sum(x[..., :8]) * 1.0,
                  jnp.ones((8, 8), jnp.float32))
    print(f"dispatch floor: {floor*1e3:.1f} ms  (ITERS={ITERS})")
    print(f"{'C':>5} {'L':>7} {'k':>3} {'d':>2} | "
          f"{'nch ms':>8} {'nhc ms':>8} {'gemm ms':>8} | best TFLOP/s")
    tot = {"nch": 0.0, "nhc": 0.0, "gemm": 0.0}
    for C, L, k, d in SHAPES:
        pad = (k - 1) * d
        x = jnp.asarray(rng.standard_normal((B, C, L + pad)), jnp.float32)
        w = jnp.asarray(0.02 * rng.standard_normal((C, C, k)), jnp.float32)
        t = {}
        for name, body in (("nch", body_nch), ("nhc", body_nhc),
                           ("gemm", body_gemm)):
            tt = (timed(make_loop(body, w, d, pad), x) - floor) / ITERS
            t[name] = max(tt, 1e-9)
            tot[name] += t[name]
        fl = 2 * B * C * C * L * k
        best = min(t.values())
        print(f"{C:>5} {L:>7} {k:>3} {d:>2} | "
              f"{t['nch']*1e3:8.2f} {t['nhc']*1e3:8.2f} {t['gemm']*1e3:8.2f}"
              f" | {fl/best/1e12:8.2f}")
    print(f"\nper-iter totals: nch {tot['nch']*1e3:.1f} ms  "
          f"nhc {tot['nhc']*1e3:.1f} ms  gemm {tot['gemm']*1e3:.1f} ms")


if __name__ == "__main__":
    main()
