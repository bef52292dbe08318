"""Per-shape conv microbench: gemm tap-sum vs Pallas VMEM-accumulator.

One representative conv per BigVGAN stage (B=4, 10 s geometry).  A single
conv is 1-3 ms — far below the ~28 ms tunnel dispatch noise — so each
variant is timed as the SLOPE between K_LO and K_HI chained applications
inside one jit with a tensor carry (CLAUDE.md timing rules; fixed costs
cancel).  The chain re-pads between applications so shapes stay fixed;
the pad cost rides in the slope but is equal across variants.

Usage: python scripts/profile_conv.py [k dil]   (default k=7 dil=3)
"""

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ditto_tts_tpu.nn.conv import conv1d_nlc_gemm
from ditto_tts_tpu.ops.act_conv_pallas import aa_snake_conv1d
from ditto_tts_tpu.ops.conv_pallas import conv1d_nlc_pallas
from ditto_tts_tpu.ops.snake import (polyphase_anti_aliased_activation,
                                     snake_beta)

B = 4
K_LO, K_HI = 4, 16
# (T, C) per BigVGAN stage at 10 s / hop 256
STAGES = [(3748, 768), (14992, 384), (29984, 192), (59968, 96),
          (119936, 48), (239872, 24)]


def _t(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def chain(conv_fn, reps, pad, k, dil):
    def run(x, w, bv):
        def body(_, carry):
            y = conv_fn(carry, w, bv, dilation=dil,
                        compute_dtype=jnp.bfloat16)
            return jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
        out = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(jnp.ravel(out)[-4:])
    return jax.jit(run)


def chain_act(conv_fn, reps, pad, k, dil, alpha, beta, fused):
    """act -> conv pairs (what an AMP block alternates)."""
    def run(x, w, bv):
        def body(_, carry):
            core = carry[:, pad:-pad] if pad else carry
            if fused:
                y = aa_snake_conv1d(core, alpha, beta, w, bv, dilation=dil,
                                    compute_dtype=jnp.bfloat16)
            else:
                a = polyphase_anti_aliased_activation(
                    core, lambda v: snake_beta(v, alpha, beta,
                                               channel_axis=-1),
                    time_axis=1)
                a = jnp.pad(a, ((0, 0), (pad, pad), (0, 0)))
                y = conv_fn(a, w, bv, dilation=dil,
                            compute_dtype=jnp.bfloat16)
            return jnp.pad(y, ((0, 0), (pad, pad), (0, 0)))
        out = jax.lax.fori_loop(0, reps, body, x)
        return jnp.sum(jnp.ravel(out)[-4:])
    return jax.jit(run)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 7
    dil = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    print(f"device={jax.devices()[0]} k={k} dil={dil} "
          f"slope K={K_LO}->{K_HI}", flush=True)

    rng = np.random.default_rng(0)
    stages = STAGES
    if os.environ.get("CONV_STAGES"):
        keep = {int(s) for s in os.environ["CONV_STAGES"].split(",")}
        stages = [s for s in STAGES if s[1] in keep]
    for t, c in stages:
        pad = (k * dil - dil) // 2
        x = jnp.asarray(0.1 * rng.standard_normal((B, t + 2 * pad, c)),
                        jnp.bfloat16)
        w = jnp.asarray(0.1 * rng.standard_normal((c, c, k)), jnp.float32)
        bv = jnp.asarray(rng.standard_normal(c), jnp.float32)
        flops = 2 * B * t * c * c * k
        alpha = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
        beta = jnp.asarray(0.1 * rng.standard_normal(c), jnp.float32)
        variants = [
            ("gemm", lambda: (chain(conv1d_nlc_gemm, K_LO, pad, k, dil),
                              chain(conv1d_nlc_gemm, K_HI, pad, k, dil))),
            ("pallas", lambda: (chain(conv1d_nlc_pallas, K_LO, pad, k, dil),
                                chain(conv1d_nlc_pallas, K_HI, pad, k,
                                      dil))),
            ("act+pallas", lambda: (
                chain_act(conv1d_nlc_pallas, K_LO, pad, k, dil, alpha,
                          beta, False),
                chain_act(conv1d_nlc_pallas, K_HI, pad, k, dil, alpha,
                          beta, False))),
            ("fusedAC", lambda: (
                chain_act(None, K_LO, pad, k, dil, alpha, beta, True),
                chain_act(None, K_HI, pad, k, dil, alpha, beta, True))),
        ]
        if os.environ.get("CONV_VARIANTS"):
            keep = os.environ["CONV_VARIANTS"].split(",")
            variants = [v for v in variants if v[0] in keep]
        for name, mk in variants:
            try:
                lo, hi = mk()
                float(lo(x, w, bv)); float(hi(x, w, bv))  # compile+warm
                t_lo = min(_t(lambda: float(lo(x, w, bv)))
                           for _ in range(3))
                t_hi = min(_t(lambda: float(hi(x, w, bv)))
                           for _ in range(3))
                ms = (t_hi - t_lo) / (K_HI - K_LO) * 1e3
                print(f"T={t:6d} C={c:4d} {name:7s} {ms:8.3f} ms "
                      f"{flops/(ms/1e3)/1e12:6.1f} TF/s", flush=True)
            except Exception as e:  # keep sweeping on a lowering failure
                print(f"T={t:6d} C={c:4d} {name:7s} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
