"""Decompose BigVGAN vocoder time on the TPU: conv vs activation vs stage.

bench.py's breakdown shows the vocoder at ~0.70 s for a B=4/10 s batch
(5% MFU) — the dominant pipeline stage. This script times, with the
slope method (see profile_attention.py):

  * full forward (polyphase / composed / no-anti-aliasing)
  * activation ablation (identity activation -> pure conv stack cost)
  * prefix-of-stages cost (which upsample level dominates)

Run from repo root: timeout 580 python scripts/profile_vocoder_stages.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.core.config import VocoderConfig
from ditto_tts_tpu.models import vocoder as voc
from ditto_tts_tpu.ops import snake as snake_mod

B, T = 4, 938  # 10 s at hop 256


def slope_ms(fn, mel, reps=(2, 6)):
    res = {}
    for k in reps:
        @jax.jit
        def many(m, k=k):
            def body(i, m):
                o = fn(m)
                # tensor carry: fold a summary of the output back into mel
                return m + jnp.mean(o).astype(m.dtype) * 1e-9
            out = jax.lax.fori_loop(0, k, body, m)
            return jnp.sum(out[..., -1])
        float(many(mel))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(mel))
            ts.append(time.perf_counter() - t0)
        res[k] = min(ts)
    return (res[reps[1]] - res[reps[0]]) / (reps[1] - reps[0]) * 1e3


def main():
    print("device:", jax.devices()[0])
    cfg = VocoderConfig()
    params = jax.device_put(voc.init_bigvgan(jax.random.key(0), cfg))
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((B, cfg.num_mels, T)), jnp.float32)

    print(f"{'polyphase (default)':28s} "
          f"{slope_ms(lambda m: voc.bigvgan_forward(params, cfg, m), mel):9.2f} ms/call")
    print(f"{'composed':28s} "
          f"{slope_ms(lambda m: voc.bigvgan_forward(params, cfg, m, aa_impl='composed'), mel):9.2f} ms/call")
    noaa = cfg.replace(use_anti_aliasing=False)
    print(f"{'no anti-aliasing':28s} "
          f"{slope_ms(lambda m: voc.bigvgan_forward(params, noaa, m), mel):9.2f} ms/call")

    orig = snake_mod.snake_beta
    snake_mod.snake_beta = lambda x, a, b, logscale=True: x
    try:
        print(f"{'identity act (convs only)':28s} "
              f"{slope_ms(lambda m: voc.bigvgan_forward(params, noaa, m), mel):9.2f} ms/call")
    finally:
        snake_mod.snake_beta = orig

    for k in range(1, len(cfg.upsample_rates) + 1):
        sub = cfg.replace(
            upsample_rates=cfg.upsample_rates[:k],
            upsample_kernel_sizes=cfg.upsample_kernel_sizes[:k])
        subp = dict(params)
        subp["ups"] = params["ups"][:k]
        subp["resblocks"] = params["resblocks"][:k]
        ch = cfg.upsample_initial_channel // (2 ** k)
        subp["act_post"] = {"alpha": jnp.zeros((ch,)),
                            "beta": jnp.zeros((ch,))}
        subp["conv_post"] = {"weight": 0.01 * jnp.ones((1, ch, 7))}
        ms = slope_ms(lambda m, sub=sub, subp=subp:
                      voc.bigvgan_forward(subp, sub, m), mel)
        print(f"stages[0:{k}]                  {ms:9.2f} ms/call")


if __name__ == "__main__":
    main()
