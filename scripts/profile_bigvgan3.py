"""BigVGAN-only timing: no-AA vs polyphase AA, params passed as args.

(Closing over params in the jitted lambda bakes ~50 MB of weights into the
HLO as constants and the tunnel's remote-compile endpoint rejects the body
with HTTP 413 — always pass params as arguments.)

Readback-forced timings; run from repo root.
"""

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

from ditto_tts_tpu.core.config import PipelineConfig
from ditto_tts_tpu.models import vocoder as voc_mod

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = int(os.environ.get("BENCH_SECONDS", 10))
REPS = int(os.environ.get("REPS", 3))


def timed_rb(name, fn, *args):
    t0 = time.perf_counter()
    s = float(fn(*args))
    print(f"{name:42s} compile {time.perf_counter() - t0:6.1f} s", flush=True)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best * 1e3:9.1f} ms   (sum {s:.4f})", flush=True)
    return best


def main():
    from bench import _numpy_params

    cfg = PipelineConfig()
    v = cfg.vocoder
    key = jax.random.key(0)
    voc = jax.device_put(_numpy_params(voc_mod.init_bigvgan, key, v))

    frames = 24_000 * SECONDS // v.hop_size
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((BATCH, v.num_mels, frames)),
                      jnp.float32)

    variants = [
        ("no anti-aliasing (plain snakebeta)",
         v.replace(use_anti_aliasing=False)),
        ("polyphase AA (current default)", v.replace(aa_impl="polyphase")),
        ("composed AA (up/snake/down)", v.replace(aa_impl="composed")),
    ]
    for name, vc in variants:
        def fn(p, m, vc=vc):
            y = voc_mod.bigvgan_forward(p, vc, m)
            return jnp.sum(jnp.abs(y[..., : 256]))
        timed_rb(name, jax.jit(fn), voc, mel)


if __name__ == "__main__":
    main()
