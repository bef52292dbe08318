"""BigVGAN polyphase-vs-composed: numerics + timing with forced readback.

``block_until_ready`` on the tunneled backend can report misleadingly small
times; every timing here ends with a device->host readback of a scalar.
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
    out = fn(*args)
    s = float(np.asarray(out))          # forces full execution + readback
    print(f"{name:34s} compile+run {time.perf_counter() - t0:7.1f} s "
          f"(sum {s:.5f})")
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(np.asarray(fn(*args)))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:34s} {best * 1e3:9.1f} ms")
    return best


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "polyphase"
    from bench import _numpy_params

    cfg = PipelineConfig()
    v = cfg.vocoder
    key = jax.random.key(0)
    voc = jax.device_put(_numpy_params(voc_mod.init_bigvgan, key, v))

    frames = 24_000 * SECONDS // v.hop_size
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((BATCH, v.num_mels, frames)),
                      jnp.float32)

    # calibration: ~1 TFLOP fp32 matmul
    n = 4096
    a = jnp.asarray(rng.standard_normal((n, n)), jnp.float32)
    mm = jax.jit(lambda a: jnp.sum(((a @ a) @ a)[:8, :8]))
    timed_rb(f"calib 2x{n}^3 matmul (fp32)", mm, a)

    def make(impl):
        def f(p, m):
            w = voc_mod.bigvgan_forward(p, v, m, aa_impl=impl)
            return jnp.sum(jnp.abs(w))
        return jax.jit(f)

    if variant in ("polyphase", "all"):
        timed_rb("BigVGAN sum (polyphase)", make("polyphase"), voc, mel)
    if variant in ("composed", "all"):
        timed_rb("BigVGAN sum (composed)", make("composed"), voc, mel)


if __name__ == "__main__":
    main()
