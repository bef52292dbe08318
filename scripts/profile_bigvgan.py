"""Time BigVGAN variants on TPU, one per run (tunneled remote_compile
rejects the huge plain-snake standalone HLO with HTTP 413, so each variant
is guarded).

Run from the repo root: ``python -u scripts/profile_bigvgan.py [variant]``
with variant in {fused, plain, noaa, all}.
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


def timed(name, fn, *args):
    t0 = time.perf_counter()
    out = jax.block_until_ready(fn(*args))
    print(f"{name:36s} compile+run {time.perf_counter() - t0:7.1f} s")
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best * 1e3:9.1f} ms")
    return out, best


def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "fused"
    from bench import _numpy_params

    cfg = PipelineConfig()
    v = cfg.vocoder
    key = jax.random.key(0)
    voc = jax.device_put(_numpy_params(voc_mod.init_bigvgan, key, v))

    frames = 24_000 * SECONDS // v.hop_size
    rng = np.random.default_rng(0)
    mel = jnp.asarray(rng.standard_normal((BATCH, v.num_mels, frames)),
                      jnp.float32)

    # params are always jit ARGUMENTS: closed-over device arrays embed as
    # HLO constants, and the ~450MB of BigVGAN weights then blow the
    # tunneled remote_compile request limit (HTTP 413) or stall the upload.
    impls = {"fused": "fused_pallas", "polyphase": "polyphase",
             "plain": "composed"}
    for name in (impls if variant == "all" else [variant]):
        if name == "noaa":
            continue
        impl = impls[name]
        fn = jax.jit(lambda p, m, impl=impl: voc_mod.bigvgan_forward(
            p, v, m, aa_impl=impl))
        timed(f"BigVGAN ({name})", fn, voc, mel)
    if variant in ("noaa", "all"):
        naa = v.replace(use_anti_aliasing=False)
        fn = jax.jit(lambda p, m: voc_mod.bigvgan_forward(p, naa, m))
        timed("BigVGAN (no anti-aliasing)", fn, voc, mel)


if __name__ == "__main__":
    main()
