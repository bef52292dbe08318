"""Break down stage 3: VQ, codec decode, mel, BigVGAN (plain vs fused snake).

Run from the repo root: ``python scripts/profile_vocoder.py``.
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
from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.codec import rvq as rvq_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.models import vocoder as voc_mod
from ditto_tts_tpu.ops.mel import get_mel_spectrogram

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = int(os.environ.get("BENCH_SECONDS", 10))
REPS = int(os.environ.get("REPS", 3))


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:40s} {best * 1e3:9.1f} ms")
    return out, best


def main():
    from bench import _numpy_params

    cfg = PipelineConfig()
    key = jax.random.key(0)
    codec = jax.device_put(_numpy_params(codec_mod.init_codec, key, cfg.codec))
    nac_tr = _numpy_params(nac_mod.init_nac_trainable, key, cfg.nac)
    vq = jax.device_put(nac_tr["vector_quantizer"])
    voc = jax.device_put(_numpy_params(voc_mod.init_bigvgan, key, cfg.vocoder))

    L = 24_000 * SECONDS
    T = L // cfg.codec.hop_length  # 750
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((BATCH, T, 768)), jnp.float32)
    wav = jnp.asarray(0.05 * rng.standard_normal((BATCH, L)), jnp.float32)

    v = cfg.vocoder

    def mel_fn(w):
        return get_mel_spectrogram(
            w, sample_rate=v.sampling_rate, n_fft=v.n_fft,
            num_mels=v.num_mels, hop=v.hop_size, win_size=v.win_size,
            fmin=v.fmin, fmax=v.fmax)

    def vq_fn(lat):
        stacked = jnp.repeat(lat[:, None], 2, axis=1)
        return rvq_mod.vq_indices(vq, stacked)

    idx, _ = timed("VQ argmin", jax.jit(vq_fn), latents)
    dec = jax.jit(lambda i: codec_mod.codec_decode(codec, cfg.codec, i,
                                                   output_length=L))
    _, _ = timed("codec decode (SEANet+LSTM)", dec, idx)
    mel, _ = timed("mel (GEMM DFT)", jax.jit(mel_fn), wav)
    print(f"  mel shape: {mel.shape}")
    _, _ = timed("BigVGAN (plain snake)",
                 jax.jit(lambda m: voc_mod.bigvgan_forward(voc, v, m)), mel)
    _, _ = timed("BigVGAN (fused Pallas snake)",
                 jax.jit(lambda m: voc_mod.bigvgan_forward(voc, v, m,
                                                           fused=True)), mel)
    naa = v.replace(use_anti_aliasing=False)
    _, _ = timed("BigVGAN (no anti-aliasing)",
                 jax.jit(lambda m: voc_mod.bigvgan_forward(voc, naa, m)), mel)


if __name__ == "__main__":
    main()
