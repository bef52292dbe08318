"""Per-stage TPU timing for the synthesis pipeline.

Times (steady-state, block_until_ready):
  1. codec encode -> prompt latents
  2. K-step DiT reverse diffusion (fp32 and bf16 block compute)
  3. latents -> waveform (VQ + codec decode + mel + BigVGAN)

Run from the repo root: ``python scripts/profile_stages.py``.
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

from ditto_tts_tpu.core.config import DiTConfig, PipelineConfig, SamplerConfig
from ditto_tts_tpu.infer import generator as gen_mod
from ditto_tts_tpu.diffusion.sampler import ddpm_sample, respaced_timesteps
from ditto_tts_tpu.diffusion.schedule import NoiseSchedule
from ditto_tts_tpu.models import dit as dit_mod

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = int(os.environ.get("BENCH_SECONDS", 10))
STEPS = int(os.environ.get("BENCH_STEPS", 50))
REPS = int(os.environ.get("REPS", 3))


def timed(name, fn, *args):
    out = jax.block_until_ready(fn(*args))
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        out = jax.block_until_ready(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:36s} {best * 1e3:9.1f} ms")
    return out, best


def main():
    from bench import _numpy_params  # reuse fast init
    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.models import vocoder as voc_mod
    from ditto_tts_tpu.text import gpt2 as gpt2_mod

    cfg = PipelineConfig(sampler=SamplerConfig(num_steps=STEPS),
                         dit=DiTConfig(num_layers=12, num_heads=12,
                                       scan_blocks=True))
    key = jax.random.key(0)
    params = gen_mod.GeneratorParams(
        dit=_numpy_params(dit_mod.init_ditto, key, cfg.dit),
        codec=_numpy_params(codec_mod.init_codec, key, cfg.codec),
        gpt2=_numpy_params(gpt2_mod.init_gpt2, key, gpt2_mod.GPT2Config()),
        embedding_head=_numpy_params(
            nac_mod.init_nac_trainable, key, cfg.nac)["embedding_head"],
        vector_quantizer=_numpy_params(
            nac_mod.init_nac_trainable, key, cfg.nac)["vector_quantizer"],
        vocoder=_numpy_params(voc_mod.init_bigvgan, key, cfg.vocoder))
    params = jax.device_put(params, jax.devices()[0])

    L = 24_000 * SECONDS
    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.05 * rng.standard_normal((BATCH, 1, L)), jnp.float32)
    mask = jnp.ones((BATCH, L), jnp.int32)
    text_ids = jnp.zeros((BATCH, 64), jnp.int32)

    # stage 1: encode
    enc = jax.jit(lambda p, a, m: gen_mod.encode_prompt_latents(p, cfg, a, m))
    latents, t_enc = timed("codec encode -> latents", enc, params, audio, mask)
    T = latents.shape[1]
    print(f"  latent frames: {T}")

    # stage 2: sampler, fp32 vs bf16 block compute
    schedule = NoiseSchedule.cosine(cfg.dit.diffusion_steps)
    taus = respaced_timesteps(cfg.dit.diffusion_steps, STEPS)
    text_emb = jax.jit(
        lambda p, ids: gpt2_mod.embed_tokens(p.gpt2, ids))(params, text_ids)

    t_samp = {}
    for dt in ("float32", "bfloat16"):
        dcfg = cfg.dit.replace(compute_dtype=dt)

        def run(p, x0, temb, k, dcfg=dcfg):
            def model_fn(x, t):
                return dit_mod.ditto_forward(p.dit, dcfg, x, temb, t)
            return ddpm_sample(model_fn, k, x0, schedule, taus)

        x0 = jax.random.normal(jax.random.key(1), latents.shape)
        _, t_samp[dt] = timed(f"{STEPS}-step DiT sampler ({dt})",
                              jax.jit(run), params, x0, text_emb,
                              jax.random.key(2))

    # stage 3: decode + vocoder
    dec = jax.jit(lambda p, lat: gen_mod.latents_to_waveform(
        p, cfg, lat, output_length=L))
    _, t_dec = timed("VQ + codec decode + mel + BigVGAN", dec, params, latents)

    total32 = t_enc + t_samp["float32"] + t_dec
    total16 = t_enc + t_samp["bfloat16"] + t_dec
    aud = BATCH * SECONDS
    print(f"\naudio-s/s/chip  fp32-DiT: {aud / total32:7.2f}   "
          f"bf16-DiT: {aud / total16:7.2f}")


if __name__ == "__main__":
    main()
