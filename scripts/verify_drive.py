"""Verify-skill driver: run the e2e synthesis pipeline on the real TPU.

Checks: wav finite + in [-1,1]; determinism (same key => identical);
steady-state audio-seconds/s/chip on the 2nd call with an honest scalar
readback fence.
"""
import sys, os, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np, jax, jax.numpy as jnp
from ditto_tts_tpu.core.config import PipelineConfig, SamplerConfig, DiTConfig
from ditto_tts_tpu.infer.generator import GeneratorParams, build_synthesize
from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.models import dit as dit_mod, nac as nac_mod, vocoder as voc_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod

cfg = PipelineConfig(sampler=SamplerConfig(num_steps=50),
                     dit=DiTConfig(num_layers=12, num_heads=12))
with jax.default_device(jax.devices("cpu")[0]):
    keys = jax.random.split(jax.random.key(0), 5)
    nac_tr = nac_mod.init_nac_trainable(keys[3], cfg.nac)
    params = GeneratorParams(
        dit=dit_mod.init_ditto(keys[0], cfg.dit),
        codec=codec_mod.init_codec(keys[1], cfg.codec),
        gpt2=gpt2_mod.init_gpt2(keys[2], gpt2_mod.GPT2Config()),
        embedding_head=nac_tr["embedding_head"],
        vector_quantizer=nac_tr["vector_quantizer"],
        vocoder=voc_mod.init_bigvgan(keys[4], cfg.vocoder))
params = jax.device_put(params, jax.devices()[0])
print("params on device", flush=True)

L = 24000 * 2
audio = jnp.asarray(0.05*np.random.default_rng(0).standard_normal((1,1,L)), jnp.float32)
fn = jax.jit(build_synthesize(cfg))
t0 = time.time()
wav = fn(params, audio, jnp.ones((1,L), jnp.int32),
         jnp.zeros((1,32), jnp.int32), jax.random.key(7))
fence = float(jnp.sum(wav[..., -1]))
print(f"compile+run: {time.time()-t0:.1f}s fence={fence}", flush=True)

t0 = time.time()
wav2 = fn(params, audio, jnp.ones((1,L), jnp.int32),
          jnp.zeros((1,32), jnp.int32), jax.random.key(7))
f2 = float(jnp.sum(wav2[..., -1]))
dt = time.time() - t0
w = np.asarray(wav)
print(f"steady: {dt:.3f}s -> {2.0/dt:.1f} audio-s/s/chip")
print("finite:", bool(np.isfinite(w).all()), "range:", float(w.min()), float(w.max()))
print("deterministic:", bool((np.asarray(wav2) == w).all()))
