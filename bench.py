"""Official benchmark: audio-seconds synthesized / s / chip.

Runs the flagship end-to-end pipeline (50-step DiT-base denoise + VQ +
codec decode + mel + BigVGAN) on the attached TPU chip and prints ONE JSON
line. ``vs_baseline`` is the real-time factor (1.0 == synthesizing audio
exactly as fast as it plays; the reference publishes no throughput numbers,
BASELINE.md, so real-time is the natural fixed baseline).

Weights are random (no network access for pretrained checkpoints); the
compute graph is identical to the trained model's, so throughput is
representative.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from ditto_tts_tpu.core.config import DiTConfig, PipelineConfig, SamplerConfig
from ditto_tts_tpu.infer.generator import GeneratorParams, build_synthesize
from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.models import vocoder as voc_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = int(os.environ.get("BENCH_SECONDS", 10))
STEPS = int(os.environ.get("BENCH_STEPS", 50))


def _numpy_params(init_fn, key, cfg):
    """Fast random init: eval_shape for structure, numpy for values."""
    shapes = jax.eval_shape(lambda k: init_fn(k, cfg), key)
    rng = np.random.default_rng(0)

    def fill(sd):
        return jnp.asarray(
            (0.02 * rng.standard_normal(sd.shape)).astype(sd.dtype))

    return jax.tree_util.tree_map(fill, shapes)


def main():
    cfg = PipelineConfig(sampler=SamplerConfig(num_steps=STEPS),
                         dit=DiTConfig(num_layers=12, num_heads=12,
                                       scan_blocks=True,
                                       compute_dtype="bfloat16"))
    key = jax.random.key(0)
    t0 = time.time()
    nac_tr = _numpy_params(nac_mod.init_nac_trainable, key, cfg.nac)
    params = GeneratorParams(
        dit=_numpy_params(dit_mod.init_ditto, key, cfg.dit),
        codec=_numpy_params(codec_mod.init_codec, key, cfg.codec),
        gpt2=_numpy_params(gpt2_mod.init_gpt2, key,
                           gpt2_mod.GPT2Config()),
        embedding_head=nac_tr["embedding_head"],
        vector_quantizer=nac_tr["vector_quantizer"],
        vocoder=_numpy_params(voc_mod.init_bigvgan, key, cfg.vocoder),
    )
    params = jax.device_put(params, jax.devices()[0])
    print(f"# init: {time.time() - t0:.1f}s", file=sys.stderr)

    length = 24000 * SECONDS
    rng = np.random.default_rng(1)
    audio = jnp.asarray(
        0.05 * rng.standard_normal((BATCH, 1, length)).astype(np.float32))
    mask = jnp.ones((BATCH, length), jnp.int32)
    text = jnp.asarray(rng.integers(0, 50257, (BATCH, 64)))

    synth = build_synthesize(cfg)

    # block_until_ready on the tunneled single-chip backend can return
    # before execution finishes; a scalar readback (sum of the last output
    # samples) forces real completion, so the timing is honest.
    def run(params, audio, mask, text, key):
        wav = synth(params, audio, mask, text, key)
        return wav, jnp.sum(wav[:, -8:])

    fn = jax.jit(run)
    t0 = time.time()
    _, chk = fn(params, audio, mask, text, jax.random.key(7))
    float(chk)
    print(f"# compile+first run: {time.time() - t0:.1f}s", file=sys.stderr)

    times = []
    for i in range(3):
        t0 = time.time()
        _, chk = fn(params, audio, mask, text, jax.random.key(i))
        float(chk)
        times.append(time.time() - t0)
    dt = min(times)
    value = BATCH * SECONDS / dt
    print(json.dumps({
        "metric": "audio_seconds_synthesized_per_s_per_chip",
        "value": round(value, 3),
        "unit": f"audio-s/s/chip (B={BATCH}, {SECONDS}s utt, "
                f"{STEPS}-step DiT-base + BigVGAN)",
        "vs_baseline": round(value, 3),
    }))


if __name__ == "__main__":
    main()
