"""Time the SLP-driven serving chain on the chip (VERDICT r4 #5).

North-star config 4 is "SLP -> DiT -> NAC decode -> BigVGAN": text goes
through ByT5, the SLP decoder predicts the latent length, and the DiT
denoises a max-length buffer with invalid frames masked before the codec
decode (``build_synthesize_with_slp``).  This was CPU-tested but never
timed on the chip; this script runs it at the 10 s bucket (B=4,
max_audio_seconds=10 => 750-frame buffer) and writes SLP_BENCH_r05.json
with audio-s/s/chip next to the flagship number.

  python scripts/slp_chain_bench.py
"""

import json
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

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = float(os.environ.get("BENCH_SECONDS", 10.0))


def main():
    from bench import _numpy_params
    from ditto_tts_tpu.core.config import (AudioConfig, DiTConfig,
                                           PipelineConfig, SamplerConfig)
    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.infer.generator import (GeneratorParams,
                                               build_synthesize_with_slp)
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.models import slp as slp_mod
    from ditto_tts_tpu.models import vocoder as voc_mod
    from ditto_tts_tpu.text import byt5 as byt5_mod
    from ditto_tts_tpu.text import gpt2 as gpt2_mod

    cfg = PipelineConfig(
        audio=AudioConfig(max_audio_seconds=SECONDS),
        dit=DiTConfig(num_layers=12, num_heads=12, scan_blocks=True,
                      compute_dtype="bfloat16"),
        sampler=SamplerConfig(num_steps=50))
    byt5_cfg = byt5_mod.byt5_small_config()

    key = jax.random.key(0)
    keys = jax.random.split(key, 8)
    nac_tr = _numpy_params(nac_mod.init_nac_trainable, keys[3], cfg.nac)
    params = GeneratorParams(
        dit=_numpy_params(dit_mod.init_ditto, keys[0], cfg.dit),
        codec=_numpy_params(codec_mod.init_codec, keys[1], cfg.codec),
        gpt2=_numpy_params(gpt2_mod.init_gpt2, keys[2],
                           gpt2_mod.GPT2Config()),
        embedding_head=nac_tr["embedding_head"],
        vector_quantizer=nac_tr["vector_quantizer"],
        vocoder=_numpy_params(voc_mod.init_bigvgan, keys[4], cfg.vocoder),
        byt5=_numpy_params(byt5_mod.init_byt5, keys[5], byt5_cfg),
        slp=_numpy_params(slp_mod.init_slp_trainable, keys[6], cfg.slp),
    )
    params = jax.device_put(params, jax.devices()[0])

    L = int(24000 * SECONDS)
    rng = np.random.default_rng(0)
    audio = jnp.asarray(0.05 * rng.standard_normal((BATCH, 1, L)),
                        jnp.float32)
    mask = jnp.ones((BATCH, L), jnp.int32)
    text_ids = jnp.asarray(rng.integers(0, 50257, (BATCH, 64)), jnp.int32)
    byt5_ids = jnp.asarray(rng.integers(3, 250, (BATCH, 64)), jnp.int32)
    byt5_mask = jnp.ones((BATCH, 64), jnp.int32)

    fn = jax.jit(build_synthesize_with_slp(cfg))
    t0 = time.time()
    wav, frames = fn(params, audio, mask, text_ids, byt5_ids, byt5_mask,
                     jax.random.key(7))
    fence = float(jnp.sum(wav[..., -4:].astype(jnp.float32)))
    compile_s = time.time() - t0
    print(f"compile+first {compile_s:.1f}s fence {fence:.5f} "
          f"frames {np.asarray(frames)}", flush=True)

    best = float("inf")
    for i in range(5):
        t0 = time.time()
        wav, frames = fn(params, audio, mask, text_ids, byt5_ids,
                         byt5_mask, jax.random.key(8 + i))
        float(jnp.sum(wav[..., -4:].astype(jnp.float32)))
        best = min(best, time.time() - t0)

    tput = BATCH * SECONDS / best
    report = {
        "chain": "ByT5 encode -> SLP duration decode -> DiT 50-step "
                 "denoise (max-frame buffer, invalid frames masked) -> "
                 "VQ -> codec decode -> mel -> BigVGAN "
                 "(build_synthesize_with_slp; "
                 "ref: src/model/SpeechGenerator.py:149-164)",
        "batch": BATCH,
        "bucket_seconds": SECONDS,
        "e2e_seconds": round(best, 4),
        "audio_s_per_s_per_chip": round(tput, 2),
        "compile_s": round(compile_s, 1),
        "note": "buffer is always max_frames=750 (static shapes under "
                "jit), so the chain's audio-s/s is a floor: shorter "
                "predicted durations still pay the full-buffer DiT/codec"
                "/vocoder cost",
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SLP_BENCH_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
