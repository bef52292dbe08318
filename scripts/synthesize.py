"""Generate speech from a prompt audio file + text (parity: ref
SpeechGenerator.generate_speech_from_file, src/model/SpeechGenerator.py:75).

Example:
  python scripts/synthesize.py --audio prompt.wav --text "bonjour" \
      --encodec /weights/encodec_24khz --gpt2 /weights/gpt2 \
      --gpt2-vocab vocab.json --gpt2-merges merges.txt \
      --bigvgan /weights/bigvgan_v2_24khz --ditto checkpoints/DiTTO_final.npz \
      --nac checkpoints/NAC_final.npz --steps 50 --out out.wav
"""

from __future__ import annotations

import argparse
import os
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.core.config import DiTConfig, PipelineConfig, SamplerConfig
from ditto_tts_tpu.data.processing import decode_audio
from ditto_tts_tpu.infer.generator import GeneratorParams
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.models import vocoder as voc_mod
from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod
from _common import gpt2_tokenizer
from ditto_tts_tpu.train.checkpoint import load_checkpoint
from ditto_tts_tpu.utils.weights import load_state_dict


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--audio", required=True)
    p.add_argument("--text", required=True)
    p.add_argument("--out", default="output.wav")
    p.add_argument("--steps", type=int, default=50)
    p.add_argument("--sampler", choices=["ddpm", "ddim"], default="ddpm")
    p.add_argument("--cond-by-audio", action="store_true")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ref-config", action="store_true")
    p.add_argument("--encodec", default=None)
    p.add_argument("--gpt2", default=None)
    p.add_argument("--gpt2-vocab", default=None)
    p.add_argument("--gpt2-merges", default=None)
    p.add_argument("--bigvgan", default=None)
    p.add_argument("--ditto", default=None, help="DiTTO .npz checkpoint")
    p.add_argument("--nac", default=None, help="NAC .npz checkpoint")
    args = p.parse_args()

    from ditto_tts_tpu.core.config import ref_trained_dit_config
    dit_cfg = (ref_trained_dit_config() if args.ref_config
               else DiTConfig(num_layers=12, num_heads=12))
    cfg = PipelineConfig(dit=dit_cfg,
                         sampler=SamplerConfig(num_steps=args.steps,
                                               kind=args.sampler))

    keys = jax.random.split(jax.random.key(args.seed), 8)

    def opt(loader, path, fallback, name):
        if path:
            return loader(path)
        print(f"[warn] --{name} not given: random weights (smoke only)")
        return fallback()

    codec_params = opt(
        lambda p_: codec_mod.import_hf_state_dict(load_state_dict(p_),
                                                  cfg.codec),
        args.encodec, lambda: codec_mod.init_codec(keys[0], cfg.codec),
        "encodec")
    gpt2_cfg = gpt2_mod.GPT2Config()
    gpt2_params = opt(
        lambda p_: gpt2_mod.import_hf_state_dict(load_state_dict(p_),
                                                 gpt2_cfg),
        args.gpt2, lambda: gpt2_mod.init_gpt2(keys[1], gpt2_cfg), "gpt2")
    voc_params = opt(
        lambda p_: voc_mod.import_bigvgan_state_dict(load_state_dict(p_),
                                                     cfg.vocoder),
        args.bigvgan, lambda: voc_mod.init_bigvgan(keys[2], cfg.vocoder),
        "bigvgan")
    if args.ditto:
        st, _ = load_checkpoint(args.ditto)
        dit_params = st.get("params", st)
    else:
        print("[warn] --ditto not given: random DiT weights (smoke only)")
        dit_params = dit_mod.init_ditto(keys[3], dit_cfg)
    if args.nac:
        st, _ = load_checkpoint(args.nac)
        nac_tr = st.get("params", st)
    else:
        print("[warn] --nac not given: random NAC head (smoke only)")
        nac_tr = nac_mod.init_nac_trainable(keys[4], cfg.nac)

    params = GeneratorParams(
        dit=dit_params, codec=codec_params, gpt2=gpt2_params,
        embedding_head=nac_tr["embedding_head"],
        vector_quantizer=nac_tr["vector_quantizer"], vocoder=voc_params)

    wav_in = decode_audio(args.audio, cfg.audio.sample_rate)
    audio = jnp.asarray(wav_in)[None, None, :]
    mask = jnp.ones((1, len(wav_in)), jnp.int32)
    tok = gpt2_tokenizer(args)
    text_ids = jnp.asarray(tok(args.text, padding="longest")["input_ids"])

    # serving path: two async jit dispatches (see build_synthesize_pipelined)
    from ditto_tts_tpu.infer.generator import build_synthesize_pipelined
    fn = build_synthesize_pipelined(cfg, cond_by_audio=args.cond_by_audio)
    out = np.asarray(jax.block_until_ready(
        fn(params, audio, mask, text_ids, jax.random.key(args.seed))))[0]

    pcm = (np.clip(out, -1, 1) * 32767).astype(np.int16)
    with wave.open(args.out, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(cfg.audio.sample_rate)
        f.writeframes(pcm.tobytes())
    print(f"wrote {args.out}: {len(pcm)} samples "
          f"({len(pcm) / cfg.audio.sample_rate:.2f}s)")


if __name__ == "__main__":
    main()
