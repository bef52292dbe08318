"""Evaluation harness (Experiments.ipynb equivalent): generate over a
dataset subset and compute CER/WER (+ mel-MAE of codec round-trip, and
SIM-o/SIM-r if a speaker-embedding backend is supplied).

Ref: src/Experiments.ipynb cells 10-15 — cer_wer_on_loader /
compute_sim_o_sim_r over <=max-batches batches of the MLS loader.

Example:
  python scripts/evaluate.py --data-path /data/mls/test --max-batches 5 \
      --encodec /weights/encodec_24khz --gpt2 /weights/gpt2 \
      --gpt2-vocab vocab.json --gpt2-merges merges.txt \
      --bigvgan /weights/bigvgan --ditto ck/DiTTO_final.npz \
      --nac ck/NAC_final.npz --s2t /weights/s2t_medium --steps 50
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.core.config import DiTConfig, PipelineConfig, SamplerConfig
from ditto_tts_tpu.data.mls import MLSDataset, batches, default_buckets
from ditto_tts_tpu.eval.metrics import cer, mel_mae, wer
from ditto_tts_tpu.infer.generator import GeneratorParams, build_synthesize
from _common import gpt2_tokenizer
from ditto_tts_tpu.train.checkpoint import load_checkpoint
from ditto_tts_tpu.utils.weights import load_state_dict


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--data-path", required=True)
    p.add_argument("--max-batches", type=int, default=5)
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument("--steps", type=int, default=None,
                   help="sampler steps (default: config value)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--sample-seed", type=int, default=None,
                   help="sampling-noise seed (default: --seed). Lets "
                        "seed-spread studies vary the sampler while the "
                        "frozen-model init stays fixed")
    p.add_argument("--out", default="eval_results.json")
    p.add_argument("--encodec", default=None)
    p.add_argument("--gpt2", default=None)
    p.add_argument("--gpt2-vocab", default=None)
    p.add_argument("--gpt2-merges", default=None)
    p.add_argument("--bigvgan", default=None)
    p.add_argument("--ditto", default=None)
    p.add_argument("--nac", default=None)
    p.add_argument("--ecapa", default=None,
                   help="speechbrain ECAPA weights for SIM-o/SIM-r; "
                        "'random' for a smoke run")
    p.add_argument("--s2t-vocab", default=None,
                   help="Speech2Text vocab.json for transcript decoding; "
                        "omitted -> structurally-valid placeholder vocab")
    p.add_argument("--s2t-lang", default="fr")
    p.add_argument("--s2t", default=None,
                   help="local s2t snapshot for on-TPU ASR eval")
    p.add_argument("--ref-config", action="store_true")
    p.add_argument("--config", default=None,
                   help="PipelineConfig JSON path (overrides --ref-config "
                        "and the default geometry)")
    p.add_argument("--ecapa-tiny", action="store_true",
                   help="tiny ECAPA geometry (closed-loop discrimination "
                        "runs without the real speechbrain snapshot)")
    p.add_argument("--s2t-tiny", action="store_true",
                   help="tiny random-init ASR geometry (discrimination/"
                        "smoke runs without the real s2t snapshot)")
    p.add_argument("--oracle-ref", action="store_true",
                   help="score against the pipeline's own render of the "
                        "GROUND-TRUTH latents (VQ->codec->mel->vocoder) "
                        "instead of the raw prompt audio: with random "
                        "frozen models the raw waveform is unreachable by "
                        "construction, so this isolates what generation "
                        "quality actually controls")
    p.add_argument("--lenient-duration", action="store_true",
                   help="accept clips outside the 10-20 s MLS bound")
    p.add_argument("--gpt2-config", default=None,
                   help="GPT2Config overrides as a JSON file path or an "
                        "inline JSON object (tiny-geometry runs)")
    p.add_argument("--smoke-ortho", action="store_true",
                   help="orthogonal-reinit RANDOM codec/vocoder weights "
                        "(utils/smoke.py): default random init is "
                        "contractive and maps every input to the same "
                        "codes, so smoke/discrimination runs measure "
                        "nothing without this; ignored for loaded "
                        "checkpoints")
    args = p.parse_args()

    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.core.config import ref_trained_dit_config
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.models import vocoder as voc_mod
    from ditto_tts_tpu.text import gpt2 as gpt2_mod

    if args.config:
        with open(args.config) as f:
            cfg = PipelineConfig.from_json(f.read())
        if args.steps:
            cfg = cfg.replace(
                sampler=cfg.sampler.replace(num_steps=args.steps))
    else:
        dit_cfg = (ref_trained_dit_config() if args.ref_config
                   else DiTConfig(num_layers=12, num_heads=12))
        cfg = PipelineConfig(
            dit=dit_cfg,
            sampler=SamplerConfig(num_steps=args.steps or 50))
    keys = jax.random.split(jax.random.key(args.seed), 8)

    def opt(loader, path, fallback, name):
        if path:
            return loader(path)
        print(f"[warn] --{name} missing: random weights (smoke only)")
        return fallback()

    def smoke_gain(tree):
        if not args.smoke_ortho:
            return tree
        from ditto_tts_tpu.utils.smoke import orthogonal_reinit
        return orthogonal_reinit(tree, seed=args.seed)

    codec_params = opt(
        lambda x: codec_mod.import_hf_state_dict(load_state_dict(x),
                                                 cfg.codec),
        args.encodec,
        lambda: smoke_gain(codec_mod.init_codec(keys[0], cfg.codec)),
        "encodec")
    if args.gpt2_config:
        raw = args.gpt2_config
        if os.path.exists(raw):
            with open(raw) as f:
                raw = f.read()
        gpt2_cfg = gpt2_mod.GPT2Config(**json.loads(raw))
    else:
        gpt2_cfg = gpt2_mod.GPT2Config()
    gpt2_params = opt(
        lambda x: gpt2_mod.import_hf_state_dict(load_state_dict(x),
                                                gpt2_cfg),
        args.gpt2, lambda: gpt2_mod.init_gpt2(keys[1], gpt2_cfg), "gpt2")
    voc_params = opt(
        lambda x: voc_mod.import_bigvgan_state_dict(load_state_dict(x),
                                                    cfg.vocoder),
        args.bigvgan,
        lambda: smoke_gain(voc_mod.init_bigvgan(keys[2], cfg.vocoder)),
        "bigvgan")
    if args.ditto:
        st, _ = load_checkpoint(args.ditto)
        dit_params = st.get("params", st)
    else:
        dit_params = dit_mod.init_ditto(keys[3], cfg.dit)
    if args.nac:
        st, _ = load_checkpoint(args.nac)
        nac_tr = st.get("params", st)
    else:
        nac_tr = nac_mod.init_nac_trainable(keys[4], cfg.nac)

    params = GeneratorParams(
        dit=dit_params, codec=codec_params, gpt2=gpt2_params,
        embedding_head=nac_tr["embedding_head"],
        vector_quantizer=nac_tr["vector_quantizer"], vocoder=voc_params)

    asr = None
    if args.s2t:
        from ditto_tts_tpu.models import s2t as s2t_mod
        from ditto_tts_tpu.text.s2t_tokenizer import S2TTokenizer
        if args.s2t_tiny:
            s2t_cfg = s2t_mod.S2TConfig(
                vocab_size=200, d_model=64, encoder_layers=2,
                decoder_layers=2, encoder_heads=4, decoder_heads=4,
                encoder_ffn=128, decoder_ffn=128, conv_channels=64)
        else:
            s2t_cfg = s2t_mod.s2t_medium_config()
        if args.s2t == "random":
            print("[warn] --s2t random: random ASR weights (smoke only)")
            s2t_params = s2t_mod.init_s2t(keys[5], s2t_cfg)
        elif args.s2t.endswith(".npz"):
            st, _ = load_checkpoint(args.s2t)   # native-format checkpoint
            s2t_params = st.get("params", st)
        else:
            s2t_params = s2t_mod.import_hf_state_dict(
                load_state_dict(args.s2t), s2t_cfg)
        if args.s2t_vocab:
            s2t_tok = S2TTokenizer.from_file(args.s2t_vocab)
        else:
            print("[warn] --s2t-vocab missing: placeholder vocab "
                  "(CER/WER is text-vs-text but not the trained mapping)")
            s2t_tok = S2TTokenizer.placeholder(s2t_cfg.vocab_size)
        # forced BOS = the <lang:xx> id from the vocab (ref:
        # src/model/Speech2Text.py:11 tokenizer.lang_code_to_id["fr"])
        forced_bos = s2t_tok.lang_code_to_id[args.s2t_lang]
        print(f"[eval] s2t ASR loaded; <lang:{args.s2t_lang}> id "
              f"{forced_bos}")

    ecapa_params = ecapa_cfg = None
    if args.ecapa:
        from ditto_tts_tpu.models import ecapa as ecapa_mod
        ecapa_cfg = (ecapa_mod.tiny_ecapa_config() if args.ecapa_tiny
                     else ecapa_mod.ECAPAConfig())
        if args.ecapa == "random":
            print("[warn] --ecapa random: random speaker-embedding weights")
            ecapa_params = ecapa_mod.init_ecapa(keys[6], ecapa_cfg)
        elif args.ecapa.endswith(".npz"):
            st, _ = load_checkpoint(args.ecapa)  # native-format checkpoint
            ecapa_params = st.get("params", st)
        else:
            ecapa_params = ecapa_mod.import_speechbrain_state_dict(
                load_state_dict(args.ecapa), ecapa_cfg)
    tok = gpt2_tokenizer(args)

    ds = MLSDataset(args.data_path, tok, cfg.dit.max_token_length,
                    tokenizer_name="gpt2",
                    strict_duration=not args.lenient_duration)
    fn = jax.jit(build_synthesize(cfg))

    oracle_fn = None
    if args.oracle_ref:
        from ditto_tts_tpu.infer.generator import (encode_prompt_latents,
                                                   latents_to_waveform)

        def _oracle(p, audio, mask):
            lat = encode_prompt_latents(p, cfg, audio, mask)
            return latents_to_waveform(p, cfg, lat,
                                       output_length=audio.shape[-1])
        oracle_fn = jax.jit(_oracle)

    refs, hyps, mel_maes = [], [], []
    sim_o, sim_r = [], []

    def _embed(wav24, n):
        """24 kHz waveform -> ECAPA embedding (resample to 16 kHz fbank)."""
        from ditto_tts_tpu.models import s2t as s2t_mod
        wav16 = np.interp(np.arange(0, n, 1.5), np.arange(n), wav24[:n])
        fb = s2t_mod.log_mel_fbank(wav16.astype(np.float32), 16000)[None]
        from ditto_tts_tpu.models.ecapa import ecapa_embed
        return np.asarray(ecapa_embed(ecapa_params, ecapa_cfg,
                                      jnp.asarray(fb)))[0]

    def _asr(wav24, n):
        from ditto_tts_tpu.models import s2t as s2t_mod
        wav16 = np.interp(np.arange(0, n, 24000 / 16000.0),
                          np.arange(n), wav24[:n]).astype(np.float32)
        fb = s2t_mod.log_mel_fbank(wav16, 16000)[None]
        ids = s2t_mod.greedy_decode(
            s2t_params, s2t_cfg, jnp.asarray(fb),
            jnp.ones((1, fb.shape[1]), jnp.int32),
            forced_bos_id=forced_bos, max_len=200)
        return s2t_tok.decode(np.asarray(ids)[0])

    buckets = default_buckets(cfg.audio.sample_rate,
                              cfg.audio.min_audio_seconds,
                              cfg.audio.max_audio_seconds)
    for bi, batch in enumerate(batches(ds, args.batch_size,
                                       buckets=buckets, shuffle=False)):
        if bi >= args.max_batches:
            break
        sseed = args.seed if args.sample_seed is None else args.sample_seed
        wav = fn(params, jnp.asarray(batch["audio"]),
                 jnp.asarray(batch["padding_mask"]),
                 jnp.asarray(batch["text_ids"]),
                 jax.random.key(sseed + bi))
        wav = np.asarray(wav)
        ref_wavs = None
        if oracle_fn is not None:
            ref_wavs = np.asarray(oracle_fn(
                params, jnp.asarray(batch["audio"]),
                jnp.asarray(batch["padding_mask"])))
        for r in range(wav.shape[0]):
            n = int(batch["padding_mask"][r].sum())
            ref_audio = (ref_wavs[r] if ref_wavs is not None
                         else np.asarray(batch["audio"][r, 0]))
            mel_maes.append(mel_mae(wav[r][None, :n],
                                    ref_audio[None, :n]))
            if args.oracle_ref and args.s2t:
                # reference transcript = ASR of the oracle render, so the
                # comparison isolates the refined-latent fidelity
                refs.append(_asr(ref_audio, n))
            else:
                refs.append(tok.decode(
                    [t for t, m in zip(batch["text_ids"][r],
                                       batch["text_mask"][r]) if m]))
            if ecapa_params is not None:
                # SIM-o: generated vs original prompt; SIM-r: generated vs
                # codec reconstruction (ref: Experiments.ipynb cells 13-15)
                from ditto_tts_tpu.codec import encodec as codec_mod
                from ditto_tts_tpu.eval.metrics import cosine_similarity
                codes = codec_mod.codec_encode(
                    params.codec, cfg.codec,
                    jnp.asarray(batch["audio"][r:r + 1]),
                    jnp.asarray(batch["padding_mask"][r:r + 1]))
                recon = np.asarray(codec_mod.codec_decode(
                    params.codec, cfg.codec, codes, output_length=n))[0, 0]
                e_gen = _embed(wav[r], n)
                sim_o.append(cosine_similarity(e_gen, _embed(ref_audio, n)))
                sim_r.append(cosine_similarity(e_gen, _embed(recon, n)))
            if args.s2t:
                hyps.append(_asr(wav[r], n))

    results = {"mel_mae_mean": float(np.mean(mel_maes)),
               "num_utterances": len(refs)}
    if hyps:
        results["cer"] = cer(refs, hyps)
        results["wer"] = wer(refs, hyps)
    if sim_o:
        results["sim_o"] = float(np.mean(sim_o))
        results["sim_r"] = float(np.mean(sim_r))
    with open(args.out, "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results, indent=2))


if __name__ == "__main__":
    main()
