"""End-to-end TTS inference pipeline (SpeechGenerator equivalent).

Re-design of the reference serving path (ref: src/model/SpeechGenerator.py:
75-164):

  codec encode -> embedding head -> truncate to 1024 frames -> channel mean
  -> q_sample at t=T-1 (prompt noising; ref-compat uses the inverted buffer,
  quirk #1) -> K-step DDPM/DDIM reverse diffusion conditioned on GPT2 wte
  text embeddings -> repeat to 2 codebook channels -> VectorQuantizer ->
  codec decode -> mel -> BigVGAN -> waveform.

The chain after host-side tokenization runs with no host round-trips:
``build_synthesize`` is ONE jitted function (the sampler a lax.scan, the
vocoder a conv stack) and is the parity/reference path;
``build_synthesize_pipelined`` is the production serving path — the same
math as TWO async jit dispatches split at the code indices (the codec
LSTM scan sharing an XLA program with the DiT scan costs ~70 ms; the
indices stay on device). Step count is a parameter (ref ran 1000; the
metric path is 50).

The ``use_slp`` path implements the *corrected* SLP semantics (quirk #5):
argmax duration class -> seconds -> latent frames, realized as a masked
fixed-shape latent buffer so jit shapes stay static.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Dict, Optional

import numpy as np
import jax
import jax.numpy as jnp

from ..codec import encodec as codec_mod
from ..codec import rvq as rvq_mod
from ..core.config import PipelineConfig
from ..diffusion.sampler import ddim_sample, ddpm_sample, respaced_timesteps
from ..diffusion.schedule import NoiseSchedule, q_sample
from ..models import dit as dit_mod
from ..models import slp as slp_mod
from ..models import vocoder as voc_mod
from ..text import byt5 as byt5_mod
from ..text import gpt2 as gpt2_mod


@jax.tree_util.register_dataclass
@dataclasses.dataclass
class GeneratorParams:
    """All parameter pytrees the pipeline needs (frozen at inference)."""

    dit: Dict
    codec: Dict
    gpt2: Dict
    embedding_head: Dict          # NAC trainable: codes -> 768-dim latents
    vector_quantizer: Dict        # NAC trainable: latent -> code indices
    vocoder: Dict
    byt5: Optional[Dict] = None   # only needed for the SLP path
    slp: Optional[Dict] = None


def _prep_blocks(params: GeneratorParams, cfg: PipelineConfig):
    """Stack/cast/fuse the DiT blocks ONCE per jitted region (outside the
    reverse-diffusion scan); None on the unscanned path."""
    if cfg.dit.scan_blocks and cfg.dit.num_layers > 1:
        return dit_mod.prepare_blocks(params.dit, cfg.dit)
    return None


def encode_prompt_latents(params: GeneratorParams, cfg: PipelineConfig,
                          audio, padding_mask=None):
    """Waveform -> channel-meaned latents [B, T<=1024, 768]
    (ref: SpeechGenerator.py:96-98)."""
    codes = codec_mod.codec_encode(params.codec, cfg.codec, audio,
                                   padding_mask, bandwidth_kbps=1.5)
    latents = jnp.take(params.embedding_head["weight"], codes, axis=0)
    latents = latents[:, :, :cfg.dit.max_token_length]
    return jnp.mean(latents, axis=1)


def latents_to_waveform(params: GeneratorParams, cfg: PipelineConfig,
                        latents, output_length: int, *,
                        ref_exact_vq: bool = False):
    """Refined latents [B, T, 768] -> BigVGAN waveform [B, L']
    (ref: SpeechGenerator.py:114-128 — including the double vocoding,
    quirk #9: codec decode to audio, re-analyze to mel, re-render)."""
    stacked = jnp.repeat(latents[:, None], 2, axis=1)     # quirk #8 inverse
    indices = rvq_mod.vq_indices(params.vector_quantizer, stacked,
                                 ref_exact=ref_exact_vq)
    wav = codec_mod.codec_decode(params.codec, cfg.codec, indices,
                                 output_length=output_length)
    mel = _mel(cfg, wav[:, 0])
    out = voc_mod.bigvgan_forward(params.vocoder, cfg.vocoder, mel)
    return out[:, 0]


def _mel(cfg: PipelineConfig, wav):
    from ..ops.mel import get_mel_spectrogram
    v = cfg.vocoder
    return get_mel_spectrogram(
        wav, sample_rate=v.sampling_rate, n_fft=v.n_fft,
        num_mels=v.num_mels, hop=v.hop_size, win_size=v.win_size,
        fmin=v.fmin, fmax=v.fmax)


def build_synthesize(cfg: PipelineConfig, *, num_steps: Optional[int] = None,
                     sampler_kind: Optional[str] = None,
                     cond_by_audio: bool = False, ref_compat=None):
    """Returns a jittable fn(params, audio, padding_mask, text_ids, key)."""
    steps = num_steps if num_steps is not None else cfg.sampler.num_steps
    kind = sampler_kind if sampler_kind is not None else cfg.sampler.kind
    compat = cfg.dit.ref_compat if ref_compat is None else ref_compat
    schedule = NoiseSchedule.cosine(cfg.dit.diffusion_steps)
    taus = respaced_timesteps(cfg.dit.diffusion_steps, steps)

    def synthesize(params: GeneratorParams, audio, padding_mask, text_ids,
                   key):
        latents = encode_prompt_latents(params, cfg, audio, padding_mask)
        text_ids_t = text_ids[:, :cfg.dit.max_token_length]
        text_emb = gpt2_mod.embed_tokens(params.gpt2, text_ids_t)

        # prompt noising at t = T-1 (ref: SpeechGenerator.py:106-108)
        t_full = jnp.full((latents.shape[0],), cfg.dit.diffusion_steps - 1,
                          jnp.int32)
        k_noise, k_init, k_samp = jax.random.split(key, 3)
        noised = q_sample(schedule, latents, t_full,
                          jax.random.normal(k_noise, latents.shape,
                                            latents.dtype),
                          ref_compat=compat)

        x_init = noised if cond_by_audio else jax.random.normal(
            k_init, latents.shape, latents.dtype)

        prep = _prep_blocks(params, cfg)
        # text is constant across the reverse scan: project every layer's
        # cross-attn K/V ONCE here instead of per denoise step (~10% of
        # the sampler's FLOPs at S=750)
        ckv = (None if prep is None
               else dit_mod.prepare_cross_kv(prep, cfg.dit, text_emb))

        def model_fn(x, t):
            return dit_mod.ditto_forward(params.dit, cfg.dit, x, text_emb, t,
                                         prepared_blocks=prep,
                                         cross_kv=ckv)

        if kind == "ddim":
            refined = ddim_sample(model_fn, k_samp, x_init, schedule, taus,
                                  eta=cfg.sampler.ddim_eta,
                                  clip_denoised=cfg.sampler.clip_denoised,
                                  prediction_type=cfg.dit.prediction_type)
        else:
            refined = ddpm_sample(model_fn, k_samp, x_init, schedule, taus,
                                  clip_denoised=cfg.sampler.clip_denoised,
                                  prediction_type=cfg.dit.prediction_type)

        return latents_to_waveform(params, cfg, refined,
                                   output_length=audio.shape[-1],
                                   ref_exact_vq=compat)

    return synthesize


def build_synthesize_pipelined(cfg: PipelineConfig, *,
                               num_steps: Optional[int] = None,
                               sampler_kind: Optional[str] = None,
                               cond_by_audio: bool = False, ref_compat=None):
    """Production serving path: the same math as ``build_synthesize`` as
    TWO async jit dispatches split at the refined-indices boundary.

    Rationale (measured, 10 s/B=4 on v5e): placing the codec decoder's
    750-step LSTM scan in the SAME XLA program as the 50-step DiT scan
    slows the sampler portion by ~70 ms (a scheduling pathology — an
    optimization barrier between the stages does not recover it), while
    a second dispatch costs nothing because JAX queues it asynchronously
    behind the first with no host sync: 835 ms vs 936 ms end to end.
    There is still no host round-trip — the indices stay on device.

    Returns fn(params, audio, padding_mask, text_ids, key) -> waveform.
    """
    compat = cfg.dit.ref_compat if ref_compat is None else ref_compat
    stages = build_stage_fns(cfg, num_steps=num_steps,
                             sampler_kind=sampler_kind,
                             cond_by_audio=cond_by_audio, ref_compat=compat)

    part1 = jax.jit(stages["refine_indices"])
    part2 = jax.jit(stages["indices_to_waveform"],
                    static_argnames=("output_length",))

    def synthesize(params: GeneratorParams, audio, padding_mask, text_ids,
                   key):
        idx = part1(params, audio, padding_mask, text_ids, key)
        return part2(params, idx, output_length=audio.shape[-1])

    return synthesize


def build_stage_fns(cfg: PipelineConfig, *, num_steps: Optional[int] = None,
                    sampler_kind: Optional[str] = None,
                    cond_by_audio: bool = False, ref_compat: bool = False):
    """The synthesize chain split into its five pipeline stages, each a
    separately jittable fn — for per-stage profiling / MFU accounting
    (stage boundaries follow ref: SpeechGenerator.py:93-128)."""
    steps = num_steps if num_steps is not None else cfg.sampler.num_steps
    schedule = NoiseSchedule.cosine(cfg.dit.diffusion_steps)
    taus = respaced_timesteps(cfg.dit.diffusion_steps, steps)

    def encode(params, audio, padding_mask):
        return encode_prompt_latents(params, cfg, audio, padding_mask)

    def sampler(params, latents, text_ids, key):
        text_emb = gpt2_mod.embed_tokens(
            params.gpt2, text_ids[:, :cfg.dit.max_token_length])

        prep = _prep_blocks(params, cfg)
        # text is constant across the reverse scan: project every layer's
        # cross-attn K/V ONCE here instead of per denoise step (~10% of
        # the sampler's FLOPs at S=750)
        ckv = (None if prep is None
               else dit_mod.prepare_cross_kv(prep, cfg.dit, text_emb))

        def model_fn(x, t):
            return dit_mod.ditto_forward(params.dit, cfg.dit, x, text_emb, t,
                                         prepared_blocks=prep,
                                         cross_kv=ckv)

        k_init, k_samp = jax.random.split(key)
        x_init = jax.random.normal(k_init, latents.shape, latents.dtype)
        return ddpm_sample(model_fn, k_samp, x_init, schedule, taus,
                           clip_denoised=cfg.sampler.clip_denoised,
                           prediction_type=cfg.dit.prediction_type)

    def vq_decode(params, refined, output_length):
        stacked = jnp.repeat(refined[:, None], 2, axis=1)
        indices = rvq_mod.vq_indices(params.vector_quantizer, stacked)
        return codec_mod.codec_decode(params.codec, cfg.codec, indices,
                                      output_length=output_length)

    def mel(params, wav):
        return _mel(cfg, wav[:, 0])

    def vocoder(params, m):
        return voc_mod.bigvgan_forward(params.vocoder, cfg.vocoder, m)

    # the two-dispatch serving split (build_synthesize_pipelined): full
    # build_synthesize semantics up to the code indices, then the codec/
    # mel/vocoder tail
    kind = sampler_kind if sampler_kind is not None else cfg.sampler.kind

    def refine_indices(params, audio, padding_mask, text_ids, key):
        latents = encode_prompt_latents(params, cfg, audio, padding_mask)
        text_emb = gpt2_mod.embed_tokens(
            params.gpt2, text_ids[:, :cfg.dit.max_token_length])
        t_full = jnp.full((latents.shape[0],), cfg.dit.diffusion_steps - 1,
                          jnp.int32)
        k_noise, k_init, k_samp = jax.random.split(key, 3)
        noised = q_sample(schedule, latents, t_full,
                          jax.random.normal(k_noise, latents.shape,
                                            latents.dtype),
                          ref_compat=ref_compat)
        x_init = noised if cond_by_audio else jax.random.normal(
            k_init, latents.shape, latents.dtype)

        prep = _prep_blocks(params, cfg)
        # text is constant across the reverse scan: project every layer's
        # cross-attn K/V ONCE here instead of per denoise step (~10% of
        # the sampler's FLOPs at S=750)
        ckv = (None if prep is None
               else dit_mod.prepare_cross_kv(prep, cfg.dit, text_emb))

        def model_fn(x, t):
            return dit_mod.ditto_forward(params.dit, cfg.dit, x, text_emb, t,
                                         prepared_blocks=prep,
                                         cross_kv=ckv)

        if kind == "ddim":
            refined = ddim_sample(model_fn, k_samp, x_init, schedule, taus,
                                  eta=cfg.sampler.ddim_eta,
                                  clip_denoised=cfg.sampler.clip_denoised,
                                  prediction_type=cfg.dit.prediction_type)
        else:
            refined = ddpm_sample(model_fn, k_samp, x_init, schedule, taus,
                                  clip_denoised=cfg.sampler.clip_denoised,
                                  prediction_type=cfg.dit.prediction_type)
        stacked = jnp.repeat(refined[:, None], 2, axis=1)  # quirk #8 inv
        return rvq_mod.vq_indices(params.vector_quantizer, stacked,
                                  ref_exact=ref_compat)

    def indices_to_waveform(params, indices, output_length):
        wav = codec_mod.codec_decode(params.codec, cfg.codec, indices,
                                     output_length=output_length)
        m = _mel(cfg, wav[:, 0])
        return voc_mod.bigvgan_forward(params.vocoder, cfg.vocoder, m)[:, 0]

    return {"encode": encode, "sampler": sampler, "vq_decode": vq_decode,
            "mel": mel, "vocoder": vocoder,
            "refine_indices": refine_indices,
            "indices_to_waveform": indices_to_waveform}


def build_synthesize_recorded(cfg: PipelineConfig, *,
                              num_steps: Optional[int] = None,
                              cond_by_audio: bool = False,
                              ref_compat: Optional[bool] = None,
                              return_intermediates: bool = True):
    """Noise-injected variant of ``build_synthesize`` for bit-matching
    against the reference: instead of a PRNG key it takes the exact noise
    tensors a reference-order torch run draws (see
    ``utils.torch_bridge.record_reference_noise``):

      prompt_noise: [B, T, H]   q_sample draw (ref: SpeechGenerator.py:106)
      init_noise:   [B, T, H] or None when cond_by_audio (ref: :154)
      step_noise:   [K, B, T, H] one per reverse step (ref: :130-147)

    Returns (waveform, intermediates) so parity reports can compare every
    stage (encoder latents, noised prompt, refined latents, VQ indices,
    codec waveform, mel, final waveform)."""
    steps = num_steps if num_steps is not None else cfg.sampler.num_steps
    compat = cfg.dit.ref_compat if ref_compat is None else ref_compat
    schedule = NoiseSchedule.cosine(cfg.dit.diffusion_steps)
    taus = respaced_timesteps(cfg.dit.diffusion_steps, steps)

    def synthesize(params: GeneratorParams, audio, padding_mask, text_ids,
                   prompt_noise, init_noise, step_noise):
        latents = encode_prompt_latents(params, cfg, audio, padding_mask)
        text_ids_t = text_ids[:, :cfg.dit.max_token_length]
        text_emb = gpt2_mod.embed_tokens(params.gpt2, text_ids_t)

        t_full = jnp.full((latents.shape[0],), cfg.dit.diffusion_steps - 1,
                          jnp.int32)
        noised = q_sample(schedule, latents, t_full, prompt_noise,
                          ref_compat=compat)
        x_init = noised if cond_by_audio else init_noise

        prep = _prep_blocks(params, cfg)
        # text is constant across the reverse scan: project every layer's
        # cross-attn K/V ONCE here instead of per denoise step (~10% of
        # the sampler's FLOPs at S=750)
        ckv = (None if prep is None
               else dit_mod.prepare_cross_kv(prep, cfg.dit, text_emb))

        def model_fn(x, t):
            return dit_mod.ditto_forward(params.dit, cfg.dit, x, text_emb, t,
                                         prepared_blocks=prep,
                                         cross_kv=ckv)

        refined = ddpm_sample(model_fn, jax.random.key(0), x_init, schedule,
                              taus, noise_seq=step_noise,
                              prediction_type=cfg.dit.prediction_type)

        stacked = jnp.repeat(refined[:, None], 2, axis=1)  # quirk #8 inverse
        indices = rvq_mod.vq_indices(params.vector_quantizer, stacked,
                                     ref_exact=compat)
        wav = codec_mod.codec_decode(params.codec, cfg.codec, indices,
                                     output_length=audio.shape[-1])
        mel = _mel(cfg, wav[:, 0])
        out = voc_mod.bigvgan_forward(params.vocoder, cfg.vocoder, mel)[:, 0]
        if not return_intermediates:
            return out
        return out, {"latents": latents, "noised": noised,
                     "refined": refined, "indices": indices,
                     "codec_wav": wav, "mel": mel}

    return synthesize


def build_synthesize_with_slp(cfg: PipelineConfig, *,
                              num_steps: Optional[int] = None):
    """SLP-driven variant: latent length predicted from text+audio
    (corrected quirk #5 semantics). The latent buffer is sized for the max
    duration; frames beyond the prediction are masked out of the codec
    decode by zeroing — shapes stay static under jit."""
    steps = num_steps if num_steps is not None else cfg.sampler.num_steps
    schedule = NoiseSchedule.cosine(cfg.dit.diffusion_steps)
    taus = respaced_timesteps(cfg.dit.diffusion_steps, steps)
    max_frames = min(cfg.audio.max_latent_frames, cfg.dit.max_token_length)

    def synthesize(params: GeneratorParams, audio, padding_mask, text_ids,
                   byt5_ids, byt5_mask, key):
        logits = slp_mod.slp_forward(
            params.slp, params.byt5, params.codec, cfg.slp,
            byt5_mod.byt5_small_config(), cfg.codec, byt5_ids, byt5_mask,
            audio, padding_mask)
        frames = slp_mod.slp_predict_frames(
            logits, frame_rate=cfg.audio.frame_rate,
            min_seconds=int(cfg.audio.min_audio_seconds))   # [B]

        text_emb = gpt2_mod.embed_tokens(
            params.gpt2, text_ids[:, :cfg.dit.max_token_length])

        b = audio.shape[0]
        k_init, k_samp = jax.random.split(key)
        x_init = jax.random.normal(
            k_init, (b, max_frames, cfg.dit.hidden_dim))
        frame_idx = jnp.arange(max_frames)[None, :]
        valid = frame_idx < frames[:, None]

        prep = _prep_blocks(params, cfg)
        # text is constant across the reverse scan: project every layer's
        # cross-attn K/V ONCE here instead of per denoise step (~10% of
        # the sampler's FLOPs at S=750)
        ckv = (None if prep is None
               else dit_mod.prepare_cross_kv(prep, cfg.dit, text_emb))

        def model_fn(x, t):
            return dit_mod.ditto_forward(params.dit, cfg.dit, x, text_emb, t,
                                         prepared_blocks=prep,
                                         cross_kv=ckv)

        refined = ddpm_sample(model_fn, k_samp, x_init, schedule, taus,
                              clip_denoised=cfg.sampler.clip_denoised,
                              prediction_type=cfg.dit.prediction_type)
        refined = refined * valid[..., None]
        out_len = int(max_frames * cfg.codec.hop_length)
        wav = latents_to_waveform(params, cfg, refined, output_length=out_len)
        return wav, frames

    return synthesize
