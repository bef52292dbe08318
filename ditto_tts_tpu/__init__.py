"""ditto_tts_tpu — a TPU-native (JAX/XLA/Pallas/pjit) DiTTo-style TTS framework.

A from-scratch re-design of the capabilities of the ``Tikai7/DiTTO-TTS``
reference (see /root/repo/SURVEY.md): a neural audio codec (EnCodec-style
SEANet encoder/decoder + RVQ + GPT2-aligned latents), a ByT5-based speech
length predictor, a DiT diffusion transformer with RoPE/AdaLN/gated-MLP,
DDPM/DDIM sampling as ``lax.scan``, and a BigVGAN vocoder with a fused
Pallas anti-aliased Snake activation — all built for TPU: bf16 MXU matmuls,
static shapes, mesh-sharded via ``jax.sharding`` + ``pjit``.

Layout:
  core/       config dataclasses, PRNG discipline, dtype policy
  nn/         functional NN primitives (params are plain pytrees)
  ops/        compute kernels: Pallas flash attention, RoPE, mel/STFT, snake
  text/       byte/BPE tokenizers, ByT5 encoder, GPT2 LM (JAX)
  codec/      EnCodec-style codec, RVQ, the NAC model
  diffusion/  noise schedules (incl. reference-compat modes), samplers
  models/     DiT/DiTTO, SLP, BigVGAN vocoder
  train/      jitted train steps, Trainer, checkpointing
  infer/      SpeechGenerator-equivalent end-to-end pipeline
  parallel/   mesh builders + sharding rules (dp/tp), multi-host init
  data/       MLS-French dataset, batching/padding buckets
  eval/       mel-MAE, CER/WER/SIM hooks, throughput harness
"""

__version__ = "0.1.0"
