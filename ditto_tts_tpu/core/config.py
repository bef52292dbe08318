"""Typed configuration dataclasses.

Mirrors the reference's hyperparameter vocabulary (ref: src/utils/Config.py:3-151
— BaseConfig/ConfigNAC/ConfigSLP/ConfigDiTTO static classes) as serializable
dataclasses with no hardcoded cluster paths (ref quirk #12, SURVEY §2.10).
All paths are injected; ``to_json``/``from_json`` round-trip every config.
"""

from __future__ import annotations

import dataclasses
import json
from typing import Optional


def _asdict(cfg) -> dict:
    return dataclasses.asdict(cfg)


class _JsonMixin:
    def to_json(self) -> str:
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str):
        return cls(**json.loads(s))

    def replace(self, **kw):
        return dataclasses.replace(self, **kw)


@dataclasses.dataclass(frozen=True)
class AudioConfig(_JsonMixin):
    """Shared audio settings (ref: Config.py:8-10)."""

    sample_rate: int = 24_000
    min_audio_seconds: float = 10.0
    max_audio_seconds: float = 20.0
    # EnCodec 24 kHz: hop 320 => 75 latent frames per second.
    frame_rate: int = 75

    @property
    def max_latent_frames(self) -> int:
        return int(self.max_audio_seconds * self.frame_rate)


@dataclasses.dataclass(frozen=True)
class CodecConfig(_JsonMixin):
    """EnCodec-24kHz-compatible codec (facebook/encodec_24khz geometry).

    SEANet conv encoder/decoder with an LSTM bottleneck and residual VQ.
    """

    sample_rate: int = 24_000
    channels: int = 1
    num_filters: int = 32
    dimension: int = 128          # latent dim at the bottleneck
    ratios: tuple = (8, 5, 4, 2)  # upsampling ratios, decoder order
    kernel_size: int = 7
    last_kernel_size: int = 7
    residual_kernel_size: int = 3
    dilation_base: int = 2
    num_residual_layers: int = 1
    lstm_layers: int = 2
    codebook_size: int = 1024
    num_quantizers: int = 32      # checkpoint holds 32; 24kHz@1.5kbps uses 2
    num_codebooks_used: int = 2   # bandwidth 1.5 kbps -> 2 codebooks (ref default)
    causal: bool = True
    compress: int = 2
    trim_right_ratio: float = 1.0
    # stride-1 SEANet conv lowering: "pallas" (time-minor VMEM-accumulator
    # kernel, ops/conv_pallas.py) | "xla" (lax.conv). Exact to fp round-off
    # (tap summation order); both paths are golden-tested.
    conv_impl: str = "pallas"

    @property
    def hop_length(self) -> int:
        h = 1
        for r in self.ratios:
            h *= r
        return h  # 320


@dataclasses.dataclass(frozen=True)
class NACConfig(_JsonMixin):
    """Neural Audio Codec trainer config (ref: Config.py:42-67, ConfigNAC)."""

    lambda_factor: float = 0.1         # LM alignment loss weight (Config.py:47)
    hidden_size: int = 768             # GPT2 n_embd; embedding-head width
    codebook_size: int = 1024          # EnCodec codebook size
    max_token_length: int = 1024       # GPT2 n_positions truncation
    nb_samples: int = 10_000
    epochs: int = 20
    learning_rate: float = 1e-4
    batch_size: int = 4


@dataclasses.dataclass(frozen=True)
class SLPConfig(_JsonMixin):
    """Speech Length Predictor (ref: Config.py:69-99, ConfigSLP)."""

    embedding_dim: int = 1472          # ByT5-small d_model
    num_layers: int = 1
    num_heads: int = 1
    nb_classes: int = 11               # duration classes: seconds-10 in [0,10]
    max_token_length: int = 128
    nb_samples: int = 10_000
    epochs: int = 20
    learning_rate: float = 1e-4
    batch_size: int = 8


@dataclasses.dataclass(frozen=True)
class DiTConfig(_JsonMixin):
    """DiT diffusion transformer (ref: Config.py:102-151, ConfigDiTTO).

    The reference trained hidden 768 / 5 layers / 1 head; the paper base model
    is 12 layers / 12 heads. ``ref_compat`` toggles the reference's exact
    quirk semantics (SURVEY §2.10): inverted train-time noise schedule (#1),
    no self-attention output projection (#2), per-block time embedding unused
    (#3). With ``ref_compat=False`` the correct formulations are used.
    """

    hidden_dim: int = 768
    num_layers: int = 12
    num_heads: int = 12
    time_dim: int = 256
    text_dim: int = 768
    mlp_ratio: int = 4
    diffusion_steps: int = 1000
    cross_attn_dropout: float = 0.1    # ref DiT.py:90-91
    # where train-time cross-attn dropout applies: "output" (after the
    # attention projection — fuses with XLA's SDPA; the torch-MHA
    # probability-dropout path materializes [B, H, S, St] probs per
    # layer and measured 106 ms of a 297 ms train step at B=8/S=750) |
    # "probs" (torch nn.MultiheadAttention semantics; forced when
    # ref_compat)
    attn_dropout_mode: str = "output"
    max_token_length: int = 1024
    ref_compat: bool = False
    # fold the (structurally identical) block stack into one lax.scan:
    # same numerics, ~num_layers-times smaller XLA graph => much faster
    # compiles; off by default to keep per-block profiler annotations
    scan_blocks: bool = False
    # "bfloat16" runs block matmuls with bf16 operands (fp32 accumulation
    # and fp32 LayerNorm/softmax stats); "float32" for golden parity
    compute_dtype: str = "float32"
    # rematerialize each block in the backward pass (training memory)
    remat_blocks: bool = False
    # jax.checkpoint policy when remat_blocks: "nothing_saveable"
    # (recompute everything) | "dots_with_no_batch_dims_saveable" (save
    # weight-matmul outputs, recompute elementwise/attention internals —
    # the usual throughput/memory middle ground)
    remat_policy: str = "dots_with_no_batch_dims_saveable"
    # diffusion target parameterization: "eps" (reference; TrainDiTTO.py
    # predicts the noise) | "v" (Salimans & Ho 2022) | "x0". eps-prediction
    # gives conditioning (text) a vanishing gradient at high t (the target
    # is ~the input), while sampling needs it exactly there; "v" weights
    # all t evenly and is the recommended mode for new training runs.
    prediction_type: str = "eps"

    # training
    epochs: int = 20
    learning_rate: float = 1e-4
    batch_size: int = 8
    nb_samples: int = 10_000

    @property
    def head_dim(self) -> int:
        assert self.hidden_dim % self.num_heads == 0
        return self.hidden_dim // self.num_heads


def ref_trained_dit_config() -> DiTConfig:
    """The configuration the reference actually trained (Config.py:109-116)."""
    return DiTConfig(num_layers=5, num_heads=1, ref_compat=True)


@dataclasses.dataclass(frozen=True)
class VocoderConfig(_JsonMixin):
    """BigVGAN v2 24 kHz 100-band 256x geometry (nvidia/bigvgan_v2_...)."""

    num_mels: int = 100
    upsample_rates: tuple = (4, 4, 2, 2, 2, 2)
    upsample_kernel_sizes: tuple = (8, 8, 4, 4, 4, 4)
    upsample_initial_channel: int = 1536
    resblock_kernel_sizes: tuple = (3, 7, 11)
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    activation: str = "snakebeta"
    snake_logscale: bool = True
    use_anti_aliasing: bool = True     # anti-aliased (2x up/down) activation
    # "fused_conv" (default — inside AMP blocks each act->conv pair runs
    # as ONE Pallas kernel at C 96-384, ops/act_conv_pallas.py; all
    # other positions fall back to polyphase. 342 ms vs 363 ms e2e at
    # the 10 s/B=4 bench. Activation edge semantics differ within ~6
    # input samples of the sequence ends — strict-parity runs pin
    # "polyphase") |
    # "polyphase" (exact slice-form, XLA-fused) |
    # "polyphase_gemm" (nlc only: the four 6-tap FIRs as banded GEMMs,
    # ops/fir_gemm.py) | "composed" (up/act/down as convs; oracle —
    # requires layout="ncl", the nlc path raises) | "fused_pallas" (nlc:
    # dispatches to the validated blocked NLC kernel
    # ops/snake_pallas_nlc.py for widths >= 96, falls back to polyphase
    # below; ncl: the round-1 ANY-space kernel that hangs the tunneled
    # backend — see CLAUDE.md — so never default)
    aa_impl: str = "fused_conv"
    # signal carry layout: "ncl" (torch-like [B, C, T]; oracle paths) |
    # "nlc" (channels-last [B, T, C]) — with conv_impl="gemm" the nlc
    # path measured 563 ms vs 707 ms ncl for the 10 s/B=4 bench geometry
    # on v5e, so it is the default
    layout: str = "nlc"
    # nlc-layout conv lowering: "pallas" (default — the tap-sum inside one
    # Pallas kernel with the fp32 accumulator held in VMEM for C_in
    # 96-384, gemm elsewhere; ops/conv_pallas.py. 10 s/B=4 e2e: 362.6 ms
    # vs 386 gemm vs 527 in r03) | "gemm" (explicit tap-sum of
    # dot_generals — bypasses XLA's 1-D conv emitter, which runs BigVGAN's
    # wide-channel stages at ~5% of matmul peak, but XLA round-trips the
    # fp32 inter-tap partials through HBM) | "xla" (conv_general_dilated)
    conv_impl: str = "pallas"
    # conv operand dtype (fp32 accumulation regardless); the conv stack is
    # compute-bound, bf16 runs it at native MXU rate. Set "float32" for
    # bit-exact parity work.
    compute_dtype: str = "bfloat16"
    # dtype the signal is CARRIED in between ops (activations, residuals,
    # FIR phases). bf16 halves the HBM traffic of the anti-aliased
    # activation chains, which are bandwidth-bound; "float32" for parity.
    carry_dtype: str = "bfloat16"
    # mel analysis (BigVGAN meldataset.get_mel_spectrogram parameters)
    n_fft: int = 1024
    hop_size: int = 256
    win_size: int = 1024
    sampling_rate: int = 24_000
    fmin: int = 0
    fmax: Optional[int] = None


@dataclasses.dataclass(frozen=True)
class SamplerConfig(_JsonMixin):
    """Reverse-diffusion sampling (ref: SpeechGenerator.py:130-164)."""

    num_steps: int = 50                # north-star metric path; ref ran 1000
    kind: str = "ddpm"                 # "ddpm" | "ddim"
    ddim_eta: float = 0.0
    # clamp the implied x0_hat to [-c, c] each reverse step (standard DDPM
    # stabilizer the reference lacks; None = exact reference semantics).
    # Residual eps error is otherwise amplified ~1/sqrt(alpha_t) (~100x)
    # at the first reverse steps of the clipped cosine schedule.
    clip_denoised: Optional[float] = None


@dataclasses.dataclass(frozen=True)
class MeshConfig(_JsonMixin):
    """Device mesh for pjit: data-parallel x model(tensor)-parallel."""

    data: int = 1
    model: int = 1
    axis_names: tuple = ("data", "model")


@dataclasses.dataclass(frozen=True)
class DataConfig(_JsonMixin):
    """MLS dataset paths (ref: Config.py:18-24 — here fully injectable)."""

    train_path: str = ""
    dev_path: str = ""
    test_path: str = ""
    tokenizer: str = "gpt2"            # "gpt2" | "byt5"
    num_workers: int = 0


@dataclasses.dataclass(frozen=True)
class PipelineConfig(_JsonMixin):
    """End-to-end generation pipeline configuration."""

    audio: AudioConfig = dataclasses.field(default_factory=AudioConfig)
    codec: CodecConfig = dataclasses.field(default_factory=CodecConfig)
    nac: NACConfig = dataclasses.field(default_factory=NACConfig)
    slp: SLPConfig = dataclasses.field(default_factory=SLPConfig)
    dit: DiTConfig = dataclasses.field(default_factory=DiTConfig)
    vocoder: VocoderConfig = dataclasses.field(default_factory=VocoderConfig)
    sampler: SamplerConfig = dataclasses.field(default_factory=SamplerConfig)

    def to_json(self) -> str:  # nested dataclasses need custom handling
        return json.dumps(_asdict(self), indent=2, sort_keys=True)

    @classmethod
    def from_json(cls, s: str):
        d = json.loads(s)
        return cls(
            audio=AudioConfig(**d["audio"]),
            codec=CodecConfig(**_tuplify(d["codec"], ("ratios",))),
            nac=NACConfig(**d["nac"]),
            slp=SLPConfig(**d["slp"]),
            dit=DiTConfig(**d["dit"]),
            vocoder=VocoderConfig(**_tuplify(
                d["vocoder"],
                ("upsample_rates", "upsample_kernel_sizes",
                 "resblock_kernel_sizes", "resblock_dilation_sizes"))),
            sampler=SamplerConfig(**d["sampler"]),
        )


def _tuplify(d: dict, keys) -> dict:
    out = dict(d)
    for k in keys:
        if k in out and isinstance(out[k], list):
            out[k] = tuple(tuple(v) if isinstance(v, list) else v for v in out[k])
    return out
