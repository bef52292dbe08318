"""Run the ACTUAL reference implementation for end-to-end parity checks.

This harness imports ``/root/reference/src`` (the PyTorch DiTTo-TTS
reference) and drives its real serving chain —
``SpeechGenerator.generate_speech_from_audio_tensor``
(ref: src/model/SpeechGenerator.py:93-164) — against our JAX pipeline with
the same weights and the same noise stream, producing stage-by-stage
comparisons (encoder latents, refined latents, VQ indices, codec waveform,
mel, final waveform).

Because this environment has no network and no pretrained caches, the
frozen HF models (EnCodec / GPT2 / ByT5) are built seeded-random from their
local configs — the *modeling code* that runs is still HF transformers'
real implementation, and everything the reference repo itself contains
(DiT, DiTTO, NAC, VectorQuantizer, SLP, the sampling loop) runs unmodified
from ``/root/reference/src``. Two packages the reference imports do not
exist here and are stubbed: ``torchaudio`` (only used by the file entry
point, which we don't call) and the NVIDIA ``bigvgan`` vendor package
(vendor dir is empty in the snapshot) — replaced by the architecture-exact
torch stand-in in ``eval.torch_bigvgan``.

Noise matching: the reference draws torch global RNG in a fixed order —
one ``q_sample`` draw, one init draw (skipped when ``cond_by_audio``), then
one per reverse step (ref: SpeechGenerator.py:106-108,130-164).
``utils.torch_bridge.record_reference_noise`` replays that stream for the
JAX side (a fresh ``torch.Generator`` seeded N produces the same stream as
``torch.manual_seed(N)``).
"""

from __future__ import annotations

import contextlib
import os
import sys
import tempfile
import types
from typing import Dict, Optional, Tuple

import numpy as np

from ..core.config import PipelineConfig

REFERENCE_SRC = "/root/reference/src"

_SEED_OFFSETS = {"EncodecModel": 11, "GPT2LMHeadModel": 22,
                 "T5EncoderModel": 33}


def reference_available() -> bool:
    return os.path.isdir(REFERENCE_SRC)


# ---------------------------------------------------------------------------
# import stubs
# ---------------------------------------------------------------------------

def install_reference_stubs() -> None:
    """Make ``import torchaudio`` / ``import bigvgan_v2_...`` resolvable and
    put the reference src tree on sys.path."""
    import importlib.machinery

    from . import torch_bigvgan as tb

    def _mod(name):
        m = types.ModuleType(name)
        # transformers probes importlib.util.find_spec("torchaudio");
        # a module without __spec__ makes that raise instead of answering
        m.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
        return m

    if "torchaudio" not in sys.modules:
        ta = _mod("torchaudio")

        def _unavailable(*a, **k):
            raise RuntimeError("torchaudio is not available in this "
                               "environment (file entry point unsupported)")

        ta.load = _unavailable
        ta.transforms = types.SimpleNamespace(Resample=_unavailable)
        sys.modules["torchaudio"] = ta

    pkg_name = "bigvgan_v2_24khz_100band_256x"
    if pkg_name not in sys.modules:
        pkg = _mod(pkg_name)
        pkg.__path__ = []  # mark as package
        bv = _mod(f"{pkg_name}.bigvgan")
        bv.BigVGAN = tb._modules().BigVGAN
        md = _mod(f"{pkg_name}.meldataset")
        md.get_mel_spectrogram = tb.get_mel_spectrogram
        pkg.bigvgan = bv
        pkg.meldataset = md
        sys.modules[pkg_name] = pkg
        sys.modules[f"{pkg_name}.bigvgan"] = bv
        sys.modules[f"{pkg_name}.meldataset"] = md

    if REFERENCE_SRC not in sys.path:
        sys.path.insert(0, REFERENCE_SRC)


# ---------------------------------------------------------------------------
# offline pretrained-model substitution
# ---------------------------------------------------------------------------

@contextlib.contextmanager
def patched_pretrained(seed: int = 1234, byt5_layers: int = 2):
    """Patch HF ``from_pretrained`` to seeded random-init from local configs.

    EnCodec/GPT2 default configs equal the facebook/encodec_24khz and gpt2
    checkpoints' geometry; ByT5-small geometry is set explicitly (d_model
    1472 is what SLP reads, ref: src/model/SpeechLP.py:18) with a reduced
    layer count (SLP is constructed but never invoked on the parity path).
    Instances are cached so every ``from_pretrained`` call returns the same
    weights, as the real hub download would.
    """
    import torch
    import transformers
    from transformers import (AutoProcessor, AutoTokenizer, EncodecModel,
                              GPT2Config, GPT2LMHeadModel, T5Config,
                              T5EncoderModel)

    cache: Dict = {}

    def build(cls):
        torch.manual_seed(seed + _SEED_OFFSETS[cls.__name__])
        if cls is EncodecModel:
            m = EncodecModel(transformers.EncodecConfig())
            with torch.no_grad():  # codebook buffers init to zeros
                for layer in m.quantizer.layers:
                    layer.codebook.embed.normal_(0.0, 1.0)
        elif cls is GPT2LMHeadModel:
            m = GPT2LMHeadModel(GPT2Config())
        elif cls is T5EncoderModel:
            m = T5EncoderModel(T5Config(
                vocab_size=384, d_model=1472, d_kv=64, d_ff=3584,
                num_layers=byt5_layers, num_heads=6,
                feed_forward_proj="gated-gelu",
                tie_word_embeddings=False, decoder_start_token_id=0))
        else:  # pragma: no cover
            raise KeyError(cls)
        return m.eval()

    patched = [EncodecModel, GPT2LMHeadModel, T5EncoderModel,
               AutoProcessor, AutoTokenizer]
    # from_pretrained is usually inherited (PreTrainedModel); record the
    # class's OWN dict entry (or absence) so restore puts inheritance back.
    saved = {cls: cls.__dict__.get("from_pretrained") for cls in patched}

    def make_fp(cls):
        def fp(klass, *a, **k):
            if cls in (AutoProcessor, AutoTokenizer):
                return None  # only used by the file entry point
            if cls not in cache:
                cache[cls] = build(cls)
            return cache[cls]
        return classmethod(fp)

    try:
        for cls in patched:
            cls.from_pretrained = make_fp(cls)
        yield
    finally:
        for cls, entry in saved.items():
            if entry is None:
                delattr(cls, "from_pretrained")
            else:
                setattr(cls, "from_pretrained", entry)


# ---------------------------------------------------------------------------
# reference construction + capture
# ---------------------------------------------------------------------------

def _attach_captures(gen, caps: Dict) -> None:
    """Wrap the generator's submodule calls to record stage outputs without
    altering behavior (no RNG is consumed by the wrappers)."""
    enc = gen.ditto_model.nac.audio_encoder
    enc_fwd = enc.forward

    def enc_wrap(X, padding_mask_audio=None):
        out = enc_fwd(X, padding_mask_audio)
        caps["enc_latents"] = out[0].detach().numpy().copy()
        return out

    enc.forward = enc_wrap

    q = gen.ditto_model.q_sample

    def q_wrap(x_start, t, noise=None):
        out = q(x_start, t, noise)
        caps["q_in"] = x_start.detach().numpy().copy()
        caps["q_out"] = out.detach().numpy().copy()
        return out

    gen.ditto_model.q_sample = q_wrap

    vq = gen.ditto_model.nac.vector_quantizer
    vq_fwd = vq.forward

    def vq_wrap(latents):
        idx = vq_fwd(latents)
        caps["vq_in"] = latents.detach().numpy().copy()
        caps["vq_idx"] = idx.detach().numpy().copy()
        return idx

    vq.forward = vq_wrap

    dec = gen.ditto_model.nac.audio_decoder
    dec_decode = dec.decode

    def dec_wrap(*a, **k):
        out = dec_decode(*a, **k)
        caps["codec_wav"] = out[0].detach().numpy().copy()
        return out

    dec.decode = dec_wrap

    voc_fwd = gen.vocoder.forward

    def voc_wrap(mel):
        caps["mel"] = mel.detach().numpy().copy()
        out = voc_fwd(mel)
        caps["wav"] = out.detach().numpy().copy()
        return out

    gen.vocoder.forward = voc_wrap


def train_reference_ditto(ditto, *, steps: int, batch: int, frames: int,
                          seed: int, log_every: int = 100) -> None:
    """Train the reference DiTTO in-place with the reference's own training
    semantics (ref: src/TrainDiTTO.py:55-95: t ~ U[0, T), buggy
    ``q_sample`` noising — quirk #1 — and MSE(noise_pred, noise)) on
    synthetic unit-scale latents/text embeddings.

    Purpose: the *tamed-weights* parity leg. With random weights the DDPM
    sampler amplifies latents to ~1e5 scale, where the reference's fp32 VQ
    distance resolution degenerates (see PARITY notes); a few hundred
    training steps give the denoiser enough drift-cancellation that refined
    latents stay at data scale, making the downstream VQ/codec/vocoder
    chain deterministic enough for an allclose comparison.

    Draws from a local ``torch.Generator`` so the global RNG stream the
    parity noise-recording relies on is untouched.
    """
    import torch

    g = torch.Generator()
    g.manual_seed(seed)
    T = len(ditto.alphas_cumprod)
    hidden = ditto.proj_in.in_features
    opt = torch.optim.AdamW(
        [p for p in ditto.parameters() if p.requires_grad], lr=1e-4)
    crit = torch.nn.MSELoss()
    ditto.train()
    for step in range(steps):
        latents = torch.randn(batch, frames, hidden, generator=g)
        text_emb = torch.randn(batch, frames, hidden, generator=g)
        t = torch.randint(0, T, (batch,), generator=g).long()
        noise = torch.randn(batch, frames, hidden, generator=g)
        noisy = ditto.q_sample(latents, t, noise)
        loss = crit(ditto(noisy, text_emb, t), noise)
        opt.zero_grad()
        loss.backward()
        opt.step()
        if log_every and (step % log_every == 0 or step == steps - 1):
            print(f"  [train_reference_ditto] step {step}: "
                  f"loss {loss.item():.4f}", flush=True)
    ditto.eval()


@contextlib.contextmanager
def reference_session(pcfg: PipelineConfig, *, seed: int = 1234,
                      byt5_layers: int = 2,
                      ditto_train: Optional[Dict] = None,
                      ditto_state_cache: Optional[Dict] = None):
    """Build the full reference ``SpeechGenerator`` stack (seeded random
    weights, checkpoints round-tripped through .pth files exactly as the
    reference loads them) and yield ``(gen, caps)``.

    ``pcfg`` supplies the DiT geometry (layers/heads/diffusion_steps) and
    the vocoder config used by the BigVGAN stand-in; the reference's static
    ``ConfigDiTTO``/``ConfigSLP`` attributes are mutated to match for the
    session and restored on exit.

    ``ditto_train``: optional ``{"steps", "batch", "frames", "seed"}`` —
    train the DiTTO via :func:`train_reference_ditto` before checkpointing
    (the tamed-weights parity leg). ``ditto_state_cache``: a mutable dict;
    if it holds ``"state"``, that state_dict replaces init/training; else
    the post-training state_dict is stored there (so two legs share one
    training run).
    """
    import torch
    from . import torch_bigvgan as tb

    install_reference_stubs()
    tb.FROM_PRETRAINED_CONFIG = pcfg.vocoder.replace(
        compute_dtype="float32", carry_dtype="float32")
    tb.FROM_PRETRAINED_SEED = seed + 44

    from utils.Config import ConfigDiTTO, ConfigSLP  # reference module

    saved_cfg = (ConfigDiTTO.DIFFUSION_STEPS, ConfigDiTTO.NUM_LAYERS,
                 ConfigDiTTO.NUM_HEADS)
    ConfigDiTTO.DIFFUSION_STEPS = pcfg.dit.diffusion_steps
    ConfigDiTTO.NUM_LAYERS = pcfg.dit.num_layers
    ConfigDiTTO.NUM_HEADS = pcfg.dit.num_heads

    try:
        with tempfile.TemporaryDirectory() as td, \
                patched_pretrained(seed, byt5_layers):
            from model.DiTTO import DiTTO
            from model.NeuralAudioCodec import NAC
            from model.SpeechGenerator import SpeechGenerator
            from model.SpeechLP import SLP

            nac_path = os.path.join(td, "nac.pth")
            ditto_path = os.path.join(td, "ditto.pth")
            slp_path = os.path.join(td, "slp.pth")

            torch.manual_seed(seed + 1)
            nac = NAC(lambda_factor=0.1)
            torch.save({"model_state_dict": nac.state_dict()}, nac_path)
            del nac

            torch.manual_seed(seed + 2)
            ditto = DiTTO(
                hidden_dim=ConfigDiTTO.HIDDEN_DIM,
                num_layers=pcfg.dit.num_layers,
                num_heads=pcfg.dit.num_heads,
                time_dim=ConfigDiTTO.TIME_DIM,
                text_dim=ConfigDiTTO.TEXT_EMBED_DIM,
                diffusion_steps=pcfg.dit.diffusion_steps,
                lambda_factor=0.1, nac_model_path=nac_path)
            if ditto_state_cache is not None and "state" in ditto_state_cache:
                ditto.load_state_dict(ditto_state_cache["state"])
            elif ditto_train is not None:
                train_reference_ditto(ditto, **ditto_train)
                if ditto_state_cache is not None:
                    ditto_state_cache["state"] = {
                        k: v.detach().clone()
                        for k, v in ditto.state_dict().items()}
            torch.save({"model_state_dict": ditto.state_dict()}, ditto_path)
            del ditto

            torch.manual_seed(seed + 3)
            slp = SLP(ConfigSLP.NB_CLASSES, ConfigSLP.NUM_HEADS,
                      ConfigSLP.NUM_LAYERS)
            torch.save({"model_state_dict": slp.state_dict()}, slp_path)
            del slp

            gen = SpeechGenerator(
                lambda_factor=0.1, nac_model_path=nac_path,
                ditto_model_path=ditto_path, slp_path=slp_path,
                sample_rate=24000, device="cpu")
            caps: Dict = {}
            _attach_captures(gen, caps)
            yield gen, caps
    finally:
        (ConfigDiTTO.DIFFUSION_STEPS, ConfigDiTTO.NUM_LAYERS,
         ConfigDiTTO.NUM_HEADS) = saved_cfg


def run_reference(gen, audio: np.ndarray, padding_mask: np.ndarray,
                  text_ids: np.ndarray, *, seed: int,
                  cond_by_audio: bool = False) -> np.ndarray:
    """Seed torch's global RNG and run the reference serving chain.

    audio: [B, 1, L] float32; padding_mask: [B, L]; text_ids: [B, S] int64.
    Returns the final BigVGAN waveform as numpy.
    """
    import torch

    torch.manual_seed(seed)
    with torch.no_grad():
        wav = gen.generate_speech_from_audio_tensor(
            torch.from_numpy(audio), torch.from_numpy(padding_mask),
            torch.from_numpy(text_ids), is_tokenized=True, is_slp=False,
            cond_by_audio=cond_by_audio)
    return wav.detach().numpy()


# ---------------------------------------------------------------------------
# weight export: reference modules -> our GeneratorParams
# ---------------------------------------------------------------------------

def export_generator_params(gen, pcfg: PipelineConfig):
    """Convert the live reference stack's weights into a GeneratorParams
    pytree via the framework's importers (no re-derivation)."""
    import jax.numpy as jnp

    from ..codec import encodec as codec_mod
    from ..infer.generator import GeneratorParams
    from ..models import dit as dit_mod
    from ..models import vocoder as voc_mod
    from ..text import gpt2 as gpt2_mod

    dsd = {k: v.detach().cpu().numpy()
           for k, v in gen.ditto_model.state_dict().items()}

    def sub(prefix):
        n = len(prefix)
        return {k[n:]: v for k, v in dsd.items() if k.startswith(prefix)}

    vsd = {k: v.detach().cpu().numpy()
           for k, v in gen.vocoder.state_dict().items()}

    return GeneratorParams(
        dit=dit_mod.import_reference_state_dict(dsd, pcfg.dit),
        codec=codec_mod.import_hf_state_dict(sub("nac.audio_decoder."),
                                             pcfg.codec),
        gpt2=gpt2_mod.import_hf_state_dict(sub("nac.language_model."),
                                           gpt2_mod.GPT2Config()),
        embedding_head={"weight": jnp.asarray(
            dsd["nac.audio_encoder.embedding_head.weight"])},
        vector_quantizer={"codebook": jnp.asarray(
            dsd["nac.vector_quantizer.codebook"])},
        vocoder=voc_mod.import_bigvgan_state_dict(vsd, pcfg.vocoder),
    )
