"""Evaluation metrics: mel-MAE, CER/WER, speaker-similarity hooks.

Capability parity with the reference evaluation (ref: src/Experiments.ipynb
cells 10-15 — CER/WER via HF ``evaluate`` + Speech2Text ASR, SIM-o/SIM-r
via speechbrain ECAPA cosine):

  * CER/WER are computed directly (Levenshtein over chars/words — no HF
    ``evaluate`` dependency); identical definition: edit_distance / len(ref).
  * mel-MAE is the repo's north-star quality metric vs the reference
    (BASELINE.json): mean |logmel_a - logmel_b| over aligned frames.
  * ASR and speaker-embedding backends are pluggable callables so the
    heavyweight frozen models (S2T, ECAPA) can be supplied from HF torch
    checkpoints when available, without making them a core dependency.
"""

from __future__ import annotations

from typing import Callable, List, Optional, Sequence, Tuple

import numpy as np

import jax.numpy as jnp


# ---------------------------------------------------------------------------
# text metrics
# ---------------------------------------------------------------------------

def edit_distance(a: Sequence, b: Sequence) -> int:
    """Levenshtein distance (iterative two-row DP)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def cer(references: Sequence[str], hypotheses: Sequence[str]) -> float:
    """Character error rate: sum(edit) / sum(len(ref))."""
    edits = sum(edit_distance(r, h) for r, h in zip(references, hypotheses))
    total = sum(len(r) for r in references)
    return edits / max(total, 1)


def wer(references: Sequence[str], hypotheses: Sequence[str]) -> float:
    """Word error rate over whitespace tokens."""
    edits = sum(edit_distance(r.split(), h.split())
                for r, h in zip(references, hypotheses))
    total = sum(len(r.split()) for r in references)
    return edits / max(total, 1)


# ---------------------------------------------------------------------------
# audio metrics
# ---------------------------------------------------------------------------

def mel_mae(wav_a, wav_b, *, sample_rate: int = 24000) -> float:
    """Mean absolute error between log-mel spectrograms (BigVGAN analysis
    chain), truncated to the common length. The north-star quality metric
    vs the reference (BASELINE.json)."""
    from ..ops.mel import get_mel_spectrogram

    wav_a = jnp.atleast_2d(jnp.asarray(wav_a))
    wav_b = jnp.atleast_2d(jnp.asarray(wav_b))
    n = min(wav_a.shape[-1], wav_b.shape[-1])
    mel_a = get_mel_spectrogram(wav_a[..., :n], sample_rate=sample_rate)
    mel_b = get_mel_spectrogram(wav_b[..., :n], sample_rate=sample_rate)
    return float(jnp.mean(jnp.abs(mel_a - mel_b)))


def cosine_similarity(emb_a, emb_b) -> float:
    a = np.asarray(emb_a, np.float64).ravel()
    b = np.asarray(emb_b, np.float64).ravel()
    return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b) + 1e-12))


# ---------------------------------------------------------------------------
# pluggable-model evaluation loops (ref Experiments.ipynb cells 11, 14)
# ---------------------------------------------------------------------------

def cer_wer_on_pairs(asr: Callable[[np.ndarray], str],
                     pairs: Sequence[Tuple[np.ndarray, str]]
                     ) -> Tuple[float, float]:
    """asr(waveform) -> transcript; pairs of (generated_wav, reference_text).

    Note the reference feeds 24 kHz audio to a 16 kHz ASR without resampling
    (quirk #11); callers here should resample inside ``asr`` — the hook
    owns its preprocessing.
    """
    refs, hyps = [], []
    for wav, text in pairs:
        refs.append(text)
        hyps.append(asr(wav))
    return cer(refs, hyps), wer(refs, hyps)


def sim_o_sim_r(embed: Callable[[np.ndarray], np.ndarray],
                generated: Sequence[np.ndarray],
                originals: Sequence[np.ndarray],
                reconstructed: Sequence[np.ndarray]
                ) -> Tuple[float, float]:
    """SIM-o / SIM-r: cosine(gen, original) and cosine(gen, codec-recon)
    averaged over utterances (ref Experiments.ipynb cell 14)."""
    sims_o, sims_r = [], []
    for g, o, r in zip(generated, originals, reconstructed):
        eg = embed(g)
        sims_o.append(cosine_similarity(eg, embed(o)))
        sims_r.append(cosine_similarity(eg, embed(r)))
    return float(np.mean(sims_o)), float(np.mean(sims_r))


def make_hf_s2t_asr(model_name: str = "facebook/s2t-medium-mustc-multilingual-st",
                    target_lang: str = "fr",
                    sample_rate_in: int = 24000) -> Optional[Callable]:
    """Optional torch-backed ASR hook (the reference's Speech2Text,
    ref src/model/Speech2Text.py:5-21, with the quirk-#11 resample fixed).
    Returns None if the model can't be loaded (e.g. no network)."""
    try:
        import torch
        from transformers import (Speech2TextForConditionalGeneration,
                                  Speech2TextProcessor)
        model = Speech2TextForConditionalGeneration.from_pretrained(
            model_name).eval()
        processor = Speech2TextProcessor.from_pretrained(model_name)
    except Exception:
        return None

    def asr(wav: np.ndarray) -> str:
        wav = np.asarray(wav, np.float32).ravel()
        # resample 24k -> 16k (polyphase via numpy; ASR-side prep)
        idx = np.arange(0, len(wav), sample_rate_in / 16000.0)
        wav16 = np.interp(idx, np.arange(len(wav)), wav)
        inputs = processor(wav16, sampling_rate=16000, return_tensors="pt")
        ids = model.generate(
            inputs["input_features"],
            attention_mask=inputs["attention_mask"],
            forced_bos_token_id=processor.tokenizer.lang_code_to_id[
                target_lang])
        return processor.batch_decode(ids, skip_special_tokens=True)[0]

    return asr
