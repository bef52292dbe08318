"""Eval metric + profiling utility tests."""

import numpy as np

import jax
import jax.numpy as jnp

from ditto_tts_tpu.eval.metrics import (cer, cosine_similarity,
                                        edit_distance, mel_mae, wer)
from ditto_tts_tpu.eval.throughput import synthesis_throughput, time_fn
from ditto_tts_tpu.utils.profiling import check_determinism


def test_edit_distance():
    assert edit_distance("kitten", "sitting") == 3
    assert edit_distance("", "abc") == 3
    assert edit_distance("abc", "abc") == 0
    assert edit_distance([1, 2, 3], [1, 3]) == 1


def test_cer_wer():
    refs = ["bonjour le monde", "ca va"]
    hyps = ["bonjour le monde", "ca vu"]
    assert cer(refs, hyps) == 1 / len("bonjour le mondeca va")
    assert wer(refs, hyps) == 1 / 5
    assert cer(refs, refs) == 0.0
    assert wer(refs, refs) == 0.0


def test_mel_mae_zero_for_identical():
    wav = 0.1 * np.random.default_rng(0).standard_normal(24000) \
        .astype(np.float32)
    assert mel_mae(wav, wav) == 0.0
    noisy = wav + 0.01 * np.random.default_rng(1).standard_normal(24000) \
        .astype(np.float32)
    assert mel_mae(wav, noisy) > 0.0


def test_mel_mae_truncates_to_common_length():
    wav = 0.1 * np.random.default_rng(2).standard_normal(30000) \
        .astype(np.float32)
    assert mel_mae(wav[:24000], wav) == 0.0


def test_cosine_similarity():
    a = np.array([1.0, 0.0])
    assert abs(cosine_similarity(a, a) - 1.0) < 1e-9
    assert abs(cosine_similarity(a, np.array([0.0, 1.0]))) < 1e-9


def test_time_fn_and_throughput():
    f = jax.jit(lambda x: x * 2)
    x = jnp.ones((8, 8))
    dt = time_fn(f, x, iters=2)
    assert dt > 0
    out = synthesis_throughput(f, (x,), batch=4, utterance_seconds=10,
                               iters=2)
    assert out["audio_seconds_per_second_per_chip"] > 0
    assert out["rtf"] > 0


def test_check_determinism():
    f = jax.jit(lambda k: jax.random.normal(k, (4,)))
    key = jax.random.key(0)
    assert check_determinism(f, key)

    state = {"n": 0}

    def impure(_):
        state["n"] += 1
        return jnp.asarray(float(state["n"]))

    assert not check_determinism(impure, key)


def test_plot_history(tmp_path):
    from ditto_tts_tpu.eval.plots import plot_history
    hist = {"params": {"model_name": "DiTTO"},
            "train": {"loss": [2.0, 1.5, 1.2], "metrics": [{}] * 3},
            "validation": {"loss": [1.9, 1.6, 1.3], "metrics": [{}] * 3}}
    out = plot_history(hist, str(tmp_path / "curve.png"))
    import os
    assert os.path.exists(out) and os.path.getsize(out) > 1000


def test_asr_leg_produces_text_cer_wer():
    """The full CER/WER leg (ref: Speech2Text.py:13-21 + Experiments.ipynb
    cell 11): waveform -> fbank -> greedy decode -> TEXT hypotheses ->
    text-vs-text CER/WER. Random-init tiny model, placeholder vocab."""
    from ditto_tts_tpu.models import s2t as s2t_mod
    from ditto_tts_tpu.text.s2t_tokenizer import S2TTokenizer

    cfg = s2t_mod.S2TConfig(d_model=16, encoder_layers=1, decoder_layers=1,
                            encoder_heads=2, decoder_heads=2,
                            encoder_ffn=32, decoder_ffn=32, vocab_size=64)
    params = s2t_mod.init_s2t(jax.random.key(0), cfg)
    tok = S2TTokenizer.placeholder(cfg.vocab_size)
    forced_bos = tok.lang_code_to_id["fr"]

    wav16 = 0.05 * np.random.default_rng(0).standard_normal(16000)
    fb = s2t_mod.log_mel_fbank(wav16.astype(np.float32), 16000)[None]
    ids = s2t_mod.greedy_decode(
        params, cfg, jnp.asarray(fb), jnp.ones((1, fb.shape[1]), jnp.int32),
        forced_bos_id=forced_bos, max_len=12)
    hyp = tok.decode(np.asarray(ids)[0])
    assert isinstance(hyp, str)
    assert "<" not in hyp  # specials filtered; words only

    refs = ["bonjour le monde"]
    c, w = cer(refs, [hyp]), wer(refs, [hyp])
    assert np.isfinite(c) and np.isfinite(w) and c >= 0.0 and w >= 0.0
