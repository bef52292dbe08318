"""Latent-cache tests (data/latents.py): the cached path must be
bit-identical to encoding the same audio batch directly, and the train
step must accept latent batches."""

import os
import wave

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.core.config import CodecConfig, DiTConfig, NACConfig
from ditto_tts_tpu.data import latents as lat_mod
from ditto_tts_tpu.data.mls import MLSDataset, collate
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod
from ditto_tts_tpu.text.tokenizers import ByT5Tokenizer
from ditto_tts_tpu.train import steps as steps_mod

SR = 2400
BUCKETS = (1600, 3200)
HID = 12
CODEC_CFG = CodecConfig(num_filters=4, dimension=8, ratios=(2, 2, 2),
                        codebook_size=16, num_quantizers=4, lstm_layers=1)
DIT_CFG = DiTConfig(hidden_dim=HID, num_layers=1, num_heads=2, time_dim=8,
                    text_dim=HID, diffusion_steps=10, max_token_length=24)
GPT2_CFG = gpt2_mod.GPT2Config(vocab_size=512, n_positions=256, n_embd=HID,
                               n_layer=1, n_head=2)


def _write_wav(path, seconds, freq):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = np.arange(int(seconds * SR)) / SR
    pcm = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(SR)
        f.writeframes(pcm.tobytes())


@pytest.fixture()
def corpus(tmp_path):
    # 4 short-bucket + 2 long-bucket clips (WAV bytes under .opus names;
    # decode_audio sniffs magic). sample_rate=SR keeps the tiny-codec
    # LSTM sequence short.
    root = tmp_path / "mls"
    durations = [0.5, 0.55, 0.6, 0.62, 1.1, 1.2]
    lines = []
    for i, secs in enumerate(durations):
        utt = f"10{i}_20{i}_000000"
        _write_wav(str(root / "audio_clean" / f"10{i}" / f"20{i}" /
                       f"{utt}.opus"), secs, 150.0 + 40 * i)
        lines.append(f"{utt}\thello world {i}")
    (root / "transcripts.txt").write_text("\n".join(lines), encoding="utf-8")
    return str(root)


def _fixtures(corpus):
    ds = MLSDataset(corpus, ByT5Tokenizer(), DIT_CFG.max_token_length,
                    sample_rate=SR, tokenizer_name="byt5",
                    strict_duration=False)
    keys = jax.random.split(jax.random.key(0), 4)
    frozen = {
        "codec": codec_mod.init_codec(keys[0], CODEC_CFG),
        "gpt2": gpt2_mod.init_gpt2(keys[1], GPT2_CFG),
        "embedding_head": nac_mod.init_nac_trainable(
            keys[2], NACConfig(hidden_size=HID,
                               codebook_size=16))["embedding_head"],
    }
    return ds, frozen, keys[3]


def test_cached_batch_matches_direct_encode(corpus, tmp_path):
    ds, frozen, _ = _fixtures(corpus)
    cache = str(tmp_path / "lat")
    index = lat_mod.precompute(ds, frozen, CODEC_CFG, cache_dir=cache,
                               batch_size=2, buckets=BUCKETS,
                               encode_dtype="float32")
    assert index["n_items"] == len(ds) == 6
    encode = lat_mod.make_encode_fn(CODEC_CFG, "float32")

    seen = set()
    for b in lat_mod.latent_batches(cache, ds, 2, shuffle=True, seed=3):
        idxs = list(b["indices"])
        seen.update(idxs)
        # members of one batch always share a bucket
        audio = collate([ds[i] for i in idxs], BUCKETS)
        direct = np.asarray(encode(frozen, jnp.asarray(audio["audio"]),
                                   jnp.asarray(audio["padding_mask"])))
        np.testing.assert_array_equal(b["latents"], direct)
        np.testing.assert_array_equal(
            b["text_ids"], audio["text_ids"])
        np.testing.assert_array_equal(b["label"], audio["label"])
    assert seen == set(range(6))

    # re-precompute is a no-op (index short-circuit)
    again = lat_mod.precompute(ds, frozen, CODEC_CFG, cache_dir=cache,
                               batch_size=2, buckets=BUCKETS)
    assert again["n_items"] == 6


def test_train_step_accepts_latent_batch(corpus, tmp_path):
    ds, frozen, key = _fixtures(corpus)
    cache = str(tmp_path / "lat")
    lat_mod.precompute(ds, frozen, CODEC_CFG, cache_dir=cache,
                       batch_size=2, buckets=BUCKETS,
                       encode_dtype="float32")
    init_state, step_fn, eval_fn = steps_mod.build_ditto_train_step(
        DIT_CFG, CODEC_CFG, GPT2_CFG, learning_rate=1e-3)
    state = init_state(dit_mod.init_ditto(key, DIT_CFG))

    batch = next(iter(lat_mod.latent_batches(cache, ds, 2, shuffle=False)))
    idxs = list(batch["indices"])
    audio_batch = collate([ds[i] for i in idxs], BUCKETS)

    # same key, same members: cached-latent loss == audio-encode loss
    k = jax.random.key(5)
    lat_loss = float(eval_fn(state, frozen,
                             {k2: jnp.asarray(v)
                              for k2, v in batch.items()}, k)["loss"])
    aud_loss = float(eval_fn(state, frozen,
                             {k2: jnp.asarray(v)
                              for k2, v in audio_batch.items()}, k)["loss"])
    np.testing.assert_allclose(lat_loss, aud_loss, rtol=1e-5)

    # and a full optimizer step runs from the latent batch
    state2, m = jax.jit(step_fn)(state, frozen,
                                 {k2: jnp.asarray(v)
                                  for k2, v in batch.items()}, k)
    assert np.isfinite(float(m["loss"])) and int(state2["step"]) == 1
