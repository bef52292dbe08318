"""MLS dataset tests with a synthetic on-disk corpus of REAL .opus files
(encoded via the native libopus path; WAV-content fallback otherwise)."""

import json
import os
import wave

import numpy as np
import pytest

from ditto_tts_tpu.data import native_loader as nl
from ditto_tts_tpu.data.mls import (MLSDataset, batches, bucket_for,
                                    collate, default_buckets)
from ditto_tts_tpu.data.processing import decode_audio, ffmpeg_available
from ditto_tts_tpu.text.tokenizers import ByT5Tokenizer

_opus_ok = nl.available() and nl.opus_available()
needs_decoder = pytest.mark.skipif(not (_opus_ok or ffmpeg_available()),
                                   reason="no opus decoder available")
# kept for back-compat with older test ids
needs_ffmpeg = needs_decoder


def _write_wav(path, seconds, sr=24000, freq=220.0):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    t = np.arange(int(seconds * sr)) / sr
    pcm = (0.3 * np.sin(2 * np.pi * freq * t) * 32767).astype(np.int16)
    with wave.open(path, "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(2)
        f.setframerate(sr)
        f.writeframes(pcm.tobytes())


def _write_clip(path, seconds, sr=24000, freq=220.0):
    """A real Ogg-Opus clip when libopus is present (the MLS corpus format,
    ref: MLS.py:97-104); WAV content under .opus otherwise (decode sniffs
    magic bytes either way)."""
    if _opus_ok:
        os.makedirs(os.path.dirname(path), exist_ok=True)
        t = np.arange(int(seconds * sr)) / sr
        pcm = (0.3 * np.sin(2 * np.pi * freq * t)).astype(np.float32)
        nl.encode_opus(path, pcm, sr)
    else:
        _write_wav(path, seconds, sr, freq)


@pytest.fixture()
def corpus(tmp_path):
    root = tmp_path / "mls"
    lines = []
    for i, secs in enumerate([10.5, 12.0, 19.0]):
        utt = f"100{i}_200{i}_000000"
        path = root / "audio_clean" / f"100{i}" / f"200{i}" / f"{utt}.opus"
        _write_clip(str(path), secs)
        lines.append(f"{utt}\tbonjour le monde numero {i}")
    (root / "transcripts.txt").write_text("\n".join(lines), encoding="utf-8")
    return str(root)


def test_buckets():
    b = default_buckets(num=3)
    assert b == (240000, 360000, 480000)
    assert bucket_for(250000, b) == 360000
    assert bucket_for(999999, b) == 480000


@needs_ffmpeg
def test_decode_audio_rate_and_length(corpus):
    path = os.path.join(corpus, "audio_clean", "1000", "2000",
                        "1000_2000_000000.opus")
    wav = decode_audio(path, 24000)
    assert abs(len(wav) / 24000 - 10.5) < 0.05
    assert wav.dtype == np.float32


@needs_ffmpeg
def test_dataset_manifest_and_items(corpus):
    ds = MLSDataset(corpus, ByT5Tokenizer(), 32, tokenizer_name="byt5")
    assert len(ds) == 3
    item = ds[0]
    assert item["text_ids"].shape == (32,)
    assert 0 <= int(item["label"]) <= 10
    # cache file written
    assert os.path.exists(os.path.join(corpus, "tokenized_byt5_32.json"))
    # cache reload path
    ds2 = MLSDataset(corpus, ByT5Tokenizer(), 32, tokenizer_name="byt5")
    assert len(ds2) == 3


@needs_ffmpeg
def test_dataset_sharding(corpus):
    ds0 = MLSDataset(corpus, ByT5Tokenizer(), 16, tokenizer_name="byt5",
                     shard_index=0, num_shards=2)
    ds1 = MLSDataset(corpus, ByT5Tokenizer(), 16, tokenizer_name="byt5",
                     shard_index=1, num_shards=2)
    assert len(ds0) + len(ds1) == 3
    assert len(ds0) == 2 and len(ds1) == 1


@needs_ffmpeg
def test_collate_mask_semantics(corpus):
    """Corrected quirk #6: padded samples are INVALID (0) in the mask."""
    ds = MLSDataset(corpus, ByT5Tokenizer(), 16, tokenizer_name="byt5")
    items = [ds[0], ds[2]]  # 10.5s and 19s
    buckets = default_buckets()
    out = collate(items, buckets)
    assert out["audio"].shape == out["padding_mask"].shape[:1] + (1,) + \
        out["padding_mask"].shape[1:]
    n0 = len(items[0]["audio"])
    assert out["padding_mask"][0, :n0].all()
    assert not out["padding_mask"][0, n0:].any()
    # bucketed to a canonical length
    assert out["audio"].shape[-1] in buckets


@needs_ffmpeg
def test_batches_iterator(corpus):
    ds = MLSDataset(corpus, ByT5Tokenizer(), 16, tokenizer_name="byt5")
    got = list(batches(ds, 2, buckets=default_buckets(), seed=1))
    assert len(got) == 1  # drop_remainder
    assert got[0]["audio"].shape[0] == 2
    assert got[0]["label"].shape == (2,)
