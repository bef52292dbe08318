"""Native C++ data loader tests (built on demand with g++)."""

import os
import wave

import numpy as np
import pytest

from ditto_tts_tpu.data import native_loader as nl

pytestmark = pytest.mark.skipif(not nl.available(),
                                reason="native loader unavailable (no g++?)")


def _write_wav(path, samples, sr, sampwidth=2):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with wave.open(str(path), "wb") as f:
        f.setnchannels(1)
        f.setsampwidth(sampwidth)
        f.setframerate(sr)
        if sampwidth == 2:
            f.writeframes((np.clip(samples, -1, 1) * 32767)
                          .astype(np.int16).tobytes())
        else:
            raise ValueError(sampwidth)


def test_decode_wav_pcm16(tmp_path):
    sr = 24000
    t = np.arange(sr) / sr
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    p = tmp_path / "a.wav"
    _write_wav(p, sig, sr)
    got = nl.decode_wav(str(p), sr)
    assert len(got) == sr
    np.testing.assert_allclose(got, sig, atol=1e-3)


def test_decode_wav_resamples(tmp_path):
    sr_in = 16000
    t = np.arange(sr_in) / sr_in
    sig = 0.5 * np.sin(2 * np.pi * 200 * t)
    p = tmp_path / "b.wav"
    _write_wav(p, sig, sr_in)
    got = nl.decode_wav(str(p), 24000)
    assert abs(len(got) - 24000) <= 2
    # passband sine preserved
    t2 = np.arange(len(got)) / 24000.0
    want = 0.5 * np.sin(2 * np.pi * 200 * t2)
    err = np.abs(got[200:-200] - want[200:-200]).max()
    assert err < 0.01, err


def test_resample_identity():
    x = np.random.default_rng(0).standard_normal(1000).astype(np.float32)
    y = nl.resample(x, 24000, 24000)
    np.testing.assert_array_equal(x, y)


def test_resample_downsample_sine():
    sr = 48000
    t = np.arange(sr) / sr
    x = np.sin(2 * np.pi * 1000 * t).astype(np.float32)
    y = nl.resample(x, sr, 24000)
    assert abs(len(y) - 24000) <= 2
    t2 = np.arange(len(y)) / 24000.0
    want = np.sin(2 * np.pi * 1000 * t2)
    err = np.abs(y[300:-300] - want[300:len(y) - 300]).max()
    assert err < 0.01, err


@pytest.fixture()
def wav_corpus(tmp_path):
    sr = 24000
    paths = []
    for i, secs in enumerate([0.5, 0.8, 1.1, 0.6, 0.9]):
        t = np.arange(int(secs * sr)) / sr
        sig = 0.3 * np.sin(2 * np.pi * (100 + 50 * i) * t)
        p = tmp_path / f"utt{i}.wav"
        _write_wav(p, sig, sr)
        paths.append(str(p))
    return paths


def test_native_loader_batches(wav_corpus):
    buckets = [int(0.6 * 24000), int(0.9 * 24000), int(1.2 * 24000)]
    loader = nl.NativeLoader(wav_corpus, batch_size=2, buckets=buckets,
                             workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 2  # 5 items, batch 2, drop_remainder
    seen = set()
    for b in batches:
        assert b["audio"].shape[0] == 2
        assert b["audio"].shape[2] in buckets
        assert b["padding_mask"].shape == (2, b["audio"].shape[2])
        # mask marks valid samples then zeros
        for r in range(2):
            n = int(b["padding_mask"][r].sum())
            assert n > 0
            assert b["padding_mask"][r, :n].all()
            assert not b["padding_mask"][r, n:].any()
            assert np.abs(b["audio"][r, 0, n:]).max() == 0.0
        seen.update(b["indices"].tolist())
    assert len(seen) == 4  # four distinct items across two batches
    loader.close()


def test_native_loader_reset_reshuffles(wav_corpus):
    buckets = [int(1.2 * 24000)]
    loader = nl.NativeLoader(wav_corpus, batch_size=2, buckets=buckets,
                             workers=1, seed=1)
    first = [tuple(b["indices"]) for b in loader]
    loader.reset(seed=2)
    second = [tuple(b["indices"]) for b in loader]
    assert len(first) == len(second) == 2
    loader.close()


class TestOpus:
    """Ogg-Opus decode without ffmpeg/torchaudio (ref: MLS.py:58-61).

    Fixtures are fabricated in-process: libopus encode + hand-rolled Ogg
    mux, then decoded back through the loader's generic audio path."""

    def _sine(self, seconds=1.0, sr=24000, f=440.0):
        t = np.arange(int(seconds * sr)) / sr
        return (0.5 * np.sin(2 * np.pi * f * t)).astype(np.float32)

    def test_opus_roundtrip_24k(self, tmp_path):
        nl = pytest.importorskip("ditto_tts_tpu.data.native_loader")
        if not (nl.available() and nl.opus_available()):
            pytest.skip("libopus not available")
        pcm = self._sine()
        path = str(tmp_path / "tone.opus")
        nl.encode_opus(path, pcm, 24000)
        out = nl.decode_audio(path, 24000)
        # lossy codec: assert length and strong waveform correlation after
        # the codec's algorithmic delay settles
        assert abs(len(out) - len(pcm)) <= 240  # within 10 ms
        n = min(len(out), len(pcm)) - 2400
        a, b = pcm[2400:n], out[2400:n]
        # align by cross-correlation (codec delay)
        lag = int(np.argmax(np.correlate(b[:4800], a[:2400], "valid")))
        a2 = a[: len(a) - lag]
        b2 = b[lag: lag + len(a2)]
        corr = np.corrcoef(a2, b2)[0, 1]
        assert corr > 0.97, corr

    def test_opus_resampled_decode(self, tmp_path):
        nl = pytest.importorskip("ditto_tts_tpu.data.native_loader")
        if not (nl.available() and nl.opus_available()):
            pytest.skip("libopus not available")
        pcm = self._sine(0.5, sr=48000)
        path = str(tmp_path / "tone48.opus")
        nl.encode_opus(path, pcm, 48000)
        out = nl.decode_audio(path, 22050)  # not opus-native -> resample
        assert abs(len(out) - int(0.5 * 22050)) <= 220

    def test_native_loader_batches_opus(self, tmp_path):
        nl = pytest.importorskip("ditto_tts_tpu.data.native_loader")
        if not (nl.available() and nl.opus_available()):
            pytest.skip("libopus not available")
        paths = []
        for i in range(4):
            p = str(tmp_path / f"u{i}.opus")
            nl.encode_opus(p, self._sine(0.3 + 0.1 * i), 24000)
            paths.append(p)
        loader = nl.NativeLoader(paths, sample_rate=24000, batch_size=2,
                                 buckets=[24000], workers=2, shuffle=False)
        batches = list(loader)
        assert len(batches) == 2
        for b in batches:
            assert b["audio"].shape == (2, 1, 24000)
            assert b["padding_mask"].sum() > 0
