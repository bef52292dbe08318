"""ctypes bindings for the native C++ data loader (native/dataloader.cc).

Builds on demand via ``make -C native`` (g++ only, no pybind). Provides:
  * decode_wav / resample — direct calls into the library
  * NativeLoader — threaded prefetching batch iterator producing the same
    batch dict as data/mls.py's Python collate (audio, padding_mask, and
    the item indices so callers can attach tokenized text)

Falls back cleanly: ``available()`` is False when the library can't be
built/loaded, and callers should use the pure-Python path.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
from typing import Dict, Iterator, List, Optional, Sequence

import numpy as np

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "native")
_LIB_PATH = os.path.join(_NATIVE_DIR, "libditto_data.so")

_lib = None


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _NATIVE_DIR], capture_output=True,
                       check=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_LIB_PATH) and not _build():
        return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError:
        return None
    lib.loader_create.restype = ctypes.c_void_p
    lib.loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.POINTER(ctypes.c_int), ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint, ctypes.c_int,
        ctypes.c_int]
    lib.loader_next.restype = ctypes.c_int
    lib.loader_next.argtypes = [ctypes.c_void_p,
                                ctypes.POINTER(ctypes.c_float),
                                ctypes.POINTER(ctypes.c_int32),
                                ctypes.POINTER(ctypes.c_int32)]
    lib.loader_reset.argtypes = [ctypes.c_void_p, ctypes.c_uint]
    lib.loader_destroy.argtypes = [ctypes.c_void_p]
    lib.decode_wav_file.restype = ctypes.c_int
    lib.decode_wav_file.argtypes = [ctypes.c_char_p, ctypes.c_int,
                                    ctypes.POINTER(ctypes.c_float),
                                    ctypes.c_int]
    lib.decode_audio_file.restype = ctypes.c_int
    lib.decode_audio_file.argtypes = lib.decode_wav_file.argtypes
    lib.encode_opus_file.restype = ctypes.c_int
    lib.encode_opus_file.argtypes = [ctypes.c_char_p,
                                     ctypes.POINTER(ctypes.c_float),
                                     ctypes.c_long, ctypes.c_int]
    lib.opus_available.restype = ctypes.c_int
    lib.resample_f32.restype = ctypes.c_int
    lib.resample_f32.argtypes = [ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int, ctypes.c_int, ctypes.c_int,
                                 ctypes.POINTER(ctypes.c_float),
                                 ctypes.c_int]
    _lib = lib
    return lib


def available() -> bool:
    return _load() is not None


def decode_wav(path: str, target_rate: int = 24000,
               max_seconds: float = 60.0) -> np.ndarray:
    return decode_audio(path, target_rate, max_seconds)


def decode_audio(path: str, target_rate: int = 24000,
                 max_seconds: float = 60.0) -> np.ndarray:
    """Decode WAV or Ogg-Opus (dispatch by magic bytes) to mono float at
    target_rate — the torchaudio-free MLS decode path (ref: MLS.py:58-61)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    buf = np.zeros(int(target_rate * max_seconds), np.float32)
    n = lib.decode_audio_file(
        path.encode(), target_rate,
        buf.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(buf))
    if n < 0:
        raise ValueError(f"decode_audio failed ({n}) for {path}")
    return buf[:n].copy()


def opus_available() -> bool:
    lib = _load()
    return lib is not None and bool(lib.opus_available())


def encode_opus(path: str, pcm: np.ndarray, sample_rate: int) -> None:
    """Write mono float pcm as an Ogg-Opus file via the system libopus
    (fixture generation + the ffmpeg-free transcode tool)."""
    lib = _load()
    assert lib is not None, "native loader unavailable"
    pcm = np.ascontiguousarray(pcm, np.float32)
    rc = lib.encode_opus_file(
        path.encode(), pcm.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        len(pcm), sample_rate)
    if rc != 0:
        raise ValueError(f"encode_opus failed ({rc}) for {path}")


def resample(x: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    lib = _load()
    assert lib is not None, "native loader unavailable"
    x = np.ascontiguousarray(x, np.float32)
    n_out = int(len(x) * rate_out / rate_in) + 16
    out = np.zeros(n_out, np.float32)
    n = lib.resample_f32(
        x.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), len(x),
        rate_in, rate_out,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)), n_out)
    return out[:n].copy()


class NativeLoader:
    """Threaded prefetching batch iterator over WAV files."""

    def __init__(self, paths: Sequence[str], *, sample_rate: int = 24000,
                 batch_size: int = 4, buckets: Sequence[int],
                 workers: int = 4, queue_depth: int = 4, seed: int = 0,
                 shuffle: bool = True, drop_remainder: bool = True):
        lib = _load()
        assert lib is not None, "native loader unavailable"
        self._lib = lib
        self.batch_size = batch_size
        self.buckets = sorted(buckets)
        self._paths = [p.encode() for p in paths]
        arr = (ctypes.c_char_p * len(self._paths))(*self._paths)
        barr = (ctypes.c_int * len(self.buckets))(*self.buckets)
        self._h = lib.loader_create(
            arr, len(self._paths), sample_rate, batch_size, barr,
            len(self.buckets), workers, queue_depth, seed, int(shuffle),
            int(drop_remainder))
        self._audio = np.zeros((batch_size, self.buckets[-1]), np.float32)
        self._mask = np.zeros((batch_size, self.buckets[-1]), np.int32)
        self._idx = np.zeros((batch_size,), np.int32)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        while True:
            bucket = self._lib.loader_next(
                self._h,
                self._audio.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                self._mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                self._idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
            if bucket == 0:
                return
            rows = int((self._idx >= 0).sum())
            flat_a = self._audio.ravel()[:rows * bucket]
            flat_m = self._mask.ravel()[:rows * bucket]
            yield {
                "audio": flat_a.reshape(rows, 1, bucket).copy(),
                "padding_mask": flat_m.reshape(rows, bucket).copy(),
                "indices": self._idx[:rows].copy(),
            }

    def reset(self, seed: int = 0):
        self._lib.loader_reset(self._h, seed)

    def close(self):
        if self._h:
            self._lib.loader_destroy(self._h)
            self._h = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
