"""Host-side audio preprocessing utilities.

Capability parity with the reference preprocessing (ref: src/utils/
Processing.py:5-44 — strips opus metadata via ``ffmpeg -map_metadata -1 -c
copy`` per file) plus decode to float32 PCM since torchaudio/soundfile are
not part of this stack. Decode prefers the native loader (WAV + Ogg-Opus
via the system libopus, no ffmpeg binary needed — native/opus_codec.cc)
and falls back to the ffmpeg CLI for other containers when present.
"""

from __future__ import annotations

import os
import subprocess
from typing import Optional, Tuple

import numpy as np


def ffmpeg_available() -> bool:
    try:
        subprocess.run(["ffmpeg", "-version"], capture_output=True,
                       check=True)
        return True
    except (OSError, subprocess.CalledProcessError):
        return False


def decode_audio(path: str, sample_rate: int = 24000) -> np.ndarray:
    """Decode an audio file to mono float32 at sample_rate.

    WAV and Ogg-Opus (the MLS corpus format, ref: MLS.py:97-104) go through
    the native loader — no ffmpeg required; anything else falls back to the
    ffmpeg CLI when available."""
    from . import native_loader as nl
    if nl.available():
        head = open(path, "rb").read(4)
        if head == b"RIFF" or (head == b"OggS" and nl.opus_available()):
            return nl.decode_audio(path, sample_rate)
    cmd = ["ffmpeg", "-v", "error", "-i", path, "-f", "f32le", "-ac", "1",
           "-ar", str(sample_rate), "pipe:1"]
    out = subprocess.run(cmd, capture_output=True, check=True).stdout
    return np.frombuffer(out, np.float32).copy()


def remove_metadata_from_audio_folder(folder: str,
                                      suffix: str = ".opus") -> int:
    """Strip metadata in place via ffmpeg stream copy (ref Processing.py:
    27-36 semantics: per-file, errors logged and skipped)."""
    count = 0
    for root, _, files in os.walk(folder):
        for name in files:
            if not name.endswith(suffix):
                continue
            src = os.path.join(root, name)
            tmp = src + ".tmp" + suffix
            try:
                subprocess.run(
                    ["ffmpeg", "-v", "error", "-y", "-i", src,
                     "-map_metadata", "-1", "-c", "copy", tmp],
                    capture_output=True, check=True)
                os.replace(tmp, src)
                count += 1
            except (OSError, subprocess.CalledProcessError) as e:
                if os.path.exists(tmp):
                    os.remove(tmp)
                print(f"[processing] skipped {src}: {e}")
    return count
