"""Generate a synthetic MLS-layout corpus (opus or wav) for training
demos and loader benchmarks.

Each utterance is a few-component harmonic chirp with per-utterance
fundamental/sweep/AM parameters and a pseudo-French transcript, written
in the MLS directory layout (audio_clean/<spk>/<book>/<utt>.<ext> +
transcripts.txt) that data/mls.py:MLSDataset expects (ref MLS layout:
src/utils/Dataset.py:15-40).

  python scripts/make_synth_corpus.py --out /tmp/synth_mls --n 1000 \
      --format opus --min-s 10 --max-s 20
"""

import argparse
import os
import sys
import wave

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

WORDS = ("le la un une de et dans sur avec pour mer ciel jour nuit temps "
         "monde ville eau feu terre vent chant voix route pierre arbre "
         "fleur soleil lune pluie neige or fer bois verre pain vin sel "
         "nord sud est ouest grand petit beau clair sombre vite lent").split()


def make_utterance(rng, sr, seconds):
    n = int(seconds * sr)
    t = np.arange(n) / sr
    f0 = rng.uniform(80, 400)
    sweep = rng.uniform(-0.3, 0.6)
    f_inst = f0 * (1.0 + sweep * t / seconds)
    phase = 2 * np.pi * np.cumsum(f_inst) / sr
    pcm = np.zeros(n, np.float32)
    for h, amp in enumerate(rng.dirichlet(np.ones(4)) * 0.5, start=1):
        pcm += (amp * np.sin(h * phase)).astype(np.float32)
    am = 1.0 + 0.4 * np.sin(2 * np.pi * rng.uniform(1.5, 5.0) * t)
    pcm = (pcm * am).astype(np.float32)
    pcm += rng.normal(0, 0.01, n).astype(np.float32)
    peak = np.abs(pcm).max()
    return (0.7 * pcm / max(peak, 1e-6)).astype(np.float32)


def write_wav(path, pcm, sr):
    with wave.open(path, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(sr)
        w.writeframes((np.clip(pcm, -1, 1) * 32767).astype("<i2").tobytes())


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--n", type=int, default=1000)
    ap.add_argument("--format", choices=("opus", "wav"), default="opus")
    ap.add_argument("--min-s", type=float, default=10.0)
    ap.add_argument("--max-s", type=float, default=20.0)
    ap.add_argument("--sample-rate", type=int, default=24000)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    if args.format == "opus":
        from ditto_tts_tpu.data import native_loader as nl
        assert nl.opus_available(), "libopus unavailable"

    rng = np.random.default_rng(args.seed)
    os.makedirs(args.out, exist_ok=True)
    lines = []
    for i in range(args.n):
        spk, book = 1000 + i % 37, 2000 + (i // 37) % 53
        utt = f"{spk}_{book}_{i:06d}"
        d = os.path.join(args.out, "audio_clean", str(spk), str(book))
        os.makedirs(d, exist_ok=True)
        secs = float(rng.uniform(args.min_s, args.max_s))
        pcm = make_utterance(rng, args.sample_rate, secs)
        path = os.path.join(d, f"{utt}.{args.format}")
        if args.format == "opus":
            from ditto_tts_tpu.data import native_loader as nl
            nl.encode_opus(path, pcm, args.sample_rate)
        else:
            write_wav(path, pcm, args.sample_rate)
        text = " ".join(rng.choice(WORDS,
                                   size=rng.integers(12, 40)).tolist())
        lines.append(f"{utt}\t{text}")
        if (i + 1) % 100 == 0:
            print(f"{i + 1}/{args.n}", flush=True)
    with open(os.path.join(args.out, "transcripts.txt"), "w") as f:
        f.write("\n".join(lines))
    print(f"wrote {args.n} {args.format} utterances under {args.out}")


if __name__ == "__main__":
    main()
