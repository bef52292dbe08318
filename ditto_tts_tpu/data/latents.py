"""One-shot frozen-latent precompute + cached-latent batch iterator.

The DiTTo train step spends ~45 ms of a 186 ms step (B=8, 10 s bucket,
TRAIN_BENCH_r05) re-running the FROZEN EnCodec encode + embedding-head
gather + channel mean on every batch — a pure function of the audio whose
output never changes across epochs (ref re-encodes every step,
src/TrainDiTTO.py:67-73; nothing in the reference caches it).  This module
computes each utterance's channel-meaned latents ONCE, stores them in
per-bucket memmaps, and serves latent batches directly; the train step
(train/steps.py encode_batch) sees ``batch["latents"]`` and skips the
encode.

Exactness: every utterance is encoded padded to ITS OWN duration bucket
(data/mls.py bucket_for), and ``latent_batches`` only groups same-bucket
utterances — so a cached batch is bit-identical to encoding that batch of
audio directly (the audio path pads a batch to its LONGEST member's
bucket, which for same-bucket members is the same array).  Same-bucket
batching is itself the common case for the audio path's length-sorted
shuffle windows.

Storage: fp32 [n, T_bucket, H] per bucket (~2.2 MB per 10 s utterance at
H=768 — comparable to the 24 kHz fp32 waveform) under ``cache_dir``, plus
an ``index.json`` mapping dataset indices to (bucket, row).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Iterator, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import CodecConfig
from ..models import nac as nac_mod
from .mls import MLSDataset, bucket_for, default_buckets

_INDEX = "index.json"


def make_encode_fn(codec_cfg: CodecConfig, encode_dtype: str = "bfloat16"):
    """Jitted (frozen, audio [B,1,L], mask [B,L]) -> fp32 [B, T, H].

    Same math as train/steps.py encode_batch's audio branch: frozen codec
    encode -> embedding-head gather -> channel mean (ref
    TrainDiTTO.py:67-73).  ``encode_dtype="bfloat16"`` matches the
    production train variant (fp32 conv accumulation inside nn/conv)."""
    enc_dt = jnp.dtype(encode_dtype)

    @jax.jit
    def encode(frozen, audio, padding_mask):
        codec = frozen["codec"]
        if enc_dt != jnp.float32:
            codec = jax.tree_util.tree_map(
                lambda a: a.astype(enc_dt)
                if a.dtype == jnp.float32 else a, codec)
            audio = audio.astype(enc_dt)
        latents, _ = nac_mod.audio_encoder(
            {"embedding_head": frozen["embedding_head"]},
            codec, codec_cfg, audio, padding_mask)
        return jnp.mean(latents.astype(jnp.float32), axis=1)   # [B, T, H]

    return encode


def precompute(dataset: MLSDataset, frozen, codec_cfg: CodecConfig, *,
               cache_dir: str, batch_size: int = 8,
               buckets: Optional[Sequence[int]] = None,
               encode_dtype: str = "bfloat16",
               progress: bool = False) -> Dict:
    """Encode every utterance once (padded to its own bucket) and write
    per-bucket latent memmaps + an index. Returns the index dict.

    One XLA compile per distinct bucket length (shapes are static per
    bucket).  Re-running with an existing complete cache is a no-op."""
    os.makedirs(cache_dir, exist_ok=True)
    idx_path = os.path.join(cache_dir, _INDEX)
    if os.path.exists(idx_path):
        with open(idx_path) as f:
            index = json.load(f)
        if index.get("n_items") == len(dataset):
            return index

    buckets = list(buckets if buckets is not None
                   else default_buckets(dataset.sample_rate))
    encode = make_encode_fn(codec_cfg, encode_dtype)

    # pass 1: decode for lengths only (audio is NOT kept — a large corpus
    # would not fit in host RAM; pass 2 re-decodes per chunk, a one-time
    # cost that the per-epoch savings repay immediately)
    by_bucket: Dict[int, list] = {}
    seconds = [0.0] * len(dataset)
    for i in range(len(dataset)):
        n = len(dataset[i]["audio"])
        seconds[i] = n / dataset.sample_rate
        by_bucket.setdefault(bucket_for(n, buckets), []).append(i)

    rows = {}
    for blen, idxs in sorted(by_bucket.items()):
        mm = None
        for start in range(0, len(idxs), batch_size):
            chunk = idxs[start:start + batch_size]
            audio = np.zeros((len(chunk), 1, blen), np.float32)
            mask = np.zeros((len(chunk), blen), np.int32)
            for r, di in enumerate(chunk):
                wav = dataset[di]["audio"]
                audio[r, 0, :len(wav)] = wav
                mask[r, :len(wav)] = 1
            lat = np.asarray(encode(frozen, jnp.asarray(audio),
                                    jnp.asarray(mask)), np.float32)
            if mm is None:
                mm = np.lib.format.open_memmap(
                    os.path.join(cache_dir, f"bucket_{blen}.npy"), mode="w+",
                    dtype=np.float32,
                    shape=(len(idxs),) + lat.shape[1:])
            mm[start:start + len(chunk)] = lat
            for r, di in enumerate(chunk):
                rows[di] = (blen, start + r)
            if progress:
                print(f"# latents bucket {blen}: "
                      f"{min(start + batch_size, len(idxs))}/{len(idxs)}",
                      flush=True)
        mm.flush()

    index = {"n_items": len(dataset), "buckets": sorted(by_bucket),
             "rows": {str(k): list(v) for k, v in rows.items()},
             "seconds": seconds, "encode_dtype": encode_dtype}
    with open(idx_path, "w") as f:
        json.dump(index, f)
    return index


def latent_batches(cache_dir: str, dataset: MLSDataset, batch_size: int, *,
                   shuffle: bool = True, seed: int = 0,
                   drop_remainder: bool = True
                   ) -> Iterator[Dict[str, np.ndarray]]:
    """Yield train batches straight from the latent cache (no audio IO).

    Batches group utterances of ONE bucket (see module docstring), shuffled
    within buckets and across batch order.  Text ids/masks come from the
    dataset manifest; ``label`` (SLP duration class) from cached seconds."""
    with open(os.path.join(cache_dir, _INDEX)) as f:
        index = json.load(f)
    if index["n_items"] != len(dataset):
        raise ValueError(f"latent cache at {cache_dir} indexes "
                         f"{index['n_items']} items, dataset has "
                         f"{len(dataset)}; re-run precompute()")
    mms = {b: np.load(os.path.join(cache_dir, f"bucket_{b}.npy"),
                      mmap_mode="r") for b in index["buckets"]}
    rows = {int(k): tuple(v) for k, v in index["rows"].items()}
    seconds = index["seconds"]

    rng = np.random.default_rng(seed)
    by_bucket: Dict[int, list] = {}
    for di, (blen, _) in rows.items():
        by_bucket.setdefault(blen, []).append(di)

    batches = []
    for blen, idxs in sorted(by_bucket.items()):
        idxs = list(idxs)
        if shuffle:
            rng.shuffle(idxs)
        n = len(idxs) - (len(idxs) % batch_size if drop_remainder else 0)
        for s in range(0, n, batch_size):
            batches.append(idxs[s:s + batch_size])
    if shuffle:
        rng.shuffle(batches)

    for chunk in batches:
        blen = rows[chunk[0]][0]
        lat = np.stack([mms[blen][rows[di][1]] for di in chunk])
        yield {
            "indices": np.asarray(chunk, np.int32),
            "latents": lat,
            "text_ids": np.stack(
                [np.asarray(dataset.entries[di][1], np.int32)
                 for di in chunk]),
            "text_mask": np.stack(
                [np.asarray(dataset.entries[di][2], np.int32)
                 for di in chunk]),
            "label": np.asarray(
                [np.clip(int(seconds[di]) - 10, 0, 10) for di in chunk],
                np.int32),
        }
