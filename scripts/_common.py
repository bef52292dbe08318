"""Shared CLI plumbing for the training/synthesis entry points.

All paths are injected via flags (the reference hardcoded cluster paths,
quirk #12); frozen pretrained weights load from local snapshot dirs via
--encodec/--gpt2/--byt5/--bigvgan, falling back to random init with a
loud warning (useful for smoke runs; useless for quality).
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

from ditto_tts_tpu.core.config import CodecConfig
from ditto_tts_tpu.utils.weights import load_state_dict


def add_common_args(p: argparse.ArgumentParser):
    p.add_argument("--train-path", required=True,
                   help="MLS split dir with transcripts.txt + audio_clean/")
    p.add_argument("--dev-path", default=None)
    p.add_argument("--checkpoint-dir", default="checkpoints")
    p.add_argument("--epochs", type=int, default=20)
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--learning-rate", type=float, default=None)
    p.add_argument("--nb-samples", type=int, default=10000)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--log-path", default=None)
    p.add_argument("--encodec", default=None,
                   help="local facebook/encodec_24khz snapshot (safetensors)")
    p.add_argument("--mesh-data", type=int, default=1,
                   help="data-parallel mesh axis size")
    p.add_argument("--mesh-model", type=int, default=1,
                   help="tensor-parallel mesh axis size")


def setup_mesh(args, state, frozen, model_name, param_specs=None):
    """Shared (data, model) mesh wiring for the train CLIs (north-star
    config 5; the reference has no counterpart, SURVEY §2.2).

    Returns (state, frozen, shard_state, wrap, mesh_ctx): ``wrap`` maps a
    batch iterator factory to one that DP-shards each batch; identity
    when no mesh is requested. ``param_specs`` picks the TP layout
    (default: DiT megatron rules; see parallel/train_setup.py).
    """
    import contextlib

    if args.mesh_data * args.mesh_model <= 1:
        return state, frozen, None, (lambda it: it), contextlib.nullcontext()

    from ditto_tts_tpu.core.config import MeshConfig
    from ditto_tts_tpu.parallel import mesh as mesh_mod
    from ditto_tts_tpu.parallel.train_setup import setup_mesh_training

    mesh_mod.initialize_multihost()
    mesh = mesh_mod.make_mesh(
        MeshConfig(data=args.mesh_data, model=args.mesh_model))
    state, frozen, shard_state, shard_batch = setup_mesh_training(
        mesh, state, frozen, param_specs)
    print(f"[{model_name}] mesh {dict(mesh.shape)}: DP batches, "
          f"sharded trainables; checkpoints gather on save")

    def wrap(it_factory):
        def it():
            for b in it_factory():
                yield shard_batch(b)
        return it

    return state, frozen, shard_state, wrap, jax.set_mesh(mesh)


def load_codec(args, key):
    from ditto_tts_tpu.codec import encodec as codec_mod
    cfg = CodecConfig()
    if args.encodec:
        return codec_mod.import_hf_state_dict(
            load_state_dict(args.encodec), cfg), cfg
    print("[warn] --encodec not given: random codec weights (smoke only)")
    return codec_mod.init_codec(key, cfg), cfg


def load_gpt2(path, key, cfg=None):
    from ditto_tts_tpu.text import gpt2 as gpt2_mod
    cfg = cfg or gpt2_mod.GPT2Config()
    if path:
        return gpt2_mod.import_hf_state_dict(load_state_dict(path), cfg), cfg
    print("[warn] --gpt2 not given: random GPT2 weights (smoke only)")
    return gpt2_mod.init_gpt2(key, cfg), cfg


def gpt2_tokenizer(args):
    """Real GPT2 BPE when --gpt2-vocab/--gpt2-merges are given; otherwise
    the vendored byte-level mini fixture (runs out of the box, ids are NOT
    the real gpt2 mapping)."""
    from ditto_tts_tpu.text.tokenizers import GPT2Tokenizer
    if getattr(args, "gpt2_vocab", None):
        return GPT2Tokenizer(args.gpt2_vocab, args.gpt2_merges)
    from ditto_tts_tpu import assets
    print("[warn] --gpt2-vocab not given: vendored byte-level mini vocab "
          "(valid BPE, not the real gpt2 id mapping)")
    return assets.gpt2_mini_tokenizer()


def load_byt5(path, key, cfg=None):
    from ditto_tts_tpu.text import byt5 as byt5_mod
    cfg = cfg or byt5_mod.byt5_small_config()
    if path:
        return byt5_mod.import_hf_state_dict(load_state_dict(path), cfg), cfg
    print("[warn] --byt5 not given: random ByT5 weights (smoke only)")
    return byt5_mod.init_byt5(key, cfg), cfg
