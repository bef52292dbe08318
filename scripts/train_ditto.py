"""Train the DiTTO diffusion transformer (parity: ref src/TrainDiTTO.py).

Example:
  python scripts/train_ditto.py --train-path /data/mls/train \
      --encodec /weights/encodec_24khz --gpt2 /weights/gpt2 \
      --nac-checkpoint checkpoints/NAC_final.npz --epochs 20
"""

from __future__ import annotations

import argparse

from _common import (add_common_args, gpt2_tokenizer, load_codec, load_gpt2,
                     setup_mesh)

import jax

from ditto_tts_tpu.core.config import DiTConfig, ref_trained_dit_config
from ditto_tts_tpu.data.mls import MLSDataset, batches, default_buckets
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.core.config import NACConfig
from ditto_tts_tpu.text.tokenizers import GPT2Tokenizer
from ditto_tts_tpu.train import steps as steps_mod
from ditto_tts_tpu.train.checkpoint import load_checkpoint
from ditto_tts_tpu.train.trainer import Trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--gpt2", default=None)
    p.add_argument("--gpt2-vocab", default=None, help="vocab.json path")
    p.add_argument("--gpt2-merges", default=None, help="merges.txt path")
    p.add_argument("--nac-checkpoint", default=None,
                   help="trained NAC .npz (embedding head + VQ)")
    p.add_argument("--ref-config", action="store_true",
                   help="use the reference's trained config "
                        "(5 layers, 1 head, ref-compat quirks)")
    p.add_argument("--layers", type=int, default=12)
    p.add_argument("--heads", type=int, default=12)
    p.add_argument("--latent-cache", default=None, metavar="DIR",
                   help="precompute the frozen EnCodec latents once into "
                        "DIR and train from the cache (skips the ~25%% of "
                        "the step the frozen encode costs; see "
                        "data/latents.py)")
    args = p.parse_args()

    # scan+remat: one compiled block body, per-block recompute in backward
    # — the training memory/defaults the TPU step is designed for
    dit_cfg = ref_trained_dit_config() if args.ref_config else DiTConfig(
        num_layers=args.layers, num_heads=args.heads,
        scan_blocks=True, remat_blocks=True)

    key = jax.random.key(args.seed)
    keys = jax.random.split(key, 8)
    codec_params, codec_cfg = load_codec(args, keys[0])
    gpt2_params, gpt2_cfg = load_gpt2(args.gpt2, keys[1])

    nac_cfg = NACConfig()
    if args.nac_checkpoint:
        nac_trainable, _ = load_checkpoint(args.nac_checkpoint)
        nac_trainable = nac_trainable.get("params", nac_trainable)
    else:
        print("[warn] --nac-checkpoint not given: random embedding head")
        nac_trainable = nac_mod.init_nac_trainable(keys[2], nac_cfg)

    frozen = {"codec": codec_params, "gpt2": gpt2_params,
              "embedding_head": nac_trainable["embedding_head"]}

    tokenizer = gpt2_tokenizer(args)

    batch_size = args.batch_size or dit_cfg.batch_size
    buckets = default_buckets()

    def make_ds(path):
        return MLSDataset(path, tokenizer, dit_cfg.max_token_length,
                          nb_samples=args.nb_samples, tokenizer_name="gpt2",
                          shard_index=jax.process_index(),
                          num_shards=jax.process_count())

    train_ds = make_ds(args.train_path)
    val_ds = make_ds(args.dev_path) if args.dev_path else None

    # one-shot frozen-latent precompute (host-side frozen params, before
    # the mesh shards them); each process caches its own dataset shard
    lat_dirs = {}
    if args.latent_cache:
        import os as _os
        from ditto_tts_tpu.data import latents as lat_mod
        for name, ds in (("train", train_ds), ("val", val_ds)):
            if ds is None:
                continue
            d = _os.path.join(
                args.latent_cache,
                f"{name}_shard{jax.process_index()}of{jax.process_count()}")
            lat_mod.precompute(ds, frozen, codec_cfg, cache_dir=d,
                               batch_size=batch_size, buckets=buckets,
                               progress=True)
            lat_dirs[id(ds)] = d

    # flat single-vector AdamW except under TP, where mu/nu must mirror
    # the param tree's model-axis sharding (train_setup.state_specs)
    init_state, step_fn, eval_fn = steps_mod.build_ditto_train_step(
        dit_cfg, codec_cfg, gpt2_cfg, learning_rate=args.learning_rate,
        flat_opt=args.mesh_model <= 1)
    state = init_state(dit_mod.init_ditto(keys[3], dit_cfg))

    # (data, model) mesh: DP-sharded batches + TP-sharded (megatron) DiT
    state, frozen, shard_state, wrap, mesh_ctx = setup_mesh(
        args, state, frozen, "train_ditto")

    def batch_iter(ds, shuffle, seed=None):
        if id(ds) in lat_dirs:
            from ditto_tts_tpu.data import latents as lat_mod
            return wrap(lambda: lat_mod.latent_batches(
                lat_dirs[id(ds)], ds, batch_size, shuffle=shuffle,
                seed=seed if seed is not None else 0))
        return wrap(lambda: batches(ds, batch_size, buckets=buckets,
                                    shuffle=shuffle, seed=seed))

    trainer = Trainer(step_fn, eval_fn)
    with mesh_ctx:
        trainer.fit(
            state, frozen,
            train_batches=batch_iter(train_ds, True, args.seed),
            val_batches=batch_iter(val_ds, False) if val_ds else None,
            epochs=args.epochs, key=keys[4], model_name="DiTTO",
            learning_rate=args.learning_rate or dit_cfg.learning_rate,
            checkpoint_dir=args.checkpoint_dir, checkpoint_interval=1,
            log_path=args.log_path, shard_state=shard_state)


if __name__ == "__main__":
    main()
