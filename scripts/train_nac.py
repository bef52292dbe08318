"""Train the Neural Audio Codec (parity: ref src/TrainNAC.py).

Example:
  python scripts/train_nac.py --train-path /data/mls/train \
      --encodec /weights/encodec_24khz --gpt2 /weights/gpt2 \
      --gpt2-vocab /weights/gpt2/vocab.json --gpt2-merges /weights/gpt2/merges.txt
"""

from __future__ import annotations

import argparse

from _common import (add_common_args, gpt2_tokenizer, load_codec, load_gpt2,
                     setup_mesh)

import jax

from ditto_tts_tpu.core.config import NACConfig
from ditto_tts_tpu.data.mls import MLSDataset, batches, default_buckets
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.text.tokenizers import GPT2Tokenizer
from ditto_tts_tpu.train import steps as steps_mod
from ditto_tts_tpu.train.trainer import Trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--gpt2", default=None)
    p.add_argument("--gpt2-vocab", default=None)
    p.add_argument("--gpt2-merges", default=None)
    p.add_argument("--lambda-factor", type=float, default=0.1)
    p.add_argument("--ref-compat", action="store_true",
                   help="reference VQ semantics (argmin only, no STE)")
    args = p.parse_args()

    nac_cfg = NACConfig(lambda_factor=args.lambda_factor)
    keys = jax.random.split(jax.random.key(args.seed), 6)
    codec_params, codec_cfg = load_codec(args, keys[0])
    gpt2_params, gpt2_cfg = load_gpt2(args.gpt2, keys[1])
    frozen = {"codec": codec_params, "gpt2": gpt2_params}

    tokenizer = gpt2_tokenizer(args)
    batch_size = args.batch_size or nac_cfg.batch_size
    buckets = default_buckets()

    def make_ds(path):
        return MLSDataset(path, tokenizer, nac_cfg.max_token_length,
                          nb_samples=args.nb_samples, tokenizer_name="gpt2",
                          shard_index=jax.process_index(),
                          num_shards=jax.process_count())

    train_ds = make_ds(args.train_path)
    val_ds = make_ds(args.dev_path) if args.dev_path else None

    init_state, step_fn, eval_fn = steps_mod.build_nac_train_step(
        nac_cfg, codec_cfg, gpt2_cfg, ref_compat=args.ref_compat,
        learning_rate=args.learning_rate)
    state = init_state(nac_mod.init_nac_trainable(keys[2], nac_cfg))

    # pure-DP mesh: the NAC trainables (embedding head + VQ codebooks) are
    # small, so they replicate; batches DP-shard over "data"
    from ditto_tts_tpu.parallel.sharding import replicated_specs
    state, frozen, shard_state, wrap, mesh_ctx = setup_mesh(
        args, state, frozen, "train_nac",
        param_specs=replicated_specs(state["params"]))

    trainer = Trainer(step_fn, eval_fn)
    with mesh_ctx:
        trainer.fit(
            state, frozen,
            train_batches=wrap(lambda: batches(
                train_ds, batch_size, buckets=buckets, seed=args.seed)),
            val_batches=wrap(lambda: batches(
                val_ds, batch_size, buckets=buckets,
                shuffle=False)) if val_ds else None,
            epochs=args.epochs, key=keys[3], model_name="NAC",
            learning_rate=args.learning_rate or nac_cfg.learning_rate,
            checkpoint_dir=args.checkpoint_dir, checkpoint_interval=5,
            log_path=args.log_path, shard_state=shard_state)


if __name__ == "__main__":
    main()
