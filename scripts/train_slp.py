"""Train the Speech Length Predictor (parity: ref src/TrainSLP.py).

Example:
  python scripts/train_slp.py --train-path /data/mls/train \
      --encodec /weights/encodec_24khz --byt5 /weights/byt5-small
"""

from __future__ import annotations

import argparse

from _common import add_common_args, load_byt5, load_codec, setup_mesh

import jax

from ditto_tts_tpu.core.config import SLPConfig
from ditto_tts_tpu.data.mls import MLSDataset, batches, default_buckets
from ditto_tts_tpu.models import slp as slp_mod
from ditto_tts_tpu.text.tokenizers import ByT5Tokenizer
from ditto_tts_tpu.train import steps as steps_mod
from ditto_tts_tpu.train.trainer import Trainer


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common_args(p)
    p.add_argument("--byt5", default=None)
    args = p.parse_args()

    slp_cfg = SLPConfig()
    keys = jax.random.split(jax.random.key(args.seed), 6)
    codec_params, codec_cfg = load_codec(args, keys[0])
    byt5_params, byt5_cfg = load_byt5(args.byt5, keys[1])
    frozen = {"codec": codec_params, "byt5": byt5_params}

    tokenizer = ByT5Tokenizer()
    batch_size = args.batch_size or slp_cfg.batch_size
    buckets = default_buckets()

    def make_ds(path):
        return MLSDataset(path, tokenizer, slp_cfg.max_token_length,
                          nb_samples=args.nb_samples, tokenizer_name="byt5",
                          shard_index=jax.process_index(),
                          num_shards=jax.process_count())

    train_ds = make_ds(args.train_path)
    val_ds = make_ds(args.dev_path) if args.dev_path else None

    init_state, step_fn, eval_fn = steps_mod.build_slp_train_step(
        slp_cfg, codec_cfg, byt5_cfg, learning_rate=args.learning_rate)
    state = init_state(slp_mod.init_slp_trainable(keys[2], slp_cfg))

    # (data, model) mesh: DP batches + megatron-TP decoder blocks
    from ditto_tts_tpu.parallel.sharding import slp_param_specs
    state, frozen, shard_state, wrap, mesh_ctx = setup_mesh(
        args, state, frozen, "train_slp",
        param_specs=slp_param_specs(state["params"]))

    trainer = Trainer(step_fn, eval_fn)
    with mesh_ctx:
        trainer.fit(
            state, frozen,
            train_batches=wrap(lambda: batches(
                train_ds, batch_size, buckets=buckets, seed=args.seed)),
            val_batches=wrap(lambda: batches(
                val_ds, batch_size, buckets=buckets,
                shuffle=False)) if val_ds else None,
            epochs=args.epochs, key=keys[3], model_name="SLP",
            learning_rate=args.learning_rate or slp_cfg.learning_rate,
            checkpoint_dir=args.checkpoint_dir, checkpoint_interval=5,
            log_path=args.log_path, shard_state=shard_state)


if __name__ == "__main__":
    main()
