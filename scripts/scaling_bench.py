"""Weak-scaling benchmark: DiTTO train-step throughput vs mesh size.

Runs the full diffusion train step data-parallel on 1, 2, ..., N devices
with a fixed per-device batch and reports audio-seconds/s/chip and scaling
efficiency vs the 1-device run. On a real pod slice this measures ICI
gradient all-reduce overhead; for CI it runs on the virtual CPU mesh:

  JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_bench.py --devices 1 2 4 8 --tiny

Prints one JSON line per mesh size.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from ditto_tts_tpu.core.config import (CodecConfig, DiTConfig, MeshConfig,
                                       NACConfig)
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.parallel import mesh as mesh_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod
from ditto_tts_tpu.train import steps as steps_mod


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    p.add_argument("--per-device-batch", type=int, default=2)
    p.add_argument("--seconds", type=float, default=None,
                   help="utterance seconds (default: tiny=0.1, full=10)")
    p.add_argument("--tiny", action="store_true",
                   help="tiny model/audio for CPU-mesh CI runs")
    p.add_argument("--iters", type=int, default=3)
    args = p.parse_args()

    if args.tiny:
        dit_cfg = DiTConfig(hidden_dim=64, num_layers=2, num_heads=4,
                            time_dim=16, text_dim=64, diffusion_steps=50,
                            scan_blocks=True)
        codec_cfg = CodecConfig(num_filters=4, dimension=8, ratios=(2, 2, 2),
                                codebook_size=16, num_quantizers=4,
                                lstm_layers=1)
        gpt2_cfg = gpt2_mod.GPT2Config(vocab_size=64, n_positions=128,
                                       n_embd=64, n_layer=1, n_head=4)
        nac_cfg = NACConfig(hidden_size=64, codebook_size=16)
        seconds = args.seconds or 0.1
        sr = 8000
    else:
        dit_cfg = DiTConfig(num_layers=12, num_heads=12, scan_blocks=True,
                            compute_dtype="bfloat16")
        codec_cfg = CodecConfig()
        gpt2_cfg = gpt2_mod.GPT2Config()
        nac_cfg = NACConfig()
        seconds = args.seconds or 10.0
        sr = 24000

    keys = jax.random.split(jax.random.key(0), 4)
    dit_params = dit_mod.init_ditto(keys[0], dit_cfg)
    frozen = {
        "codec": codec_mod.init_codec(keys[1], codec_cfg),
        "gpt2": gpt2_mod.init_gpt2(keys[2], gpt2_cfg),
        "embedding_head": nac_mod.init_nac_trainable(
            keys[3], nac_cfg)["embedding_head"],
    }
    init_state, step_fn, _ = steps_mod.build_ditto_train_step(
        dit_cfg, codec_cfg, gpt2_cfg)

    base_tput = None
    for n in args.devices:
        if n > jax.device_count():
            print(f"# skipping n={n}: only {jax.device_count()} devices",
                  file=sys.stderr)
            continue
        mesh = mesh_mod.make_mesh(MeshConfig(data=n, model=1),
                                  jax.devices()[:n])
        batch_size = args.per_device_batch * n
        length = int(sr * seconds)
        batch = {
            "audio": jnp.zeros((batch_size, 1, length), jnp.float32),
            "padding_mask": jnp.ones((batch_size, length), jnp.int32),
            "text_ids": jnp.zeros((batch_size, gpt2_cfg.n_positions),
                                  jnp.int32),
        }

        def put(tree, spec):
            return jax.tree_util.tree_map(
                lambda leaf: jax.device_put(
                    leaf, NamedSharding(mesh, spec)), tree)

        state = put(init_state(dit_params), P())
        fz = put(frozen, P())
        bt = put(batch, P("data"))

        with jax.set_mesh(mesh):
            step = jax.jit(step_fn)
            key = jax.random.key(1)
            jax.block_until_ready(step(state, fz, bt, key))
            best = float("inf")
            for _ in range(args.iters):
                t0 = time.perf_counter()
                jax.block_until_ready(step(state, fz, bt, key))
                best = min(best, time.perf_counter() - t0)

        tput_per_chip = batch_size * seconds / best / n
        if base_tput is None:
            base_tput = tput_per_chip
        print(json.dumps({
            "devices": n,
            "global_batch": batch_size,
            "step_seconds": round(best, 4),
            "audio_seconds_per_s_per_chip": round(tput_per_chip, 3),
            "weak_scaling_efficiency": round(tput_per_chip / base_tput, 4),
        }))


if __name__ == "__main__":
    main()
