"""Weak-scaling benchmark: DiTTO train-step throughput vs mesh size.

Runs the full diffusion train step data-parallel on 1, 2, ..., N devices
with a fixed per-device batch and reports audio-seconds/s/chip and scaling
efficiency vs the 1-device run. On a real pod slice this measures ICI
gradient all-reduce overhead; for CI it runs on the virtual CPU mesh:

  DITTO_VIRTUAL_DEVICES=8 python scripts/scaling_bench.py \
      --devices 1 2 4 8 --tiny

(Shell-level JAX_PLATFORMS=cpu does NOT work in this image — the axon
sitecustomize forces the TPU backend; like tests/conftest.py the switch
must happen via jax.config before first backend use.)

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

if os.environ.get("DITTO_VIRTUAL_DEVICES"):
    _n = os.environ["DITTO_VIRTUAL_DEVICES"]
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count={_n}"
                               ).strip()
    jax.config.update("jax_platforms", "cpu")
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
    p.add_argument("--json-out", default=None,
                   help="write a SCALING artifact (measured virtual-mesh "
                        "rows + analytic ICI model for real hardware)")
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

    rows = []
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
        row = {
            "devices": n,
            "global_batch": batch_size,
            "step_seconds": round(best, 4),
            "audio_seconds_per_s_per_chip": round(tput_per_chip, 3),
            "weak_scaling_efficiency": round(tput_per_chip / base_tput, 4),
        }
        rows.append(row)
        print(json.dumps(row))

    if args.json_out:
        # Analytic model for REAL-hardware data-parallel weak scaling:
        # the only per-step collective is the gradient all-reduce over the
        # DiT trainable params (train/steps.py pmean of grads; frozen
        # codec/gpt2 never sync).  A ring all-reduce on one torus axis
        # moves 2*(n-1)/n * grad_bytes per chip over that axis's ICI
        # links; with the reference measured step time it bounds the
        # efficiency loss — and since XLA overlaps the gradient
        # all-reduce with the remaining backward pass, the unoverlapped
        # bound is pessimistic.
        full_dit = DiTConfig(num_layers=12, num_heads=12, scan_blocks=True,
                             compute_dtype="bfloat16")
        grad_leaves = jax.eval_shape(
            lambda k: dit_mod.init_ditto(k, full_dit),
            jax.random.key(0))
        grad_bytes = sum(int(np.prod(l.shape)) * 4
                         for l in jax.tree_util.tree_leaves(grad_leaves))
        # v5e: 4 ICI links/chip on a 2D torus; one ring axis sustains
        # ~4.5e10 B/s per direction (public "How to Scale Your Model"
        # v5e one-way link bandwidth); bidirectional ring halves the
        # per-direction traffic.
        ici_axis_bytes_per_s = 2 * 4.5e10
        step_s_real = 0.186        # TRAIN_BENCH_r05 (real chip, B=8, S=750)
        analytic = []
        for n in (2, 4, 8, 16, 64, 256):
            ar_bytes = 2.0 * (n - 1) / n * grad_bytes
            comms_s = ar_bytes / ici_axis_bytes_per_s
            eff_no_overlap = step_s_real / (step_s_real + comms_s)
            analytic.append({
                "devices": n,
                "allreduce_bytes_per_chip": int(ar_bytes),
                "comms_seconds": round(comms_s, 5),
                "efficiency_lower_bound": round(eff_no_overlap, 4),
            })
        artifact = {
            "measured": {
                "note": "virtual CPU mesh (xla_force_host_platform_"
                        "device_count) — validates the GSPMD-partitioned "
                        "program executes at every mesh size, NOT ICI "
                        "efficiency: the N virtual devices time-share the "
                        "same physical cores, so per-chip throughput "
                        "necessarily falls ~1/N and the efficiency "
                        "column reflects host oversubscription, not "
                        "communication",
                "config": "tiny" if args.tiny else "full",
                "rows": rows,
            },
            "analytic_real_hardware": {
                "model": "data-parallel ring all-reduce of DiT grads on "
                         "one v5e torus axis, unoverlapped (pessimistic: "
                         "XLA overlaps the all-reduce with backward)",
                "dit_grad_bytes_fp32": grad_bytes,
                "ici_axis_bytes_per_s": ici_axis_bytes_per_s,
                "step_seconds_real_chip": step_s_real,
                "rows": analytic,
                "conclusion": "grad all-reduce tops out at {:.1f} ms vs a "
                              "{:.0f} ms step => >={:.0%} weak-scaling "
                              "efficiency expected on real ICI even with "
                              "ZERO compute/comms overlap (XLA overlaps "
                              "the all-reduce with backward, so the real "
                              "figure approaches 100%); the virtual-mesh "
                              "rows above validate the sharded program "
                              "itself, not ICI".format(
                                  2.0 * grad_bytes / ici_axis_bytes_per_s
                                  * 1e3, step_s_real * 1e3,
                                  step_s_real / (step_s_real +
                                  2.0 * grad_bytes / ici_axis_bytes_per_s)),
            },
        }
        with open(args.json_out, "w") as f:
            json.dump(artifact, f, indent=1)
        print(f"# wrote {args.json_out}")


if __name__ == "__main__":
    main()
