"""Training-step benchmark on the real chip + host-feed margin.

Times ``build_ditto_train_step`` (the reference's training loop body,
ref: src/TrainDiTTO.py:55-95) at DiT-base geometry on the attached TPU:
step seconds, analytic train TFLOP/s, MFU vs chip peak — at S=750 (10 s
utterances) and S=1024 (>=13.7 s, the ref's 1024-frame truncation bucket,
ref TrainDiTTO.py:70-71).  Separately measures the native C++ loader's
sustained batches/s on this host over a synthetic WAV corpus and reports
the host-feed margin (loader audio-s/s vs the train step's consumption).

Writes TRAIN_BENCH_r04.json at the repo root.

  python scripts/train_bench.py [--batch 8] [--steps-timed 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

PEAK_TFLOPS = float(os.environ.get("BENCH_PEAK_TFLOPS", 197.0))


def _numpy_params(init_fn, key, cfg):
    from bench import _numpy_params as np_params
    return np_params(init_fn, key, cfg)


def time_train_step(cfg, gpt2_cfg, batch_size, seconds, steps_timed):
    """One leg: build step, compile, time with scalar readback."""
    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.text import gpt2 as gpt2_mod
    from ditto_tts_tpu.train import steps as steps_mod

    key = jax.random.key(0)
    frozen = {
        "codec": _numpy_params(codec_mod.init_codec, key, cfg.codec),
        "gpt2": _numpy_params(gpt2_mod.init_gpt2, key, gpt2_cfg),
        "embedding_head": _numpy_params(
            nac_mod.init_nac_trainable, key, cfg.nac)["embedding_head"],
    }
    init_state, step_fn, _ = steps_mod.build_ditto_train_step(
        cfg.dit, cfg.codec, gpt2_cfg, learning_rate=1e-4)
    state = init_state(_numpy_params(dit_mod.init_ditto, key, cfg.dit))
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    frozen = jax.device_put(frozen, dev)

    length = int(24000 * seconds)
    rng = np.random.default_rng(1)
    batch = {
        "audio": jnp.asarray(0.05 * rng.standard_normal(
            (batch_size, 1, length)).astype(np.float32)),
        "padding_mask": jnp.ones((batch_size, length), jnp.int32),
        "text_ids": jnp.asarray(rng.integers(
            0, gpt2_cfg.vocab_size, (batch_size, 1024)).astype(np.int32)),
    }
    batch = jax.device_put(batch, dev)

    step = jax.jit(step_fn, donate_argnums=(0,))
    t0 = time.time()
    state, m = step(state, frozen, batch, jax.random.key(1))
    float(m["loss"])  # completion fence (tunnel readback rule)
    compile_s = time.time() - t0

    times = []
    for i in range(steps_timed):
        t0 = time.time()
        state, m = step(state, frozen, batch, jax.random.key(2 + i))
        float(m["loss"])
        times.append(time.time() - t0)
    step_s = min(times)

    # latent frames the DiT actually sees (75 fps, truncated to 1024)
    s_lat = min(int(seconds * 75), 1024)
    from bench import _dit_fwd_flops
    # fwd + bwd ~= 3x fwd (standard accounting); frozen codec encode +
    # optimizer update excluded (small vs the DiT at these shapes)
    train_flops = 3 * _dit_fwd_flops(cfg.dit, batch_size, s_lat, s_lat)
    return {
        "batch": batch_size,
        "utt_seconds": seconds,
        "latent_frames": s_lat,
        "step_seconds": round(step_s, 4),
        "compile_s": round(compile_s, 1),
        "train_tflops": round(train_flops / 1e12, 2),
        "tflops_per_s": round(train_flops / step_s / 1e12, 1),
        "mfu": round(train_flops / step_s / (PEAK_TFLOPS * 1e12), 4),
        "audio_s_per_s": round(batch_size * seconds / step_s, 1),
    }


def loader_throughput(corpus, batch_size, n_batches=40):
    """Native C++ loader sustained throughput on this host (WAV corpus)."""
    import glob

    from ditto_tts_tpu.data.mls import default_buckets
    from ditto_tts_tpu.data.native_loader import NativeLoader, available

    if not available():
        return {"error": "native loader unavailable"}
    paths = sorted(glob.glob(os.path.join(corpus, "audio_clean", "**",
                                          "*.wav"), recursive=True))
    buckets = default_buckets(24000, 10.0, 20.0)
    loader = NativeLoader(paths, sample_rate=24000, batch_size=batch_size,
                          buckets=buckets, workers=8, seed=0)
    it = iter(loader)
    audio_s = 0.0
    n = 0
    next(it)  # warm the prefetch pipeline
    t0 = time.time()
    for b in it:
        audio_s += float(b["padding_mask"].sum()) / 24000.0
        n += 1
        if n >= n_batches:
            break
    dt = time.time() - t0
    loader.close()
    return {
        "files": len(paths),
        "batches_timed": n,
        "batches_per_s": round(n / dt, 2),
        "audio_s_per_s": round(audio_s / dt, 1),
    }


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps-timed", type=int, default=3)
    ap.add_argument("--corpus", default="/tmp/synth_wav_corpus")
    ap.add_argument("--out", default="TRAIN_BENCH_r04.json")
    ap.add_argument("--skip-loader", action="store_true")
    args = ap.parse_args()

    from ditto_tts_tpu.core.config import DiTConfig, PipelineConfig
    from ditto_tts_tpu.text import gpt2 as gpt2_mod

    # remat_blocks: recompute each scanned block in backward — without it
    # the step stores all 12 layers' [B, H, S, S] attention scores and
    # B=8/S=750 blows the 16 GB HBM (2x 2.5 GB fp32 + 2x 1.2 GB bf16)
    cfg = PipelineConfig(dit=DiTConfig(num_layers=12, num_heads=12,
                                       scan_blocks=True, remat_blocks=True,
                                       compute_dtype="bfloat16"))
    gpt2_cfg = gpt2_mod.GPT2Config()

    legs = {}
    for seconds in (10, 14):        # S=750 and the 1024-truncation bucket
        b = args.batch
        while b >= 1:
            try:
                legs[f"{seconds}s"] = time_train_step(
                    cfg, gpt2_cfg, b, seconds, args.steps_timed)
                print(f"# {seconds}s leg: {legs[f'{seconds}s']}",
                      file=sys.stderr)
                break
            except Exception as e:
                oom = ("RESOURCE_EXHAUSTED" in str(e)
                       or "Ran out of memory" in str(e))
                if oom and b > 1:
                    print(f"# B={b} OOM at {seconds}s; retrying B={b//2}",
                          file=sys.stderr)
                    b //= 2
                else:
                    raise

    out = {"device": str(jax.devices()[0]),
           "model": "DiT-base 12L/12H/768, bf16 compute, AdamW",
           "train_step_legs": legs}

    if not args.skip_loader:
        if not os.path.isdir(args.corpus):
            print(f"# generating WAV corpus at {args.corpus}",
                  file=sys.stderr)
            import subprocess
            subprocess.run(
                [sys.executable,
                 os.path.join(os.path.dirname(__file__),
                              "make_synth_corpus.py"),
                 "--out", args.corpus, "--n", "256", "--format", "wav"],
                check=True)
        lt = loader_throughput(args.corpus, args.batch)
        out["native_loader"] = lt
        if "audio_s_per_s" in lt and legs:
            need = max(l["audio_s_per_s"] for l in legs.values())
            out["host_feed_margin"] = {
                "train_consumes_audio_s_per_s": need,
                "loader_supplies_audio_s_per_s": lt["audio_s_per_s"],
                "margin_x": round(lt["audio_s_per_s"] / need, 1),
            }

    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(root, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
