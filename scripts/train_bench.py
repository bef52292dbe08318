"""Training-step benchmark on the real chip + host-feed margin.

Times ``build_ditto_train_step`` (the reference's training loop body,
ref: src/TrainDiTTO.py:55-95) at DiT-base geometry on the attached TPU:
step seconds, analytic train TFLOP/s, MFU vs chip peak — at S=750 (10 s
utterances) and S=1024 (>=13.7 s, the ref's 1024-frame truncation bucket,
ref TrainDiTTO.py:70-71).  Separately measures the native C++ loader's
sustained batches/s on this host over a synthetic WAV corpus and reports
the host-feed margin (loader audio-s/s vs the train step's consumption).

Writes TRAIN_BENCH_r05.json at the repo root.

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


def _setup(cfg, gpt2_cfg, batch_size, seconds, encode_dtype="float32",
           latent_input=False):
    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.train import steps as steps_mod
    from ditto_tts_tpu.text import gpt2 as gpt2_mod

    key = jax.random.key(0)
    frozen = {
        "codec": _numpy_params(codec_mod.init_codec, key, cfg.codec),
        "gpt2": _numpy_params(gpt2_mod.init_gpt2, key, gpt2_cfg),
        "embedding_head": _numpy_params(
            nac_mod.init_nac_trainable, key, cfg.nac)["embedding_head"],
    }
    init_state, step_fn, _ = steps_mod.build_ditto_train_step(
        cfg.dit, cfg.codec, gpt2_cfg, learning_rate=1e-4,
        encode_dtype=encode_dtype)
    state = init_state(_numpy_params(dit_mod.init_ditto, key, cfg.dit))
    dev = jax.devices()[0]
    state = jax.device_put(state, dev)
    frozen = jax.device_put(frozen, dev)

    length = int(24000 * seconds)
    rng = np.random.default_rng(1)
    if latent_input:
        # cached-latent training (data/latents.py): the frozen encode ran
        # once offline; the step consumes [B, T, H] latents directly
        t_lat = length // cfg.codec.hop_length
        batch = {
            "latents": jnp.asarray(rng.standard_normal(
                (batch_size, t_lat, cfg.dit.hidden_dim))
                .astype(np.float32)),
            "text_ids": jnp.asarray(rng.integers(
                0, gpt2_cfg.vocab_size,
                (batch_size, 1024)).astype(np.int32)),
        }
    else:
        batch = {
            "audio": jnp.asarray(0.05 * rng.standard_normal(
                (batch_size, 1, length)).astype(np.float32)),
            "padding_mask": jnp.ones((batch_size, length), jnp.int32),
            "text_ids": jnp.asarray(rng.integers(
                0, gpt2_cfg.vocab_size,
                (batch_size, 1024)).astype(np.int32)),
        }
    batch = jax.device_put(batch, dev)
    return state, frozen, batch, step_fn


def time_train_step(cfg, gpt2_cfg, batch_size, seconds, steps_timed,
                    encode_dtype="float32", latent_input=False):
    """One leg: build step, compile, time with scalar readback."""
    state, frozen, batch, step_fn = _setup(cfg, gpt2_cfg, batch_size,
                                           seconds, encode_dtype,
                                           latent_input)
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


def breakdown_train_step(cfg, gpt2_cfg, batch_size, seconds, steps_timed):
    """Per-stage attribution of the step: frozen encode / DiT fwd /
    fwd+bwd / optimizer, each as its own jit with a readback fence
    (VERDICT r4 task 2: where do the other ~3x of the 0.105-MFU step go?)
    """
    from ditto_tts_tpu.train import steps as steps_mod
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.diffusion.schedule import NoiseSchedule, q_sample

    state, frozen, batch, step_fn = _setup(cfg, gpt2_cfg, batch_size,
                                           seconds)
    init_state, _, _ = steps_mod.build_ditto_train_step(
        cfg.dit, cfg.codec, gpt2_cfg, learning_rate=1e-4)
    tx = steps_mod.make_adamw(1e-4)
    schedule = NoiseSchedule.cosine(cfg.dit.diffusion_steps)

    def encode(frozen, batch):
        from ditto_tts_tpu.models import nac as nac_mod
        from ditto_tts_tpu.text import gpt2 as gpt2_mod
        latents, _ = nac_mod.audio_encoder(
            {"embedding_head": frozen["embedding_head"]},
            frozen["codec"], cfg.codec, batch["audio"],
            batch.get("padding_mask"))
        latents = latents[:, :, :gpt2_cfg.n_positions]
        latents = jnp.mean(latents, axis=1)
        text_emb = gpt2_mod.embed_tokens(
            frozen["gpt2"], batch["text_ids"][:, :latents.shape[1]])
        return latents, text_emb

    def loss_of(dit_params, latents, text_emb, key):
        b = latents.shape[0]
        k_t, k_n, k_d = jax.random.split(key, 3)
        t = jax.random.randint(k_t, (b,), 0, cfg.dit.diffusion_steps)
        noise = jax.random.normal(k_n, latents.shape, latents.dtype)
        noisy = q_sample(schedule, latents, t, noise,
                         ref_compat=cfg.dit.ref_compat)
        pred = dit_mod.ditto_forward(dit_params, cfg.dit, noisy, text_emb,
                                     t, dropout_key=k_d)
        return jnp.mean(jnp.square(pred - noise))

    def timed(name, fn, *args, reps=steps_timed):
        t0 = time.time()
        out = fn(*args)
        leaf = jax.tree_util.tree_leaves(out)[0]
        float(jnp.sum(jnp.ravel(leaf)[-4:]).astype(jnp.float32))
        compile_s = time.time() - t0
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            out = fn(*args)
            leaf = jax.tree_util.tree_leaves(out)[0]
            float(jnp.sum(jnp.ravel(leaf)[-4:]).astype(jnp.float32))
            best = min(best, time.time() - t0)
        print(f"#   {name:22s} {best*1e3:8.1f} ms (compile {compile_s:.0f}s)",
              file=sys.stderr, flush=True)
        return best, out

    stages = {}
    enc_j = jax.jit(encode)
    stages["encode"], (latents, text_emb) = timed("encode", enc_j, frozen,
                                                  batch)
    fwd_j = jax.jit(loss_of)
    stages["dit_fwd"], _ = timed(
        "dit_fwd", fwd_j, state["params"], latents, text_emb,
        jax.random.key(3))
    vg_j = jax.jit(jax.value_and_grad(loss_of))
    stages["dit_fwd_bwd"], (_, grads) = timed(
        "dit_fwd_bwd", vg_j, state["params"], latents, text_emb,
        jax.random.key(3))

    import optax

    def opt(opt_state, params, grads):
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    opt_j = jax.jit(opt)
    stages["optimizer"], _ = timed("optimizer", opt_j, state["opt_state"],
                                   state["params"], grads)
    stages["bwd_minus_fwd"] = stages["dit_fwd_bwd"] - stages["dit_fwd"]
    return {k: round(v * 1e3, 1) for k, v in stages.items()}


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
    ap.add_argument("--out", default="TRAIN_BENCH_r05.json")
    ap.add_argument("--skip-loader", action="store_true")
    ap.add_argument("--skip-breakdown", action="store_true")
    ap.add_argument("--variants", default=None,
                    help="comma list: run only these variants")
    ap.add_argument("--leg-suffix", default="",
                    help="append to every leg key (e.g. '_b16' when "
                         "re-running a variant at a non-default batch "
                         "with --merge)")
    ap.add_argument("--merge", action="store_true",
                    help="update legs inside an existing --out file "
                         "instead of overwriting it")
    args = ap.parse_args()

    from ditto_tts_tpu.core.config import DiTConfig, PipelineConfig
    from ditto_tts_tpu.text import gpt2 as gpt2_mod

    def dit_cfg(**kw):
        base = dict(num_layers=12, num_heads=12, scan_blocks=True,
                    remat_blocks=True, compute_dtype="bfloat16")
        base.update(kw)
        return PipelineConfig(dit=DiTConfig(**base))

    # remat policy matrix (VERDICT r4 task 2): nothing_saveable recomputes
    # the whole block in backward; dots_with_no_batch_dims saves weight-
    # matmul outputs; no_remat stores all residuals ([B, H, S, S] scores
    # included — may OOM at B=8/S=1024)
    variants = {
        # production default: output-mode dropout + flat AdamW
        "remat_dots": (dit_cfg(
            remat_policy="dots_with_no_batch_dims_saveable"), "float32"),
        # torch-MHA probability dropout, for the attribution record
        "remat_dots_probs_dropout": (dit_cfg(
            remat_policy="dots_with_no_batch_dims_saveable",
            attn_dropout_mode="probs"), "float32"),
        "remat_dots_no_dropout": (dit_cfg(
            remat_policy="dots_with_no_batch_dims_saveable",
            cross_attn_dropout=0.0), "float32"),
        "no_remat": (dit_cfg(remat_blocks=False), "float32"),
        "remat_dots_bf16enc": (dit_cfg(
            remat_policy="dots_with_no_batch_dims_saveable"), "bfloat16"),
        "no_remat_bf16enc": (dit_cfg(remat_blocks=False), "bfloat16"),
    }
    # cached-latent training (data/latents.py precompute + --latent-cache):
    # the frozen encode is gone from the step entirely
    latent_variants = {
        "cached_latents": dit_cfg(
            remat_policy="dots_with_no_batch_dims_saveable"),
        "cached_latents_no_remat": dit_cfg(remat_blocks=False),
    }
    if args.variants:
        wanted = set(args.variants.split(","))
        variants = {k: v for k, v in variants.items() if k in wanted}
        latent_variants = {k: v for k, v in latent_variants.items()
                           if k in wanted}
    gpt2_cfg = gpt2_mod.GPT2Config()

    legs = {}
    best_name, best = None, None
    runs = [(name, cfg, enc_dt, False)
            for name, (cfg, enc_dt) in variants.items()]
    runs += [(name, cfg, "float32", True)
             for name, cfg in latent_variants.items()]
    for name, cfg, enc_dt, lat_in in runs:
        for seconds in (10, 14):    # S=750 and the 1024-truncation bucket
            b = args.batch
            while b >= 1:
                try:
                    leg = time_train_step(cfg, gpt2_cfg, b, seconds,
                                          args.steps_timed,
                                          encode_dtype=enc_dt,
                                          latent_input=lat_in)
                    legs[f"{name}_{seconds}s{args.leg_suffix}"] = leg
                    print(f"# {name} {seconds}s leg: {leg}",
                          file=sys.stderr, flush=True)
                    if seconds == 10 and not lat_in and (
                            best is None or leg["step_seconds"]
                            < best["step_seconds"]):
                        best_name, best = name, leg
                    break
                except Exception as e:
                    oom = ("RESOURCE_EXHAUSTED" in str(e)
                           or "Ran out of memory" in str(e))
                    if oom and b > 1:
                        print(f"# {name} B={b} OOM at {seconds}s; "
                              f"retrying B={b//2}", file=sys.stderr)
                        b //= 2
                    elif oom:
                        legs[f"{name}_{seconds}s{args.leg_suffix}"] = \
                            {"oom": True}
                        break
                    else:
                        raise

    out = {"device": str(jax.devices()[0]),
           "model": "DiT-base 12L/12H/768, bf16 compute, AdamW",
           "train_step_legs": legs}
    if best_name is not None:
        out["fastest_variant"] = best_name

    # breakdown always under the remat_dots config (no_remat OOMs the
    # fwd+bwd stage at B=8 — the whole point of remat)
    if not args.skip_breakdown and "remat_dots" in variants:
        print(f"# fastest variant: {best_name}; breakdown under remat_dots",
              file=sys.stderr, flush=True)
        try:
            bd = breakdown_train_step(variants["remat_dots"][0], gpt2_cfg,
                                      args.batch, 10, args.steps_timed)
        except Exception as e:  # noqa: BLE001 — record, don't lose the legs
            bd = {"error": str(e)[:400]}
        out["stage_breakdown_ms"] = bd

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
    if args.merge and os.path.exists(path):
        with open(path) as f:
            prev = json.load(f)
        prev["train_step_legs"].update(out.pop("train_step_legs"))
        out.pop("device", None), out.pop("model", None)
        prev.update(out)
        out = prev
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
