"""Vocoder/pipeline profiling — one entry point with subcommands.

Consolidates the round-1/2 one-off scripts (profile_bigvgan{,2,3}.py,
profile_vocoder{,_stages}.py) into:

  python scripts/profiling.py bigvgan         # BigVGAN variant timings
  python scripts/profiling.py vocoder-stages  # conv/act/stage decomposition
  python scripts/profiling.py stage3          # VQ / codec decode / mel / BigVGAN

Timing methodology (hard-won on the tunneled TPU backend, see CLAUDE.md):

  * ``block_until_ready`` can return before execution finishes; every
    timing ends with a device->host scalar readback.
  * Fixed dispatch overhead (~25 ms via the tunnel) is cancelled with the
    slope method: time K=2 and K=6 chained calls inside one jit (tensor
    carry) and report the slope.
  * Params are always passed as jit ARGUMENTS: closing over them bakes
    ~50 MB of weights into the HLO as constants and the tunnel's
    remote-compile endpoint rejects the body with HTTP 413.
"""

import argparse
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

from ditto_tts_tpu.core.config import PipelineConfig, VocoderConfig

BATCH = int(os.environ.get("BENCH_BATCH", 4))
SECONDS = int(os.environ.get("BENCH_SECONDS", 10))
REPS = int(os.environ.get("REPS", 3))


def _params(init_fn, key, *a, **k):
    from bench import _numpy_params
    return _numpy_params(init_fn, key, *a, **k)


def timed_rb(name, fn, *args):
    """Compile, then best-of-REPS wall time with a forced scalar readback."""
    t0 = time.perf_counter()
    s = float(fn(*args))
    print(f"{name:42s} compile {time.perf_counter() - t0:6.1f} s", flush=True)
    best = float("inf")
    for _ in range(REPS):
        t0 = time.perf_counter()
        s = float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    print(f"{name:42s} {best * 1e3:9.1f} ms   (sum {s:.4f})", flush=True)
    return best


def slope_ms(fn, params, mel, reps=(2, 6)):
    """Per-call ms as the slope between K-chained jitted calls (cancels
    fixed dispatch cost; tensor carry keeps the chain on-device)."""
    res = {}
    for k in reps:
        @jax.jit
        def many(p, m, k=k):
            def body(i, m):
                o = fn(p, m)
                return m + jnp.mean(o).astype(m.dtype) * 1e-9
            out = jax.lax.fori_loop(0, k, body, m)
            return jnp.sum(out[..., -1])
        float(many(params, mel))  # compile + warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(params, mel))
            ts.append(time.perf_counter() - t0)
        res[k] = min(ts)
    return (res[reps[1]] - res[reps[0]]) / (reps[1] - reps[0]) * 1e3


# ---------------------------------------------------------------------------


def cmd_bigvgan(args):
    """BigVGAN-only variant timings (readback-forced)."""
    from ditto_tts_tpu.models import vocoder as voc_mod

    v = VocoderConfig()
    voc = jax.device_put(_params(voc_mod.init_bigvgan, jax.random.key(0), v))
    frames = 24_000 * SECONDS // v.hop_size
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((BATCH, v.num_mels, frames)),
                      jnp.float32)
    variants = [
        ("no anti-aliasing (plain snakebeta)",
         v.replace(use_anti_aliasing=False)),
        ("polyphase AA", v.replace(aa_impl="polyphase")),
        # composed is an NCL-only oracle path (nlc layout raises)
        ("composed AA (up/snake/down)", v.replace(aa_impl="composed",
                                                  layout="ncl")),
    ]
    for name, vc in variants:
        def fn(p, m, vc=vc):
            y = voc_mod.bigvgan_forward(p, vc, m)
            return jnp.sum(jnp.abs(y[..., :256]))
        timed_rb(name, jax.jit(fn), voc, mel)


def cmd_vocoder_stages(args):
    """Decompose vocoder cost: impl variants, activation ablation,
    prefix-of-stages (which upsample level dominates)."""
    from ditto_tts_tpu.models import vocoder as voc
    from ditto_tts_tpu.ops import snake as snake_mod

    cfg = VocoderConfig()
    params = jax.device_put(_params(voc.init_bigvgan, jax.random.key(0), cfg))
    frames = 24_000 * SECONDS // cfg.hop_size
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((BATCH, cfg.num_mels, frames)),
                      jnp.float32)

    print(f"{'polyphase (default)':28s} "
          f"{slope_ms(lambda p, m: voc.bigvgan_forward(p, cfg, m), params, mel):9.2f} ms/call")
    print(f"{'composed (ncl oracle)':28s} "
          f"{slope_ms(lambda p, m: voc.bigvgan_forward(p, cfg, m, aa_impl='composed', layout='ncl'), params, mel):9.2f} ms/call")
    noaa = cfg.replace(use_anti_aliasing=False)
    print(f"{'no anti-aliasing':28s} "
          f"{slope_ms(lambda p, m: voc.bigvgan_forward(p, noaa, m), params, mel):9.2f} ms/call")

    orig = snake_mod.snake_beta
    snake_mod.snake_beta = lambda x, a, b, logscale=True: x
    try:
        print(f"{'identity act (convs only)':28s} "
              f"{slope_ms(lambda p, m: voc.bigvgan_forward(p, noaa, m), params, mel):9.2f} ms/call")
    finally:
        snake_mod.snake_beta = orig

    for k in range(1, len(cfg.upsample_rates) + 1):
        sub = cfg.replace(
            upsample_rates=cfg.upsample_rates[:k],
            upsample_kernel_sizes=cfg.upsample_kernel_sizes[:k])
        subp = dict(params)
        subp["ups"] = params["ups"][:k]
        subp["resblocks"] = params["resblocks"][:k]
        ch = cfg.upsample_initial_channel // (2 ** k)
        subp["act_post"] = {"alpha": jnp.zeros((ch,)),
                            "beta": jnp.zeros((ch,))}
        subp["conv_post"] = {"weight": 0.01 * jnp.ones((1, ch, 7))}
        ms = slope_ms(lambda p, m, sub=sub: voc.bigvgan_forward(p, sub, m),
                      subp, mel)
        print(f"stages[0:{k}]                  {ms:9.2f} ms/call")


def cmd_layout(args):
    """NCL (torch-like) vs NLC (channels-last) BigVGAN carry layout."""
    from ditto_tts_tpu.models import vocoder as voc

    cfg = VocoderConfig()
    params = jax.device_put(_params(voc.init_bigvgan, jax.random.key(0), cfg))
    frames = 24_000 * SECONDS // cfg.hop_size
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((BATCH, cfg.num_mels, frames)),
                      jnp.float32)
    # single-call timing with dispatch subtraction: one compile per
    # variant (the K-chain slope method sextuples the compile bill and a
    # timeout kill mid-run wedges the tunneled chip)
    null = jax.jit(lambda x: jnp.sum(x[-4:]))
    zv = jnp.zeros((8,), jnp.float32)
    float(null(zv))
    disp = min(_min_time(lambda: float(null(zv))) for _ in range(5))
    print(f"dispatch {disp*1e3:.1f} ms", flush=True)
    variants = os.environ.get(
        "VARIANTS", "ncl,nlc-xla,nlc-gemm").split(",")
    for v in variants:
        layout = "ncl" if v == "ncl" else "nlc"
        impl = ("pallas" if v.endswith("pallas") else
                "gemm" if v.endswith("gemm") else "xla")
        c = cfg.replace(conv_impl=impl)
        if os.environ.get("AA_IMPL"):
            c = c.replace(aa_impl=os.environ["AA_IMPL"])
        fn = jax.jit(lambda p, m, c=c, layout=layout: jnp.sum(
            voc.bigvgan_forward(p, c, m, layout=layout)[..., -8:]))
        t0 = time.perf_counter()
        float(fn(params, mel))
        print(f"variant={v:10s} compile+first {time.perf_counter()-t0:6.1f} s",
              flush=True)
        best = min(_min_time(lambda: float(fn(params, mel)))
                   for _ in range(REPS))
        print(f"variant={v:10s} {(best-disp)*1e3:9.2f} ms/call", flush=True)


def _min_time(thunk):
    t0 = time.perf_counter()
    thunk()
    return time.perf_counter() - t0


def cmd_nlc_breakdown(args):
    """Where do the nlc-gemm vocoder's milliseconds sit? Single-call
    timings (dispatch-subtracted): act ablations + stage prefixes."""
    from ditto_tts_tpu.models import vocoder as voc

    cfg = VocoderConfig(layout="nlc", conv_impl="gemm")
    params = jax.device_put(_params(voc.init_bigvgan, jax.random.key(0), cfg))
    frames = 24_000 * SECONDS // cfg.hop_size
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((BATCH, cfg.num_mels, frames)),
                      jnp.float32)

    null = jax.jit(lambda x: jnp.sum(x[-4:]))
    zv = jnp.zeros((8,), jnp.float32)
    float(null(zv))
    disp = min(_min_time(lambda: float(null(zv))) for _ in range(5))

    def run(name, c, p=params, m=mel):
        fn = jax.jit(lambda p, m: jnp.sum(
            voc.bigvgan_forward(p, c, m)[..., -8:]))
        float(fn(p, m))
        best = min(_min_time(lambda: float(fn(p, m))) for _ in range(REPS))
        print(f"{name:24s} {(best - disp) * 1e3:9.2f} ms", flush=True)

    run("full (polyphase AA)", cfg)
    run("no anti-aliasing", cfg.replace(use_anti_aliasing=False))

    for k in range(1, len(cfg.upsample_rates) + 1):
        sub = cfg.replace(upsample_rates=cfg.upsample_rates[:k],
                          upsample_kernel_sizes=cfg.upsample_kernel_sizes[:k])
        subp = dict(params)
        subp["ups"] = params["ups"][:k]
        subp["resblocks"] = params["resblocks"][:k]
        ch = cfg.upsample_initial_channel // (2 ** k)
        subp["act_post"] = {"alpha": jnp.zeros((ch,)),
                            "beta": jnp.zeros((ch,))}
        subp["conv_post"] = {"weight": 0.01 * jnp.ones((1, ch, 7))}
        run(f"stages[0:{k}]", sub, jax.device_put(subp))


def cmd_prefix(args):
    """Stage-prefix breakdown of the PRODUCTION vocoder path (default
    VocoderConfig: conv_impl=pallas, aa_impl=fused_conv, hybrid layout).
    Telescoped [0:k] prefixes attribute per-stage milliseconds; compare
    against VOCODER_ROOFLINE per_stage_ms to find the slack."""
    from ditto_tts_tpu.models import vocoder as voc

    cfg = VocoderConfig()
    if os.environ.get("AA_IMPL"):
        cfg = cfg.replace(aa_impl=os.environ["AA_IMPL"])
    if os.environ.get("CONV_IMPL"):
        cfg = cfg.replace(conv_impl=os.environ["CONV_IMPL"])
    params = jax.device_put(_params(voc.init_bigvgan, jax.random.key(0), cfg))
    frames = 24_000 * SECONDS // cfg.hop_size
    mel = jnp.asarray(np.random.default_rng(0)
                      .standard_normal((BATCH, cfg.num_mels, frames)),
                      jnp.float32)

    null = jax.jit(lambda x: jnp.sum(x[-4:]))
    zv = jnp.zeros((8,), jnp.float32)
    float(null(zv))
    disp = min(_min_time(lambda: float(null(zv))) for _ in range(5))
    print(f"dispatch {disp*1e3:.1f} ms", flush=True)

    def run(name, c, p):
        fn = jax.jit(lambda p, m: jnp.sum(
            voc.bigvgan_forward(p, c, m)[..., -8:]))
        t0 = time.perf_counter()
        float(fn(p, mel))
        print(f"{name:24s} compile+first {time.perf_counter()-t0:6.1f} s",
              flush=True)
        best = min(_min_time(lambda: float(fn(p, mel))) for _ in range(REPS))
        ms = (best - disp) * 1e3
        print(f"{name:24s} {ms:9.2f} ms", flush=True)
        return ms

    prev = 0.0
    for k in range(1, len(cfg.upsample_rates) + 1):
        sub = cfg.replace(upsample_rates=cfg.upsample_rates[:k],
                          upsample_kernel_sizes=cfg.upsample_kernel_sizes[:k])
        subp = dict(params)
        subp["ups"] = params["ups"][:k]
        subp["resblocks"] = params["resblocks"][:k]
        ch = cfg.upsample_initial_channel // (2 ** k)
        subp["act_post"] = {"alpha": jnp.zeros((ch,)),
                            "beta": jnp.zeros((ch,))}
        subp["conv_post"] = {"weight": 0.01 * jnp.ones((1, ch, 7))}
        ms = run(f"stages[0:{k}]", sub, jax.device_put(subp))
        print(f"  -> stage s{k-1} delta    {ms - prev:9.2f} ms", flush=True)
        prev = ms
    full = run("full", cfg, params)
    print(f"  -> post (act+conv)      {full - prev:9.2f} ms", flush=True)


def cmd_stage3(args):
    """Stage-3 breakdown: VQ argmin, codec decode, mel, BigVGAN."""
    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.codec import rvq as rvq_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.models import vocoder as voc_mod
    from ditto_tts_tpu.ops.mel import get_mel_spectrogram

    cfg = PipelineConfig()
    key = jax.random.key(0)
    codec = jax.device_put(_params(codec_mod.init_codec, key, cfg.codec))
    nac_tr = _params(nac_mod.init_nac_trainable, key, cfg.nac)
    vq = jax.device_put(nac_tr["vector_quantizer"])
    voc = jax.device_put(_params(voc_mod.init_bigvgan, key, cfg.vocoder))

    L = 24_000 * SECONDS
    T = L // cfg.codec.hop_length
    rng = np.random.default_rng(0)
    latents = jnp.asarray(rng.standard_normal((BATCH, T, 768)), jnp.float32)
    wav = jnp.asarray(0.05 * rng.standard_normal((BATCH, L)), jnp.float32)
    v = cfg.vocoder

    def vq_fn(p, lat):
        stacked = jnp.repeat(lat[:, None], 2, axis=1)
        idx = rvq_mod.vq_indices(p, stacked)
        return jnp.sum(idx[..., -1])
    timed_rb("VQ argmin", jax.jit(vq_fn), vq, latents)

    stacked = jnp.repeat(latents[:, None], 2, axis=1)
    idx = jax.jit(lambda p, s: rvq_mod.vq_indices(p, s))(vq, stacked)

    def dec_fn(p, i):
        w = codec_mod.codec_decode(p, cfg.codec, i, output_length=L)
        return jnp.sum(jnp.abs(w[..., :256]))
    timed_rb("codec decode (SEANet+LSTM)", jax.jit(dec_fn), codec, idx)

    def mel_fn(w):
        m = get_mel_spectrogram(
            w, sample_rate=v.sampling_rate, n_fft=v.n_fft,
            num_mels=v.num_mels, hop=v.hop_size, win_size=v.win_size,
            fmin=v.fmin, fmax=v.fmax)
        return jnp.sum(m[..., -1])
    timed_rb("mel (GEMM DFT)", jax.jit(mel_fn), wav)
    mel = jax.jit(lambda w: get_mel_spectrogram(
        w, sample_rate=v.sampling_rate, n_fft=v.n_fft, num_mels=v.num_mels,
        hop=v.hop_size, win_size=v.win_size, fmin=v.fmin, fmax=v.fmax))(wav)

    def voc_fn(p, m):
        return jnp.sum(jnp.abs(voc_mod.bigvgan_forward(p, v, m)[..., :256]))
    timed_rb("BigVGAN (polyphase)", jax.jit(voc_fn), voc, mel)


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    sub = ap.add_subparsers(dest="cmd", required=True)
    sub.add_parser("bigvgan")
    sub.add_parser("vocoder-stages")
    sub.add_parser("stage3")
    sub.add_parser("layout")
    sub.add_parser("nlc-breakdown")
    sub.add_parser("prefix")
    args = ap.parse_args()
    print("device:", jax.devices()[0])
    {"bigvgan": cmd_bigvgan, "vocoder-stages": cmd_vocoder_stages,
     "stage3": cmd_stage3, "layout": cmd_layout,
     "nlc-breakdown": cmd_nlc_breakdown, "prefix": cmd_prefix}[args.cmd](args)


if __name__ == "__main__":
    main()
