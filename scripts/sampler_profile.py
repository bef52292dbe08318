"""Itemize the DiT sampler's per-step cost on the chip (VERDICT r4 #4).

The 10 s-bucket sampler runs 50 denoise steps in ~0.42 s at 52.5% MFU;
the gap to matmul-ideal (~190 ms over the 50 steps) was previously
asserted as "LN ~37 ms, RoPE ~14 ms, rest attention internals + scan
misc" in prose only.  This script slope-times ONE ditto_forward
(B=4, S=750, bf16, prepared blocks — the exact shape inside the
sampler's scan) under component ablations (monkeypatched identities) and
writes SAMPLER_PROFILE_r05.json with the attribution and the analytic
matmul-ideal.

  python scripts/sampler_profile.py
"""

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
B, S = 4, 750


def slope(fn, args, reps=(2, 8)):
    res = {}
    for k in reps:
        @jax.jit
        def many(a, k=k):
            params, prepared, x, temb, t = a

            def body(i, x):
                o = fn(params, prepared, x, temb, t)
                return x + o.astype(x.dtype) * 1e-6
            out = jax.lax.fori_loop(0, k, body, x)
            return jnp.sum(out[:, -1].astype(jnp.float32))
        float(many(args))
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(many(args))
            ts.append(time.perf_counter() - t0)
        res[k] = min(ts)
    return (res[reps[1]] - res[reps[0]]) / (reps[1] - reps[0]) * 1e3


def main():
    from bench import _dit_fwd_flops, _numpy_params
    from ditto_tts_tpu.core.config import DiTConfig
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.nn import core as core_mod
    from ditto_tts_tpu.ops import attention as attn_mod

    cfg = DiTConfig(num_layers=12, num_heads=12, scan_blocks=True,
                    compute_dtype="bfloat16")
    params = jax.device_put(_numpy_params(dit_mod.init_ditto,
                                          jax.random.key(0), cfg))
    prepared = jax.jit(
        lambda p: dit_mod.prepare_blocks(p, cfg))(params)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, S, cfg.hidden_dim)),
                    jnp.bfloat16)
    temb = jnp.asarray(rng.standard_normal((B, S, cfg.text_dim)),
                       jnp.bfloat16)
    t = jnp.full((B,), 25, jnp.int32)

    ckv = jax.jit(lambda pr, te: dit_mod.prepare_cross_kv(pr, cfg, te))(
        prepared, temb)

    def fwd(p, prep, xx, te, tt):
        return dit_mod.ditto_forward(p, cfg, xx, te, tt,
                                     prepared_blocks=prep)

    def fwd_ckv(p, prep, xx, te, tt):
        return dit_mod.ditto_forward(p, cfg, xx, te, tt,
                                     prepared_blocks=prep, cross_kv=ckv)

    args = (params, prepared, x, temb, t)

    orig_ln = dit_mod.layer_norm
    orig_rope = dit_mod.apply_rope
    orig_attn = dit_mod.attention
    orig_adaln = dit_mod.global_adaln

    variants = {}
    print("device:", jax.devices()[0], flush=True)

    def run(name, f=None):
        ms = slope(f or fwd, args)
        variants[name] = round(ms, 3)
        print(f"{name:28s} {ms:8.3f} ms/step", flush=True)

    run("full")
    # production sampler path (r5): cross-attn K/V precomputed once per
    # sampler call instead of per step
    run("full_precomputed_cross_kv", fwd_ckv)

    dit_mod.layer_norm = lambda p, v, **kw: v
    run("no_layernorm")
    dit_mod.layer_norm = orig_ln

    dit_mod.apply_rope = lambda v, cos, sin: v
    run("no_rope")
    dit_mod.apply_rope = orig_rope

    dit_mod.attention = lambda q, k, v, **kw: v
    run("no_attention_math")          # removes score/context GEMMs+softmax
    dit_mod.attention = orig_attn

    # softmax-only ablation: attention as two plain GEMMs, no softmax
    def attn_nosoftmax(q, k, v, **kw):
        s = jnp.einsum("bhqd,bhkd->bhqk", q, k)
        return jnp.einsum("bhqk,bhkd->bhqd", s.astype(q.dtype), v)
    dit_mod.attention = attn_nosoftmax
    run("attention_gemms_no_softmax")
    dit_mod.attention = orig_attn

    dit_mod.global_adaln = lambda p, v, te, xe: v
    run("no_global_adaln")
    dit_mod.global_adaln = orig_adaln

    dit_mod.layer_norm = lambda p, v, **kw: v
    dit_mod.apply_rope = lambda v, cos, sin: v
    dit_mod.attention = attn_nosoftmax
    run("gemms_only")                 # all non-GEMM block math removed
    dit_mod.layer_norm = orig_ln
    dit_mod.apply_rope = orig_rope
    dit_mod.attention = orig_attn

    fwd_flops = _dit_fwd_flops(cfg, B, S, S)
    ideal_ms = fwd_flops / (PEAK_TFLOPS * 1e12) * 1e3
    full = variants["full"]
    report = {
        "geometry": f"B={B}, S={S}, 12L/12H/768 bf16, prepared blocks "
                    "(the sampler's per-step forward)",
        "method": "slope between K=2 and K=8 chained jitted calls "
                  "(tensor carry; fixed dispatch cancels); component "
                  "ablations by monkeypatched identity",
        "per_step_ms": variants,
        "attribution_ms": {
            "layernorms": round(full - variants["no_layernorm"], 3),
            "rope": round(full - variants["no_rope"], 3),
            "attention_total": round(
                full - variants["no_attention_math"], 3),
            "attention_softmax": round(
                full - variants["attention_gemms_no_softmax"], 3),
            "global_adaln": round(full - variants["no_global_adaln"], 3),
            "non_gemm_total": round(full - variants["gemms_only"], 3),
        },
        "matmul_ideal_ms": round(ideal_ms, 3),
        "fwd_tflops": round(fwd_flops / 1e12, 3),
        "achieved_tflops_per_s": round(fwd_flops / (full / 1e3) / 1e12, 1),
        "mfu": round(fwd_flops / (full / 1e3) / (PEAK_TFLOPS * 1e12), 4),
        "sampler_50step_ms": round(50 * full, 1),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "SAMPLER_PROFILE_r05.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
