"""Root-cause probe for the PARITY_r04 contradictory sub-leg.

`tamed_weights_full_length.prompt_conditioned_10s.downstream_from_reference_
latents` reported final_waveform_allclose=false with vq_index_agreement=1.0
on BOTH the main chain and the downstream chain — yet identical indices
through the same decode must bit-match the main chain (as unconditional_10s
does).  This script reruns exactly that leg and diffs every intermediate
elementwise:

  1. d_idx vs inter["indices"] (the two "1.0 agreement" index sets,
     against each other rather than against the capture);
  2. decode(d_idx) vs decode(inter["indices"]) through the SAME jit;
  3. the torch captures immediately after run_reference vs after
     export_generator_params (capture-aliasing probe: the hooks store
     `.detach().numpy()` VIEWS of torch storage).

Writes PARITY_DEBUG.json.  CPU-only; run from the repo root.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("USE_TF", "0")
os.environ.setdefault("USE_TORCH", "1")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

from ditto_tts_tpu.core.config import (DiTConfig, PipelineConfig,
                                       SamplerConfig, VocoderConfig)
from ditto_tts_tpu.eval import reference_harness as rh
from ditto_tts_tpu.infer.generator import build_synthesize_recorded
from ditto_tts_tpu.utils.torch_bridge import record_reference_noise


def main():
    T = 50
    pcfg = PipelineConfig(
        dit=DiTConfig(num_layers=5, num_heads=1, diffusion_steps=T,
                      ref_compat=True, compute_dtype="float32"),
        vocoder=VocoderConfig(compute_dtype="float32",
                              carry_dtype="float32",
                              aa_impl="polyphase"),
        sampler=SamplerConfig(num_steps=T))

    B, L = 1, int(24000 * 10.0)
    seed, run_seed = 1234, 7
    rng = np.random.default_rng(run_seed)
    audio = (0.1 * rng.standard_normal((B, 1, L))).astype(np.float32)
    mask = np.ones((B, L), np.int64)
    text_ids = rng.integers(0, 50257, (B, 24)).astype(np.int64)

    cache = {}
    cache_path = ".parity_cache/ditto_5L1H_T50_tr400_s99.pt"
    if os.path.exists(cache_path):
        import torch
        cache["state"] = torch.load(cache_path, weights_only=True)
        print("# reusing trained reference state", flush=True)
    ditto_train = dict(steps=400, batch=8, frames=150, seed=99)

    t0 = time.time()
    with rh.reference_session(pcfg, seed=seed, ditto_train=ditto_train,
                              ditto_state_cache=cache) as (gen, caps):
        print(f"# reference built in {time.time()-t0:.0f}s", flush=True)
        ref_wav = rh.run_reference(gen, audio, mask, text_ids,
                                   seed=run_seed, cond_by_audio=True)
        # snapshot the captures IMMEDIATELY (deep copies): if the stored
        # views diverge from these later, torch mutated the storage
        snap = {k: np.array(v, copy=True) for k, v in caps.items()}
        params = rh.export_generator_params(gen, pcfg)
        alias_drift = {
            k: float(np.abs(np.asarray(caps[k], np.float64)
                            - np.asarray(snap[k], np.float64)).max())
            for k in snap
        }
    if os.path.exists(cache_path) is False and "state" in cache:
        import torch
        os.makedirs(".parity_cache", exist_ok=True)
        torch.save(cache["state"], cache_path)

    print("# alias drift (capture view vs immediate copy):",
          alias_drift, flush=True)

    F = caps["q_in"].shape[1]
    noise = record_reference_noise((B, F, pcfg.dit.hidden_dim), T,
                                   run_seed, cond_by_audio=True)

    fn = jax.jit(build_synthesize_recorded(pcfg, cond_by_audio=True))
    wav, inter = fn(params, jnp.asarray(audio), jnp.asarray(mask),
                    jnp.asarray(text_ids),
                    jnp.asarray(noise["prompt_noise"]),
                    None if noise["init_noise"] is None
                    else jnp.asarray(noise["init_noise"]),
                    jnp.asarray(noise["step_noise"]))
    wav = np.asarray(jax.block_until_ready(wav))
    print("# main chain done", flush=True)

    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.codec import rvq as rvq_mod
    from ditto_tts_tpu.infer.generator import _mel
    from ditto_tts_tpu.models import vocoder as voc_mod

    @jax.jit
    def downstream(p, refined):
        stacked = jnp.repeat(refined[:, None], 2, axis=1)
        idx = rvq_mod.vq_indices(p.vector_quantizer, stacked,
                                 ref_exact=True)
        w = codec_mod.codec_decode(p.codec, pcfg.codec, idx,
                                   output_length=L)
        m = _mel(pcfg, w[:, 0])
        return idx, w, m, voc_mod.bigvgan_forward(
            p.vocoder, pcfg.vocoder, m)[:, 0]

    d_idx, d_wav, d_mel, d_out = downstream(
        params, jnp.asarray(snap["vq_in"][:, 0]))
    d_idx = np.asarray(d_idx)
    main_idx = np.asarray(inter["indices"])
    print("# downstream done", flush=True)

    # same decode jit fed with the MAIN chain's indices
    d2_idx, d2_wav, d2_mel, d2_out = downstream(
        params, jnp.asarray(np.asarray(inter["refined"])))

    def diff(a, b):
        a = np.asarray(a, np.float64)
        b = np.asarray(b, np.float64)
        if a.shape != b.shape:
            return {"shape_mismatch": [list(a.shape), list(b.shape)]}
        d = np.abs(a - b)
        return {"mae": float(d.mean()), "max": float(d.max()),
                "n_diff": int((d > 0).sum()), "size": int(d.size)}

    report = {
        "alias_drift_max_abs": alias_drift,
        "shapes": {
            "d_idx": list(d_idx.shape),
            "main_idx": list(main_idx.shape),
            "cap_vq_idx": list(np.asarray(snap["vq_idx"]).shape),
            "cap_vq_in": list(np.asarray(snap["vq_in"]).shape),
        },
        "idx_d_vs_cap": diff(d_idx, snap["vq_idx"]),
        "idx_main_vs_cap": diff(main_idx, snap["vq_idx"]),
        "idx_d_vs_main": diff(d_idx, main_idx),
        "vq_in_rows_equal": diff(snap["vq_in"][:, 0], snap["vq_in"][:, 1]),
        "refined_ours_vs_cap": diff(inter["refined"], snap["vq_in"][:, 0]),
        "codec_wav_d_vs_cap": diff(d_wav, snap["codec_wav"]),
        "codec_wav_mainjit_vs_cap": diff(inter["codec_wav"],
                                         snap["codec_wav"]),
        "codec_wav_d_vs_mainjit": diff(d_wav[:, 0] if d_wav.ndim == 3
                                       else d_wav,
                                       inter["codec_wav"]),
        "codec_wav_downjit_mainidx_vs_cap": diff(d2_wav, snap["codec_wav"]),
        "final_d_vs_cap": diff(d_out, snap["wav"][:, 0]),
        "final_downjit_mainidx_vs_cap": diff(d2_out, snap["wav"][:, 0]),
        "final_main_vs_cap": diff(wav, snap["wav"][:, 0]),
    }
    print(json.dumps(report, indent=1))
    with open("PARITY_DEBUG.json", "w") as f:
        json.dump(report, f, indent=1)
    print("wrote PARITY_DEBUG.json")


if __name__ == "__main__":
    main()
