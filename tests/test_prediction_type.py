"""v/x0 prediction parameterizations (DiTConfig.prediction_type)."""
import numpy as np
import jax
import jax.numpy as jnp

from ditto_tts_tpu.diffusion.sampler import (ddpm_sample, ddim_sample,
                                             respaced_timesteps, to_eps)
from ditto_tts_tpu.diffusion.schedule import NoiseSchedule


def test_to_eps_roundtrip():
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
    eps = jnp.asarray(rng.standard_normal((2, 5, 3)), jnp.float32)
    for ab in (0.001, 0.37, 0.999):
        ab = jnp.float32(ab)
        x = jnp.sqrt(ab) * x0 + jnp.sqrt(1 - ab) * eps
        v = jnp.sqrt(ab) * eps - jnp.sqrt(1 - ab) * x0
        for pt, pred in [("eps", eps), ("x0", x0), ("v", v)]:
            got = to_eps(pred, x, ab, pt)
            np.testing.assert_allclose(np.asarray(got), np.asarray(eps),
                                       rtol=2e-4, atol=2e-4,
                                       err_msg=f"{pt} ab={float(ab)}")


def test_samplers_agree_across_parameterizations():
    """An oracle model expressed in each parameterization yields the SAME
    sample trajectory (the conversions are exact, so the sampler can't
    tell which target the model was trained on)."""
    schedule = NoiseSchedule.cosine(16)
    taus = respaced_timesteps(16, 16)
    x_tgt = jnp.asarray(np.random.default_rng(1)
                        .standard_normal((2, 7, 4)), jnp.float32)

    def make_model(pt):
        def model(x, t):
            ab = schedule.alphas_cumprod[t].reshape(-1, 1, 1)
            eps = (x - jnp.sqrt(ab) * x_tgt) / jnp.sqrt(1 - ab)
            if pt == "eps":
                return eps
            if pt == "x0":
                return x_tgt + 0 * x
            return jnp.sqrt(ab) * eps - jnp.sqrt(1 - ab) * x_tgt
        return model

    x_init = jnp.asarray(np.random.default_rng(2)
                         .standard_normal((2, 7, 4)), jnp.float32)
    outs = {}
    for pt in ("eps", "x0", "v"):
        outs[pt] = ddpm_sample(make_model(pt), jax.random.key(0), x_init,
                               schedule, taus, prediction_type=pt)
        # oracle model => sample lands on the target
        np.testing.assert_allclose(np.asarray(outs[pt]), np.asarray(x_tgt),
                                   rtol=1e-3, atol=1e-3)
    np.testing.assert_allclose(np.asarray(outs["x0"]),
                               np.asarray(outs["eps"]), rtol=1e-4, atol=1e-4)
    dd = {pt: ddim_sample(make_model(pt), jax.random.key(0), x_init,
                          schedule, taus, prediction_type=pt)
          for pt in ("eps", "v")}
    np.testing.assert_allclose(np.asarray(dd["v"]), np.asarray(dd["eps"]),
                               rtol=1e-4, atol=1e-4)


def test_v_train_step_runs_and_ref_compat_guard():
    import pytest
    from ditto_tts_tpu.core.config import CodecConfig, DiTConfig
    from ditto_tts_tpu.text import gpt2 as gpt2_mod
    from ditto_tts_tpu.train import steps as steps_mod

    dit_cfg = DiTConfig(hidden_dim=16, num_layers=1, num_heads=2,
                        time_dim=8, text_dim=16, diffusion_steps=8,
                        max_token_length=32, prediction_type="v")
    codec_cfg = CodecConfig(num_filters=2, dimension=4, ratios=(4, 2),
                            codebook_size=16, num_quantizers=2,
                            lstm_layers=1)
    gpt2_cfg = gpt2_mod.GPT2Config(vocab_size=50, n_positions=32, n_embd=16,
                                   n_layer=1, n_head=2)
    with pytest.raises(ValueError):
        steps_mod.build_ditto_train_step(
            dit_cfg.replace(ref_compat=True), codec_cfg, gpt2_cfg)

    from ditto_tts_tpu.codec import encodec as codec_mod
    from ditto_tts_tpu.models import dit as dit_mod
    from ditto_tts_tpu.models import nac as nac_mod
    from ditto_tts_tpu.core.config import NACConfig

    init_state, step_fn, _ = steps_mod.build_ditto_train_step(
        dit_cfg, codec_cfg, gpt2_cfg, learning_rate=1e-3)
    keys = jax.random.split(jax.random.key(0), 4)
    nac_tr = nac_mod.init_nac_trainable(
        keys[0], NACConfig(hidden_size=16, codebook_size=16))
    frozen = {"codec": codec_mod.init_codec(keys[1], codec_cfg),
              "gpt2": gpt2_mod.init_gpt2(keys[2], gpt2_cfg),
              "embedding_head": nac_tr["embedding_head"]}
    state = init_state(dit_mod.init_ditto(keys[3], dit_cfg))
    batch = {"audio": jnp.zeros((2, 1, 64), jnp.float32) + 0.1,
             "padding_mask": jnp.ones((2, 64), jnp.int32),
             "text_ids": jnp.zeros((2, 8), jnp.int32)}
    state, m = jax.jit(step_fn)(state, frozen, batch, jax.random.key(1))
    assert np.isfinite(float(m["loss"]))
