"""NAC and SLP forward integration tests on tiny random configs (CPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.core.config import CodecConfig, NACConfig, SLPConfig
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.models import slp as slp_mod
from ditto_tts_tpu.text import byt5 as byt5_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod

# tiny geometry: hop 8 (ratios 2,2,2,1? must multiply) -> use (2,2,2) hop 8
CODEC_CFG = CodecConfig(num_filters=4, dimension=8, ratios=(2, 2, 2),
                        codebook_size=16, num_quantizers=4, lstm_layers=1)
GPT2_CFG = gpt2_mod.GPT2Config(vocab_size=32, n_positions=64, n_embd=12,
                               n_layer=1, n_head=2)
NAC_CFG = NACConfig(hidden_size=12, codebook_size=16, max_token_length=64)
BYT5_CFG = byt5_mod.ByT5Config(vocab_size=40, d_model=16, d_kv=4, d_ff=32,
                               num_layers=1, num_heads=2)
SLP_CFG = SLPConfig(embedding_dim=16, num_layers=1, num_heads=1,
                    nb_classes=11)


@pytest.fixture(scope="module")
def codec_params():
    return codec_mod.init_codec(jax.random.key(0), CODEC_CFG)


def test_nac_forward_losses(codec_params):
    gpt2_params = gpt2_mod.init_gpt2(jax.random.key(1), GPT2_CFG)
    trainable = nac_mod.init_nac_trainable(jax.random.key(2), NAC_CFG)

    audio = jnp.asarray(0.1 * np.random.default_rng(0)
                        .standard_normal((2, 1, 256)), jnp.float32)
    text_ids = jnp.asarray(np.random.default_rng(1)
                           .integers(0, 32, (2, 64)))
    text_mask = jnp.ones((2, 64), jnp.int32)

    out = nac_mod.nac_forward(trainable, codec_params, gpt2_params, NAC_CFG,
                              CODEC_CFG, GPT2_CFG, text_ids, text_mask,
                              audio)
    assert np.isfinite(float(out["total_loss"]))
    assert float(out["reconstruction_loss"]) >= 0
    assert float(out["lm_loss"]) > 0
    assert "commitment_loss" in out
    assert out["reconstructed_audio"].shape == audio.shape
    # total = recon + lambda*lm + vq losses
    want = (float(out["reconstruction_loss"])
            + NAC_CFG.lambda_factor * float(out["lm_loss"])
            + float(out["codebook_loss"]) + float(out["commitment_loss"]))
    np.testing.assert_allclose(float(out["total_loss"]), want, rtol=1e-5)


def test_nac_ref_compat_no_vq_losses(codec_params):
    gpt2_params = gpt2_mod.init_gpt2(jax.random.key(1), GPT2_CFG)
    trainable = nac_mod.init_nac_trainable(jax.random.key(2), NAC_CFG)
    audio = jnp.zeros((1, 1, 128))
    ids = jnp.zeros((1, 64), jnp.int32)
    mask = jnp.ones((1, 64), jnp.int32)
    out = nac_mod.nac_forward(trainable, codec_params, gpt2_params, NAC_CFG,
                              CODEC_CFG, GPT2_CFG, ids, mask, audio,
                              ref_compat=True)
    assert "commitment_loss" not in out


def test_nac_trainable_gradients_flow(codec_params):
    """With straight-through VQ, grads reach the embedding head + codebook."""
    gpt2_params = gpt2_mod.init_gpt2(jax.random.key(1), GPT2_CFG)
    trainable = nac_mod.init_nac_trainable(jax.random.key(2), NAC_CFG)
    audio = jnp.asarray(0.1 * np.random.default_rng(2)
                        .standard_normal((1, 1, 128)), jnp.float32)
    ids = jnp.zeros((1, 64), jnp.int32)
    mask = jnp.ones((1, 64), jnp.int32)

    def loss_fn(tr):
        return nac_mod.nac_forward(tr, codec_params, gpt2_params, NAC_CFG,
                                   CODEC_CFG, GPT2_CFG, ids, mask,
                                   audio)["total_loss"]

    grads = jax.grad(loss_fn)(trainable)
    g_head = np.abs(np.asarray(
        grads["embedding_head"]["weight"])).sum()
    g_cb = np.abs(np.asarray(
        grads["vector_quantizer"]["codebook"])).sum()
    assert g_head > 0
    assert g_cb > 0


def test_slp_forward_and_predict(codec_params):
    byt5_params = byt5_mod.init_byt5(jax.random.key(3), BYT5_CFG)
    trainable = slp_mod.init_slp_trainable(jax.random.key(4), SLP_CFG,
                                           codebook_size=16)
    audio = jnp.asarray(0.1 * np.random.default_rng(3)
                        .standard_normal((2, 1, 256)), jnp.float32)
    ids = jnp.asarray(np.random.default_rng(4).integers(3, 40, (2, 12)))
    mask = jnp.ones((2, 12), jnp.int32)

    logits = slp_mod.slp_forward(trainable, byt5_params, codec_params,
                                 SLP_CFG, BYT5_CFG, CODEC_CFG, ids, mask,
                                 audio)
    assert logits.shape == (2, 11)
    frames = slp_mod.slp_predict_frames(logits, frame_rate=75)
    secs = np.asarray(frames) / 75
    assert np.all((secs >= 10) & (secs <= 20))
