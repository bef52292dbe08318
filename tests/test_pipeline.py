"""End-to-end pipeline integration test on tiny configs (CPU, jitted)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ditto_tts_tpu.codec import encodec as codec_mod
from ditto_tts_tpu.core.config import (AudioConfig, CodecConfig, DiTConfig,
                                       NACConfig, PipelineConfig,
                                       SamplerConfig, SLPConfig,
                                       VocoderConfig)
from ditto_tts_tpu.infer.generator import (GeneratorParams, build_synthesize,
                                           build_synthesize_with_slp)
from ditto_tts_tpu.models import dit as dit_mod
from ditto_tts_tpu.models import nac as nac_mod
from ditto_tts_tpu.models import slp as slp_mod
from ditto_tts_tpu.models import vocoder as voc_mod
from ditto_tts_tpu.text import byt5 as byt5_mod
from ditto_tts_tpu.text import gpt2 as gpt2_mod

HID = 12
CODEC_CFG = CodecConfig(num_filters=4, dimension=8, ratios=(2, 2, 2),
                        codebook_size=16, num_quantizers=4, lstm_layers=1)
DIT_CFG = DiTConfig(hidden_dim=HID, num_layers=1, num_heads=2, time_dim=8,
                    text_dim=HID, diffusion_steps=10, max_token_length=64)
VOC_CFG = VocoderConfig(num_mels=8, upsample_rates=(2, 2, 2),
                        upsample_kernel_sizes=(4, 4, 4),
                        upsample_initial_channel=16,
                        resblock_kernel_sizes=(3,),
                        resblock_dilation_sizes=((1, 3),),
                        n_fft=16, hop_size=8, win_size=16)
GPT2_CFG = gpt2_mod.GPT2Config(vocab_size=32, n_positions=64, n_embd=HID,
                               n_layer=1, n_head=2)
CFG = PipelineConfig(
    audio=AudioConfig(),
    codec=CODEC_CFG,
    nac=NACConfig(hidden_size=HID, codebook_size=16),
    slp=SLPConfig(embedding_dim=16, num_layers=1, num_heads=1),
    dit=DIT_CFG,
    vocoder=VOC_CFG,
    sampler=SamplerConfig(num_steps=4),
)


@pytest.fixture(scope="module")
def params():
    keys = jax.random.split(jax.random.key(0), 8)
    nac_tr = nac_mod.init_nac_trainable(keys[3], CFG.nac)
    return GeneratorParams(
        dit=dit_mod.init_ditto(keys[0], DIT_CFG),
        codec=codec_mod.init_codec(keys[1], CODEC_CFG),
        gpt2=gpt2_mod.init_gpt2(keys[2], GPT2_CFG),
        embedding_head=nac_tr["embedding_head"],
        vector_quantizer=nac_tr["vector_quantizer"],
        vocoder=voc_mod.init_bigvgan(keys[4], VOC_CFG),
    )


def test_synthesize_end_to_end(params):
    fn = jax.jit(build_synthesize(CFG))
    audio = jnp.asarray(0.1 * np.random.default_rng(0)
                        .standard_normal((2, 1, 256)), jnp.float32)
    mask = jnp.ones((2, 256), jnp.int32)
    text = jnp.asarray(np.random.default_rng(1).integers(0, 32, (2, 20)))
    wav = fn(params, audio, mask, text, jax.random.key(7))
    # codec decode trunc to 256 -> mel frames (256-16+2*4)/8+1=31 -> x8 = 248
    assert wav.shape[0] == 2
    assert wav.ndim == 2
    assert np.isfinite(np.asarray(wav)).all()


def test_synthesize_deterministic_in_key(params):
    fn = jax.jit(build_synthesize(CFG))
    audio = jnp.zeros((1, 1, 128))
    mask = jnp.ones((1, 128), jnp.int32)
    text = jnp.zeros((1, 8), jnp.int32)
    a = fn(params, audio, mask, text, jax.random.key(1))
    b = fn(params, audio, mask, text, jax.random.key(1))
    c = fn(params, audio, mask, text, jax.random.key(2))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(np.asarray(a), np.asarray(c))


def test_synthesize_cond_by_audio_differs(params):
    audio = jnp.asarray(0.1 * np.random.default_rng(2)
                        .standard_normal((1, 1, 128)), jnp.float32)
    mask = jnp.ones((1, 128), jnp.int32)
    text = jnp.zeros((1, 8), jnp.int32)
    a = build_synthesize(CFG)(params, audio, mask, text, jax.random.key(3))
    b = build_synthesize(CFG, cond_by_audio=True)(
        params, audio, mask, text, jax.random.key(3))
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_synthesize_ddim(params):
    fn = jax.jit(build_synthesize(CFG, sampler_kind="ddim"))
    audio = jnp.zeros((1, 1, 128))
    mask = jnp.ones((1, 128), jnp.int32)
    text = jnp.zeros((1, 8), jnp.int32)
    wav = fn(params, audio, mask, text, jax.random.key(5))
    assert np.isfinite(np.asarray(wav)).all()


def test_synthesize_with_slp(params):
    byt5_cfg = byt5_mod.byt5_small_config()
    # tiny byt5 for the test: monkeypatch via small config
    small = byt5_mod.ByT5Config(vocab_size=40, d_model=16, d_kv=4, d_ff=32,
                                num_layers=1, num_heads=2)
    import ditto_tts_tpu.infer.generator as gen_mod
    orig = byt5_mod.byt5_small_config
    byt5_mod.byt5_small_config = lambda: small
    try:
        params.byt5 = byt5_mod.init_byt5(jax.random.key(9), small)
        params.slp = slp_mod.init_slp_trainable(jax.random.key(10), CFG.slp,
                                                codebook_size=16)
        fn = build_synthesize_with_slp(CFG, num_steps=2)
        audio = jnp.zeros((1, 1, 256))
        mask = jnp.ones((1, 256), jnp.int32)
        text = jnp.zeros((1, 8), jnp.int32)
        bids = jnp.zeros((1, 6), jnp.int32)
        bmask = jnp.ones((1, 6), jnp.int32)
        wav, frames = fn(params, audio, mask, text, bids, bmask,
                         jax.random.key(11))
        secs = int(np.asarray(frames)[0]) / CFG.audio.frame_rate
        assert 10 <= secs <= 20
        assert np.isfinite(np.asarray(wav)).all()
    finally:
        byt5_mod.byt5_small_config = orig


def test_synthesize_pipelined_matches_one_jit(params):
    """The two-dispatch serving split must produce the SAME waveform as
    the single-jit reference path (identical math, identical keys)."""
    from ditto_tts_tpu.infer.generator import build_synthesize_pipelined

    one = jax.jit(build_synthesize(CFG))
    two = build_synthesize_pipelined(CFG)
    audio = jnp.asarray(0.1 * np.random.default_rng(3)
                        .standard_normal((2, 1, 256)), jnp.float32)
    mask = jnp.ones((2, 256), jnp.int32)
    text = jnp.asarray(np.random.default_rng(4).integers(0, 32, (2, 20)))
    w1 = np.asarray(one(params, audio, mask, text, jax.random.key(5)))
    w2 = np.asarray(two(params, audio, mask, text, jax.random.key(5)))
    assert w1.shape == w2.shape
    np.testing.assert_allclose(w2, w1, rtol=1e-5, atol=1e-5)
