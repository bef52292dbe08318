"""Codec parity vs HF transformers EncodecModel (random-init, no network).

Instantiates ``EncodecModel(EncodecConfig())`` locally with random weights,
imports the state_dict into the JAX codec, and requires numerical parity on
encoder latents, RVQ codes, and decoded waveforms.
"""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ditto_tts_tpu.core.config import CodecConfig
from ditto_tts_tpu.codec import encodec as jcodec
from ditto_tts_tpu.codec import rvq as jrvq

CFG = CodecConfig()


@pytest.fixture(scope="module")
def hf_model():
    from transformers import EncodecConfig, EncodecModel
    torch.manual_seed(0)
    cfg = EncodecConfig()  # defaults == facebook/encodec_24khz geometry
    model = EncodecModel(cfg).eval()
    # random codebooks (buffers init to zeros otherwise)
    with torch.no_grad():
        for layer in model.quantizer.layers:
            layer.codebook.embed.normal_(0.0, 1.0)
    return model


@pytest.fixture(scope="module")
def jax_params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return jcodec.import_hf_state_dict(sd, CFG)


@pytest.fixture(scope="module")
def audio():
    rng = np.random.default_rng(0)
    return (0.1 * rng.standard_normal((2, 1, 12000))).astype(np.float32)


def test_encoder_latents_match(hf_model, jax_params, audio):
    with torch.no_grad():
        want = hf_model.encoder(torch.from_numpy(audio)).numpy()
    got = np.asarray(jcodec.codec_latents(jax_params, CFG,
                                          jnp.asarray(audio)))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_codes_match(hf_model, jax_params, audio):
    with torch.no_grad():
        enc = hf_model.encode(torch.from_numpy(audio), bandwidth=1.5,
                              return_dict=True)
    want = enc.audio_codes[0].numpy()            # [B, nq, T]
    got = np.asarray(jcodec.codec_encode(jax_params, CFG, jnp.asarray(audio),
                                         bandwidth_kbps=1.5))
    assert got.shape == want.shape
    agree = (got == want).mean()
    # argmin ties near codebook boundaries can flip a few entries
    assert agree > 0.99, f"code agreement {agree}"


def test_decode_matches(hf_model, jax_params, audio):
    with torch.no_grad():
        enc = hf_model.encode(torch.from_numpy(audio), bandwidth=1.5,
                              return_dict=True)
        want = hf_model.decode(enc.audio_codes, enc.audio_scales,
                               return_dict=True).audio_values.numpy()
    codes = jnp.asarray(enc.audio_codes[0].numpy())
    got = np.asarray(jcodec.codec_decode(jax_params, CFG, codes))
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-4)


def test_roundtrip_shapes():
    """Random-init JAX codec: shape contract L -> ceil(L/320) frames."""
    import jax
    params = jcodec.init_codec(jax.random.key(0), CFG)
    audio = jnp.zeros((1, 1, 24000))
    codes = jcodec.codec_encode(params, CFG, audio, bandwidth_kbps=1.5)
    assert codes.shape == (1, 2, 75)
    wav = jcodec.codec_decode(params, CFG, codes, output_length=24000)
    assert wav.shape == (1, 1, 24000)


def test_rvq_decode_sums_stages():
    cb = jnp.asarray(np.random.default_rng(1)
                     .standard_normal((2, 8, 4)).astype(np.float32))
    codes = jnp.asarray([[[0, 1, 2], [3, 4, 5]]], jnp.int32)  # [1, 2, 3]
    out = np.asarray(jrvq.rvq_decode(cb, codes))
    want = (np.asarray(cb)[0][[0, 1, 2]] + np.asarray(cb)[1][[3, 4, 5]]).T
    np.testing.assert_allclose(out[0], want, rtol=1e-6)
