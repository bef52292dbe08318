"""Speech2Text parity vs random-init HF model + fbank/decode tests."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ditto_tts_tpu.models import s2t as js2t

CFG = js2t.S2TConfig(vocab_size=61, d_model=16, encoder_layers=2,
                     decoder_layers=2, encoder_heads=2, decoder_heads=2,
                     encoder_ffn=32, decoder_ffn=32, conv_channels=24,
                     input_features=12)


@pytest.fixture(scope="module")
def hf_model():
    from transformers import (Speech2TextConfig,
                              Speech2TextForConditionalGeneration)
    torch.manual_seed(0)
    cfg = Speech2TextConfig(
        vocab_size=CFG.vocab_size, d_model=CFG.d_model,
        encoder_layers=CFG.encoder_layers, decoder_layers=CFG.decoder_layers,
        encoder_attention_heads=CFG.encoder_heads,
        decoder_attention_heads=CFG.decoder_heads,
        encoder_ffn_dim=CFG.encoder_ffn, decoder_ffn_dim=CFG.decoder_ffn,
        num_conv_layers=CFG.num_conv_layers, conv_channels=CFG.conv_channels,
        conv_kernel_sizes=[CFG.conv_kernel] * CFG.num_conv_layers,
        input_feat_per_channel=CFG.input_features,
        dropout=0.0, attention_dropout=0.0, activation_dropout=0.0)
    return Speech2TextForConditionalGeneration(cfg).eval()


@pytest.fixture(scope="module")
def params(hf_model):
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    return js2t.import_hf_state_dict(sd, CFG)


def test_encoder_matches_hf(hf_model, params):
    rng = np.random.default_rng(0)
    feats = rng.standard_normal((2, 40, CFG.input_features)) \
        .astype(np.float32)
    mask = np.ones((2, 40), np.int64)
    mask[1, 30:] = 0
    with torch.no_grad():
        want = hf_model.model.encoder(
            torch.from_numpy(feats),
            attention_mask=torch.from_numpy(mask)).last_hidden_state.numpy()
    got, got_mask = js2t.encode(params, CFG, jnp.asarray(feats),
                                jnp.asarray(mask))
    assert got.shape == want.shape
    # compare only frames valid after subsampling (padded frames differ by
    # the position-embedding convention but are masked downstream)
    valid = np.asarray(got_mask).astype(bool)
    np.testing.assert_allclose(np.asarray(got)[valid], want[valid],
                               rtol=5e-4, atol=5e-4)


def test_decoder_logits_match_hf(hf_model, params):
    rng = np.random.default_rng(1)
    feats = rng.standard_normal((1, 24, CFG.input_features)) \
        .astype(np.float32)
    mask = np.ones((1, 24), np.int64)
    dec_ids = np.array([[2, 9, 17, 33]])
    with torch.no_grad():
        out = hf_model(input_features=torch.from_numpy(feats),
                       attention_mask=torch.from_numpy(mask),
                       decoder_input_ids=torch.from_numpy(dec_ids))
    want = out.logits.numpy()
    enc_out, enc_mask = js2t.encode(params, CFG, jnp.asarray(feats),
                                    jnp.asarray(mask))
    got = js2t.decode_logits(params, CFG, jnp.asarray(dec_ids, jnp.int32),
                             enc_out, enc_mask)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-3, atol=1e-3)


def test_greedy_matches_hf_generate(hf_model, params):
    rng = np.random.default_rng(2)
    feats = rng.standard_normal((1, 32, CFG.input_features)) \
        .astype(np.float32)
    mask = np.ones((1, 32), np.int64)
    forced = 7
    with torch.no_grad():
        want = hf_model.generate(
            input_features=torch.from_numpy(feats),
            attention_mask=torch.from_numpy(mask),
            forced_bos_token_id=forced, max_length=10, num_beams=1,
            do_sample=False).numpy()
    got = np.asarray(js2t.greedy_decode(
        params, CFG, jnp.asarray(feats), jnp.asarray(mask),
        forced_bos_id=forced, max_len=10))
    n = min(want.shape[1], 10)
    np.testing.assert_array_equal(got[0, :n], want[0, :n])


def test_fbank_shapes_and_norm():
    sr = 16000
    rng = np.random.default_rng(0)
    t = np.arange(sr) / sr
    # non-stationary signal (chirp + noise) so per-channel variance is real
    wav = 0.3 * np.sin(2 * np.pi * (200 + 400 * t) * t) \
        + 0.05 * rng.standard_normal(sr)
    fb = js2t.log_mel_fbank(wav, sr)
    assert fb.shape[1] == 80
    assert abs(fb.shape[0] - 98) <= 2  # (16000-400)/160+1
    assert np.isfinite(fb).all()
    np.testing.assert_allclose(fb.mean(axis=0), 0.0, atol=1e-5)
    np.testing.assert_allclose(fb.std(axis=0), 1.0, atol=1e-2)


def test_init_runs():
    p = js2t.init_s2t(jax.random.key(0), CFG)
    feats = jnp.ones((1, 20, CFG.input_features))
    mask = jnp.ones((1, 20), jnp.int32)
    ids = js2t.greedy_decode(p, CFG, feats, mask, forced_bos_id=5,
                             max_len=6)
    assert ids.shape == (1, 6)


def test_tokenizer_decode_skips_decoder_start_eos():
    """Generated ids start with the decoder-start token (</s> for S2T);
    decode must not truncate to the empty string on it."""
    from ditto_tts_tpu.text.s2t_tokenizer import S2TTokenizer

    tok = S2TTokenizer.placeholder(100)
    seq = [2, 5, 20, 21, 2, 1, 1]      # <s=eos> <lang:fr> tok tok </s> pad
    out = tok.decode(seq)
    assert out != ""
    assert "tok20" in out and "tok21" in out
    # a transcript that legitimately ENDS at the first real eos
    assert tok.decode([2, 5, 20, 2, 30]) == tok.decode([2, 5, 20, 2])
