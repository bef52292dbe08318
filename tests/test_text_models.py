"""GPT2 / ByT5 parity vs random-init HF models (no network)."""

import numpy as np
import pytest

import jax.numpy as jnp

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

from ditto_tts_tpu.text import byt5 as jbyt5
from ditto_tts_tpu.text import gpt2 as jgpt2

GCFG = jgpt2.GPT2Config(vocab_size=101, n_positions=64, n_embd=32,
                        n_layer=2, n_head=4)
BCFG = jbyt5.ByT5Config(vocab_size=80, d_model=48, d_kv=8, d_ff=96,
                        num_layers=2, num_heads=3)


@pytest.fixture(scope="module")
def hf_gpt2():
    from transformers import GPT2Config, GPT2LMHeadModel
    torch.manual_seed(0)
    cfg = GPT2Config(vocab_size=GCFG.vocab_size, n_positions=GCFG.n_positions,
                     n_embd=GCFG.n_embd, n_layer=GCFG.n_layer,
                     n_head=GCFG.n_head)
    return GPT2LMHeadModel(cfg).eval()


def test_gpt2_logits_and_loss_match(hf_gpt2):
    sd = {k: v.detach().numpy() for k, v in hf_gpt2.state_dict().items()}
    params = jgpt2.import_hf_state_dict(sd, GCFG)

    rng = np.random.default_rng(0)
    embeds = rng.standard_normal((2, 10, GCFG.n_embd)).astype(np.float32)
    mask = np.ones((2, 10), np.int64)
    mask[1, 7:] = 0
    labels = rng.integers(0, GCFG.vocab_size, (2, 10))

    with torch.no_grad():
        out = hf_gpt2(inputs_embeds=torch.from_numpy(embeds),
                      attention_mask=torch.from_numpy(mask),
                      labels=torch.from_numpy(labels))
    want_logits = out.logits.numpy()
    want_loss = float(out.loss)

    got_logits = jgpt2.gpt2_logits(params, GCFG, jnp.asarray(embeds),
                                   jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got_logits), want_logits,
                               rtol=2e-4, atol=2e-4)
    got_loss = float(jgpt2.lm_loss(got_logits, jnp.asarray(labels)))
    # HF ignores nothing here (labels have no -100) -> identical mean CE
    np.testing.assert_allclose(got_loss, want_loss, rtol=1e-4)


def test_gpt2_wte_embedding(hf_gpt2):
    sd = {k: v.detach().numpy() for k, v in hf_gpt2.state_dict().items()}
    params = jgpt2.import_hf_state_dict(sd, GCFG)
    ids = np.array([[1, 5, 9]])
    with torch.no_grad():
        want = hf_gpt2.transformer.wte(torch.from_numpy(ids)).numpy()
    got = jgpt2.embed_tokens(params, jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


@pytest.fixture(scope="module")
def hf_byt5():
    from transformers import T5Config, T5EncoderModel
    torch.manual_seed(1)
    cfg = T5Config(
        vocab_size=BCFG.vocab_size, d_model=BCFG.d_model, d_kv=BCFG.d_kv,
        d_ff=BCFG.d_ff, num_layers=BCFG.num_layers,
        num_heads=BCFG.num_heads, feed_forward_proj="gated-gelu",
        relative_attention_num_buckets=BCFG.relative_attention_num_buckets,
        relative_attention_max_distance=BCFG.relative_attention_max_distance,
        tie_word_embeddings=False)
    return T5EncoderModel(cfg).eval()


def test_byt5_encoder_matches(hf_byt5):
    sd = {k: v.detach().numpy() for k, v in hf_byt5.state_dict().items()}
    params = jbyt5.import_hf_state_dict(sd, BCFG)

    rng = np.random.default_rng(2)
    ids = rng.integers(3, BCFG.vocab_size, (2, 17))
    mask = np.ones((2, 17), np.int64)
    mask[0, 12:] = 0

    with torch.no_grad():
        want = hf_byt5(input_ids=torch.from_numpy(ids),
                       attention_mask=torch.from_numpy(mask)
                       ).last_hidden_state.numpy()
    got = jbyt5.byt5_encode(params, BCFG, jnp.asarray(ids),
                            jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_relative_position_buckets_match_hf():
    from transformers.models.t5.modeling_t5 import T5Attention
    rp = np.arange(-40, 41)[None, :]
    want = T5Attention._relative_position_bucket(
        torch.from_numpy(rp), bidirectional=True, num_buckets=32,
        max_distance=128).numpy()
    got = jbyt5._relative_position_bucket(rp, 32, 128)
    np.testing.assert_array_equal(got, want)
