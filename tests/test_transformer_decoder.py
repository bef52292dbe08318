"""Transformer decoder parity vs torch.nn.TransformerDecoder (eval mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

torch = pytest.importorskip("torch")

from ditto_tts_tpu.nn.transformer import TransformerDecoder


def _load_from_torch(dec):
    layers = []
    for lyr in dec.layers:
        def lin(m):
            return {"weight": jnp.asarray(m.weight.detach().numpy()),
                    "bias": jnp.asarray(m.bias.detach().numpy())}
        layers.append({
            "self_attn": {
                "in_proj_weight": jnp.asarray(
                    lyr.self_attn.in_proj_weight.detach().numpy()),
                "in_proj_bias": jnp.asarray(
                    lyr.self_attn.in_proj_bias.detach().numpy()),
                "out_proj": lin(lyr.self_attn.out_proj),
            },
            "cross_attn": {
                "in_proj_weight": jnp.asarray(
                    lyr.multihead_attn.in_proj_weight.detach().numpy()),
                "in_proj_bias": jnp.asarray(
                    lyr.multihead_attn.in_proj_bias.detach().numpy()),
                "out_proj": lin(lyr.multihead_attn.out_proj),
            },
            "linear1": lin(lyr.linear1),
            "linear2": lin(lyr.linear2),
            "norm1": lin(lyr.norm1),
            "norm2": lin(lyr.norm2),
            "norm3": lin(lyr.norm3),
        })
    return layers


def test_decoder_matches_torch():
    torch.manual_seed(0)
    d, heads, ff, layers = 24, 2, 48, 2
    tdec = torch.nn.TransformerDecoder(
        torch.nn.TransformerDecoderLayer(
            d_model=d, nhead=heads, dim_feedforward=ff, batch_first=True),
        num_layers=layers).eval()

    rng = np.random.default_rng(0)
    tgt = rng.standard_normal((2, 7, d)).astype(np.float32)
    mem = rng.standard_normal((2, 5, d)).astype(np.float32)
    causal = torch.triu(torch.ones(7, 7), diagonal=1).bool()
    with torch.no_grad():
        want = tdec(torch.from_numpy(tgt), torch.from_numpy(mem),
                    tgt_mask=causal).numpy()

    jdec = TransformerDecoder(d, heads, ff, layers)
    params = _load_from_torch(tdec)
    got = jdec.apply(params, jnp.asarray(tgt), jnp.asarray(mem),
                     causal_self=True)
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-4, atol=2e-4)


def test_decoder_init_apply():
    jdec = TransformerDecoder(16, 2, 32, 1)
    params = jdec.init(jax.random.key(0))
    out = jdec.apply(params, jnp.ones((1, 4, 16)), jnp.ones((1, 3, 16)))
    assert out.shape == (1, 4, 16)
    assert np.isfinite(np.asarray(out)).all()
